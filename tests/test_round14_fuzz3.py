"""Round-14 differential-fuzzing extension (wave 3).

Waves 1-2 (test_round12_fixes.py, test_round12_fuzz2.py) swept 89 of
the 147 catalog keys and found seven real engine/oracle divergences.
This file sweeps the remaining 58: the documents long tail (pipelines,
reshape, vocab/tfidf/boilerplate, multimodal plumbing, minhash/CC
dedup chains), the embeddings family on degenerate vectors (all-zero,
duplicate, tiny-norm, antipodal), the lineitem/orders scan + cast +
DQ long tail, and the streaming batch-equivalent keys on
boundary-aligned timestamps. Same rules as the first campaigns: fixed
seeds so the gate is reproducible; every divergence is investigated
and fixed in whichever side mis-encodes the intended rule; touched
keys are re-verified hash-green on driver testdata in a vanilla
session. The three rows-only keys get determinism + invariant fuzz
(no oracle exists by design).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import compare
from tests.test_round12_fuzz2 import _random_events, _random_tpch_dims
from universal_data_connector_spark.plans.catalog import ORACLES, QUERIES


def _write(tmp_path, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{tmp_path}/{name}.parquet")


def _duck(tmp_path, *tables: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')")
    return con


def _run(spark, tmp_path, con, keys, seed) -> None:
    for name in keys:
        ok, detail = compare(QUERIES[name](spark, str(tmp_path)),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


# ---------------------------------------------------------------------------
# Wave 3a: documents long-tail keys
# ---------------------------------------------------------------------------

_BOILERPLATE = "all rights reserved worldwide by the publisher"


def _random_documents(rng, n: int = 140) -> pa.Table:
    """Random documents with every adversarial shape the documents
    long tail needs at once: sources span all three weighted-mix rate
    tiers (src0..src19); a planted boilerplate sentence appears in >= 8
    docs (boilerplate_ngrams' df >= 5 gate); 'window' and 'dup'
    trigger words hit filter_contains / filter_any_row_per_file;
    empty, single-word, exactly-256-byte, and multibyte documents
    stress tokenizers, frame offsets (256-byte frame boundary), and
    byte-vs-char length assumptions; exact duplicates and
    one-word-appended near-duplicates feed the minhash/CC chains; and
    long >= 13-token docs give the contamination 13-grams substance."""
    vocab = np.array([
        "the", "cat", "data", "spark", "window", "dup", "hello,", "world!",
        "a", "re-run", "x9", "3.14", "end.", "don't", "über", "naïve",
        "42", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
        "stream", "batch", "join", "merge", "shuffle", "token",
    ])
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 60))
        words = vocab[rng.integers(0, len(vocab), k)]
        t = " ".join(words)
        if rng.random() < 0.15:
            t = " " + t + "\t"
        texts.append(t)
    # planted shapes (overwrite specific slots; ids 0..n cover the
    # doc_id < 50 and < 100 output cuts in sliding_windows / tfidf)
    texts[2] = ""                                    # empty document
    texts[4] = "solo"                                # single word
    texts[6] = "x" * 256                             # exactly 1 frame (256 B)
    texts[8] = "y" * 512                             # exactly 2 frames
    texts[10] = "z" * 255                            # one byte short
    texts[12] = "é" * 128                            # 256 B in UTF-8, 128 chars
    for j in range(14, 30, 2):                       # boilerplate in 8 docs
        texts[j] = _BOILERPLATE + " " + texts[j]
    for i in range(31, n - 1, 13):                   # exact duplicates
        texts[i + 1] = texts[i]
    for i in range(37, n - 1, 17):                   # near-duplicates
        texts[i + 1] = texts[i] + " extra"
    langs = np.array(["en", "de", "fr", "es", "zh"])
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs[rng.integers(0, 5, n)]),
        "source": pa.array([f"src{k}" for k in rng.integers(0, 20, n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })


_DOCUMENTS_WAVE3_KEYS = [
    # filters / map / scalar over documents
    "filter_contains", "filter_any_row_per_file", "map_prefix_suffix",
    "base64_roundtrip",
    # corpus statistics
    "text_vocab_topk", "text_boilerplate_ngrams", "text_tfidf_topk",
    # sampling / reshape
    "sample_weighted_mix", "sample_capped_per_key",
    "reshape_pack_sequences", "reshape_chunk_tokens",
    "reshape_sliding_windows",
    # format round-trip
    "scan_jsonl_roundtrip",
    # dedup chains
    "dedup_near_minhash", "dedup_cluster_cc", "dedup_contamination_ngram",
    # multimodal plumbing (text bytes as opaque binary)
    "multimodal_binary_meta", "multimodal_frame_sample",
    "multimodal_decode_features",
    # full compositions
    "pipeline_clean_corpus", "pipeline_training_data",
]


@pytest.mark.parametrize("seed", [3, 41])
def test_documents_wave3_differential_fuzz(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    _write(tmp_path, "documents", _random_documents(rng))
    con = _duck(tmp_path, "documents")
    _run(spark, tmp_path, con, _DOCUMENTS_WAVE3_KEYS, seed)


@pytest.mark.parametrize("seed", [59])
def test_documents_wave3_null_injection_fuzz(spark, tmp_path, seed):
    """~8% NULL text over the same keys: NULL documents must flow
    through tokenize / shingle / binary-cast / JSONL round-trip as
    NULL (never crash, never coerce to empty) identically on both
    engines — frame sampling keeps its explode_outer NULL-frame row."""
    rng = np.random.default_rng(seed)
    tbl = _random_documents(rng)
    texts = tbl.column("text").to_pylist()
    texts = [None if rng.random() < 0.08 else t for t in texts]
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text",
                         pa.array(texts, pa.string()))
    n_chars = [len(t) if t is not None else 0 for t in texts]
    tbl = tbl.set_column(tbl.schema.get_field_index("n_chars"), "n_chars",
                         pa.array(n_chars, pa.int64()))
    _write(tmp_path, "documents", tbl)
    con = _duck(tmp_path, "documents")
    _run(spark, tmp_path, con, _DOCUMENTS_WAVE3_KEYS, seed)


# ---------------------------------------------------------------------------
# Wave 3d: embeddings keys on degenerate vectors
# ---------------------------------------------------------------------------

def _random_embeddings(rng, n: int = 60, dim: int = 64) -> pa.Table:
    """Random 64-dim float32 embeddings with every degenerate shape the
    similarity family must survive: an all-zero vector (zero norm —
    cosine undefined; band code all-zeros), exact duplicates both
    within and outside the query set (cosine exactly 1.0, exact rank
    ties broken by vec_id), a tiny-norm copy (1e-6 scale, same
    direction — cosine 1.0 with its parent, |plane dot| still 10+
    orders above float reordering noise), an antipodal copy (cosine
    exactly -1.0), and near-duplicates at cosine ~0.9999. vec_ids
    0..n cover the vec_id < 10 query cut; ids < 16 are the IVF
    centroid convention, so the duplicate/zero vectors also land IN
    the centroid set (duplicate centroids -> assignment tie broken by
    centroid_id)."""
    M = rng.normal(size=(n, dim)).astype(np.float32)
    M[3] = 0.0                       # zero vector (also centroid 3)
    M[7] = M[2]                      # duplicate inside query set + centroids
    M[20] = M[5]                     # duplicate of a query vector
    M[21] = M[5] * np.float32(1e-6)  # tiny norm, same direction
    M[22] = -M[5]                    # antipodal
    for j in (23, 24, 25):           # near-duplicates of vec 8
        M[j] = (M[8] + rng.normal(size=dim).astype(np.float32)
                * np.float32(0.005)).astype(np.float32)
    # guard the fuzz scope: no pairwise cosine may sit so close to a
    # decision threshold (0.95 near-dup, 0.30 lsh verify) that a
    # last-ulp engine difference could flip it; fixed seeds keep this
    # deterministic, and the assert documents the contract
    Md = M.astype(np.float64)
    nrm = np.linalg.norm(Md, axis=1)
    nz = nrm > 0
    U = Md[nz] / nrm[nz, None]
    cos = U @ U.T
    off = cos[~np.eye(len(U), dtype=bool)]
    for thr in (0.95, 0.30):
        gap = np.abs(off - thr).min()
        assert gap > 1e-9, f"cosine within {gap} of threshold {thr}"
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, row)) for row in M],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 5, n).astype(np.int32)),
    })


_EMBEDDINGS_WAVE3_KEYS = [
    "embedding_normalize", "dedup_embedding_cosine",
    "sim_search_cosine_topk", "sim_search_ivf", "sim_search_lsh",
]


@pytest.mark.parametrize("seed", [7, 29])
def test_embeddings_wave3_differential_fuzz(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    _write(tmp_path, "embeddings", _random_embeddings(rng))
    con = _duck(tmp_path, "embeddings")
    _run(spark, tmp_path, con, _EMBEDDINGS_WAVE3_KEYS, seed)


# ---------------------------------------------------------------------------
# Wave 3b: lineitem / orders scan + cast + DQ long tail
# ---------------------------------------------------------------------------

def _tpch_wave3_tables(rng):
    """Wave-2's random TPC-H tables plus the shapes the wave-3 keys
    need: out-of-range quantities (0.5 / 51.0) and a non-positive
    extendedprice so the DQ range/positivity rules actually fire, one
    price exactly on math_funcs' sign pivot (30000), a shipdate
    exactly on scan_parquet's 1997-01-01 boundary (strict < excludes
    it on both engines), and a 70-item degenerate basket so
    market_basket_pairs' per-basket cap (64) binds."""
    tables = _random_tpch_dims(rng)
    li = tables["lineitem"]
    qty = li.column("l_quantity").to_pylist()
    price = li.column("l_extendedprice").to_pylist()
    ship = li.column("l_shipdate").to_pylist()
    qty[5], qty[11] = 0.5, 51.0                   # dq range violations
    price[7] = -12.5                              # dq positivity violation
    price[9] = 30000.0                            # sign() == 0 pivot
    ship[13] = np.datetime64("1997-01-01T00:00:00", "us")
    li = li.set_column(li.schema.get_field_index("l_quantity"),
                       "l_quantity", pa.array(qty, pa.float64()))
    li = li.set_column(li.schema.get_field_index("l_extendedprice"),
                       "l_extendedprice", pa.array(price, pa.float64()))
    li = li.set_column(li.schema.get_field_index("l_shipdate"),
                       "l_shipdate", pa.array(ship, pa.timestamp("us")))
    # degenerate basket: one order holding 70 distinct parts (> cap 64)
    nb = 70
    basket = pa.table({
        "l_orderkey": pa.array(np.full(nb, 555, dtype=np.int64)),
        "l_partkey": pa.array(np.arange(1, nb + 1, dtype=np.int64)),
        "l_suppkey": pa.array(np.full(nb, 1, dtype=np.int64)),
        "l_linenumber": pa.array(((np.arange(nb) % 7) + 1).astype(np.int32)),
        "l_quantity": pa.array(np.full(nb, 5.0)),
        "l_extendedprice": pa.array(np.round(
            rng.uniform(900, 90000, nb), 2)),
        "l_discount": pa.array(np.full(nb, 0.05)),
        "l_tax": pa.array(np.full(nb, 0.0)),
        "l_returnflag": pa.array(["A"] * nb),
        "l_linestatus": pa.array(["F"] * nb),
        "l_shipdate": pa.array(
            np.full(nb, np.datetime64("1996-06-01T00:00:00", "us"))),
    })
    tables["lineitem"] = pa.concat_tables(
        [li, basket.select(li.column_names)])
    return tables


_TPCH_WAVE3_KEYS = [
    "scan_parquet", "scan_glob_filter", "scan_csv_typed",
    "scan_partition_pruned", "scan_schema_evolution_merge",
    "scan_csv_malformed_permissive",
    "filter_equality", "cast_lenient_int", "cast_currency_double",
    "defaults_on_null", "math_funcs",
    "join_bucketed_colocated", "maintenance_compact_files",
    "dq_expectations", "dq_column_profile",
    "reshape_unpivot", "market_basket_pairs",
]


@pytest.mark.parametrize("seed", [17, 71])
def test_tpch_wave3_differential_fuzz(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    tables = _tpch_wave3_tables(rng)
    for name, tbl in tables.items():
        _write(tmp_path, name, tbl)
    con = _duck(tmp_path, *tables)
    _run(spark, tmp_path, con, _TPCH_WAVE3_KEYS, seed)


@pytest.mark.parametrize("seed", [97])
def test_tpch_wave3_null_injection_fuzz(spark, tmp_path, seed):
    """~7% NULL l_quantity / l_extendedprice and ~4% NULL l_returnflag:
    the DQ rules must COUNT the nulls (positivity / domain), the
    profiles must count-and-skip them, the lenient casts must pass
    NULL through (not print 'null'), the CSV round-trips must
    empty-field them, and filters/aggregates must drop them
    identically on both engines."""
    rng = np.random.default_rng(seed)
    tables = _tpch_wave3_tables(rng)
    li = tables["lineitem"]
    qty = [None if rng.random() < 0.07 else v
           for v in li.column("l_quantity").to_pylist()]
    price = [None if rng.random() < 0.07 else v
             for v in li.column("l_extendedprice").to_pylist()]
    flag = [None if rng.random() < 0.04 else v
            for v in li.column("l_returnflag").to_pylist()]
    li = li.set_column(li.schema.get_field_index("l_quantity"),
                       "l_quantity", pa.array(qty, pa.float64()))
    li = li.set_column(li.schema.get_field_index("l_extendedprice"),
                       "l_extendedprice", pa.array(price, pa.float64()))
    li = li.set_column(li.schema.get_field_index("l_returnflag"),
                       "l_returnflag", pa.array(flag, pa.string()))
    tables["lineitem"] = li
    for name, tbl in tables.items():
        _write(tmp_path, name, tbl)
    con = _duck(tmp_path, *tables)
    keys = [
        "scan_parquet", "scan_csv_typed", "scan_csv_malformed_permissive",
        "filter_equality", "cast_lenient_int", "cast_currency_double",
        "defaults_on_null", "math_funcs", "dq_expectations",
        "dq_column_profile", "reshape_unpivot", "maintenance_compact_files",
    ]
    _run(spark, tmp_path, con, keys, seed)
