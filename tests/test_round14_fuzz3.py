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


@pytest.mark.parametrize("seed", [3, 41, 43])
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


@pytest.mark.parametrize("seed", [7, 29, 31])
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


@pytest.mark.parametrize("seed", [17, 71, 73])
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


# ---------------------------------------------------------------------------
# Wave 3c: streaming batch-equivalent keys on boundary-aligned events
# ---------------------------------------------------------------------------

def _random_stream_events(rng, n: int = 500) -> pa.Table:
    """Random events shaped for the streaming keys' decision
    boundaries, none of which the uniform testdata ever hits: event
    timestamps exactly ON hour boundaries (tumbling/sliding window
    assignment is half-open [start, end)), per-user consecutive events
    exactly 10 minutes apart (the session-window gap), click->purchase
    pairs exactly 30 minutes apart (the interval join's inclusive
    upper bound), duplicate (user, ts) and (user, event_type, ts)
    rows (upsert / dedup-first tiebreaks on event_id), and sparse
    event_ids spanning 0..9999 so the late-data model replays as four
    micro-batches of 2500 with genuinely regressing timestamps."""
    base = np.datetime64("2024-02-01T00:00:00", "us")
    event_id = np.sort(rng.choice(10_000, n, replace=False)).astype(np.int64)
    sec = rng.integers(0, 21 * 86_400, n)
    user = rng.integers(1, 9, n).astype(np.int64)
    user[0] = 99                                  # dangling vs customer dim
    types = np.array(["view", "click", "purchase", "signup", "error"])
    etype = types[rng.integers(0, 5, n)].astype(object)
    # planted boundary shapes (indices paired i, i+1)
    for i in range(10, 30, 4):
        sec[i] = (sec[i] // 3600) * 3600          # exactly on the hour
    for i in range(30, 60, 6):                    # exact 10-min session gap
        user[i + 1] = user[i]
        sec[i + 1] = sec[i] + 600
    for i in range(60, 90, 6):                    # exact 30-min click->purchase
        user[i + 1] = user[i]
        etype[i], etype[i + 1] = "click", "purchase"
        sec[i + 1] = sec[i] + 1800
    for i in range(90, 110, 4):                   # duplicate (user, ts)
        user[i + 1] = user[i]
        sec[i + 1] = sec[i]
    for i in range(110, 126, 4):                  # dup (user, type, ts)
        user[i + 1] = user[i]
        etype[i + 1] = etype[i]
        sec[i + 1] = sec[i]
    ts = base + sec.astype("timedelta64[s]")
    value = np.round(rng.choice([0.0, -3.5, 1.25, 42.0, 99.99], n)
                     + rng.choice([0.0, 0.0, 0.01], n), 2)
    return pa.table({
        "event_id": pa.array(event_id),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(list(etype), pa.string()),
        "value": pa.array(value),
        "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 9, n)]),
    })


def _small_customer(rng, nc: int = 80) -> pa.Table:
    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY",
                     "HOUSEHOLD", "FURNITURE"])
    return pa.table({
        "c_custkey": pa.array(np.arange(1, nc + 1, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{k:09d}" for k in range(1, nc + 1)]),
        "c_nationkey": pa.array(rng.integers(0, 25, nc).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, nc), 2)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, nc)]),
    })


_STREAMING_WAVE3_KEYS = [
    "stream_tumbling_count", "stream_sliding_agg", "stream_session_window",
    "stream_dedup_first_per_key", "stream_dedup_watermark",
    "stream_late_data_watermark", "stream_stateful_totals",
    "stream_static_enrich_join", "stream_upsert_latest",
    "stream_agg_state_totals", "stream_stream_interval_join",
    "stream_file_ingest_exactly_once",
]


@pytest.mark.parametrize("seed", [19, 101])
def test_streaming_wave3_differential_fuzz(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _random_stream_events(rng))
    _write(tmp_path, "customer", _small_customer(rng))
    con = _duck(tmp_path, "events", "customer")
    _run(spark, tmp_path, con, _STREAMING_WAVE3_KEYS, seed)


@pytest.mark.parametrize("seed", [113])
def test_streaming_wave3_null_value_fuzz(spark, tmp_path, seed):
    """~8% NULL value over the aggregate streaming keys: windowed and
    stateful sums must SKIP null measures while counts still count the
    rows, identically in the batch plan, the oracle, and the real
    executed streaming state."""
    rng = np.random.default_rng(seed)
    tbl = _random_stream_events(rng)
    value = [None if rng.random() < 0.08 else v
             for v in tbl.column("value").to_pylist()]
    tbl = tbl.set_column(tbl.schema.get_field_index("value"), "value",
                         pa.array(value, pa.float64()))
    _write(tmp_path, "events", tbl)
    _write(tmp_path, "customer", _small_customer(rng))
    con = _duck(tmp_path, "events", "customer")
    keys = ["stream_tumbling_count", "stream_sliding_agg",
            "stream_late_data_watermark", "stream_stateful_totals",
            "stream_static_enrich_join", "stream_agg_state_totals",
            "stream_upsert_latest", "stream_file_ingest_exactly_once"]
    _run(spark, tmp_path, con, keys, seed)


# ---------------------------------------------------------------------------
# Wave 3e: the rows-only trio — invariant + determinism fuzz (no
# cross-engine oracle exists by design; the driver records rows-only)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [23])
def test_rows_only_trio_invariant_fuzz(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    _write(tmp_path, "documents", _random_documents(rng))
    _write(tmp_path, "lineitem", _tpch_wave3_tables(rng)["lineitem"])
    sf = str(tmp_path)

    # dedup_simhash: exact duplicates MUST surface at hamming 0 (a
    # candidate scheme that can miss distance-0 pairs is broken),
    # every emitted pair is ordered and within the ball, and the
    # result is deterministic across plans
    pairs = QUERIES["dedup_simhash"](spark, sf)
    rows = {(r.id_1, r.id_2): r.hamming for r in pairs.collect()}
    assert all(i < j for i, j in rows)
    assert all(0 <= h <= 3 for h in rows.values())
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf}/documents.parquet").collect()}
    planted_dups = [(i, i + 1) for i in range(31, 139, 13)
                    if docs[i] == docs[i + 1] and docs[i]]
    assert planted_dups, "generator must plant exact duplicates"
    for i, j in planted_dups:
        assert rows.get((i, j)) == 0, f"exact dup ({i},{j}) missed"
    rerun = {(r.id_1, r.id_2): r.hamming for r in pairs.collect()}
    assert rerun == rows

    # multimodal_resize: every non-null asset resizes to exactly the
    # 64-byte target with a deterministic digest; NULL assets keep the
    # zero-bytes contract (pinned in test_multimodal.py)
    rs = QUERIES["multimodal_resize"](spark, sf)
    out = rs.collect()
    assert len(out) == 140
    assert all(r.resized_length == 64 for r in out)
    assert {r.doc_id: r.resized_sha256 for r in rs.collect()} \
        == {r.doc_id: r.resized_sha256 for r in out}

    # agg_approx_count_distinct: HLL++ estimate per group within the
    # documented rsd envelope of the exact count, deterministic
    est = {r.l_returnflag: r.approx_parts
           for r in QUERIES["agg_approx_count_distinct"](spark, sf).collect()}
    import duckdb as _d
    exact = dict(_d.sql(
        f"SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM "
        f"read_parquet('{sf}/lineitem.parquet') GROUP BY 1").fetchall())
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) <= max(3, 0.15 * exact[k]), (k, e, exact[k])
    est2 = {r.l_returnflag: r.approx_parts
            for r in QUERIES["agg_approx_count_distinct"](spark, sf).collect()}
    assert est2 == est


@pytest.mark.parametrize("seed", [131])
def test_weighted_mix_out_of_dim_source_fuzz(spark, tmp_path, seed):
    """Sources ABSENT from the weights dim (src25, crawl-web) must be
    DROPPED — the engine's config-as-data inner join has no row for
    them, and the oracle's CASE must fall through to NULL rather than
    a 'src%' catch-all sweeping unknown src-prefixed sources into the
    long-tail rate (latent divergence found by inspection, round 14)."""
    rng = np.random.default_rng(seed)
    tbl = _random_documents(rng)
    src = tbl.column("source").to_pylist()
    for i in range(0, len(src), 7):
        src[i] = "src25" if i % 14 else "crawl-web"
    tbl = tbl.set_column(tbl.schema.get_field_index("source"), "source",
                         pa.array(src, pa.string()))
    _write(tmp_path, "documents", tbl)
    con = _duck(tmp_path, "documents")
    _run(spark, tmp_path, con, ["sample_weighted_mix"], seed)


# ---------------------------------------------------------------------------
# Wave 3f: degenerate-cardinality sweep — EVERY oracled key on empty
# tables and on 1-row tables (schemas sliced from the real testdata,
# so this is purely a cardinality probe, never a schema drift)
# ---------------------------------------------------------------------------

_ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings"]


def _sliced_testdata(tmp_path, n_rows: int) -> None:
    import pyarrow.parquet as _pq
    for t in _ALL_TABLES:
        tbl = _pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        _pq.write_table(tbl.slice(0, n_rows), f"{tmp_path}/{t}.parquet")


@pytest.mark.parametrize("n_rows", [0, 1])
def test_all_oracled_keys_degenerate_cardinality(spark, tmp_path, n_rows):
    """A 100 TB pipeline's unit of failure is the empty (or one-row)
    partition/day/source: every oracled key must agree with its oracle
    on 0-row and 1-row inputs — no ANSI division crash, no empty-agg
    shape mismatch, no quantile/window/sequence edge, no streaming
    batch that never fires."""
    _sliced_testdata(tmp_path, n_rows)
    con = _duck(tmp_path, *_ALL_TABLES)
    failures = []
    for name in ORACLES:
        try:
            ok, detail = compare(QUERIES[name](spark, str(tmp_path)),
                                 con.sql(ORACLES[name]))
        except Exception as exc:  # noqa: BLE001 - collected for the report
            ok, detail = False, f"EXCEPTION {type(exc).__name__}: {exc}"
        if not ok:
            failures.append(f"{name}: {detail[:160]}")
    assert not failures, (
        f"{len(failures)} keys diverge at n_rows={n_rows}:\n"
        + "\n".join(failures))
