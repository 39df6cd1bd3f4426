"""Round-12 additions.

1. `events_window_funnel_conversion` semantics pinned on CRAFTED
   events (the sf0.001/sf0.01 oracle gates cover it statistically;
   this pins each rule on a case built to exercise it): strict-after
   step ordering, the inclusive 6-hour window cap anchored at the
   VIEW (not the click), purchase-after-click within the view's
   window, best-depth-over-anchors, and the no-view exclusion. The
   Spark result is additionally cross-checked against the DuckDB
   oracle SQL on the same crafted table, so the engine and oracle are
   proven to encode the same rules on adversarial inputs, not just on
   driver testdata.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from tests.oracle_harness import compare
from universal_data_connector_spark.plans.catalog import ORACLES, QUERIES

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
H = dt.timedelta(hours=1)
US = dt.timedelta(microseconds=1)


def _events(spark):
    rows = []
    eid = [0]

    def ev(user, typ, ts):
        eid[0] += 1
        rows.append((eid[0], ts, user, typ, 1.0, "{}"))

    # u1: clean conversion inside the window -> depth 3
    ev(1, "view", T0)
    ev(1, "click", T0 + 1 * H)
    ev(1, "purchase", T0 + 2 * H)
    # u2: first anchor's click misses the window; a second anchor
    # catches it (best-over-anchors) but no purchase -> depth 2
    ev(2, "view", T0)
    ev(2, "view", T0 + 6 * H)
    ev(2, "click", T0 + 7 * H)
    # u3: purchases but never a click -> purchase cannot count -> 1
    ev(3, "purchase", T0 - 1 * H)
    ev(3, "view", T0)
    ev(3, "purchase", T0 + 1 * H)
    # u4: purchase inside the window but BEFORE the first click ->
    # ordering rule rejects it -> depth 2
    ev(4, "view", T0)
    ev(4, "purchase", T0 + 30 * dt.timedelta(minutes=1))
    ev(4, "click", T0 + 1 * H)
    # u5: click at the exact view instant is NOT strictly after (the
    # later click is); purchase at EXACTLY view+6h is inside the
    # inclusive cap -> depth 3
    ev(5, "view", T0)
    ev(5, "click", T0)
    ev(5, "click", T0 + 1 * H)
    ev(5, "purchase", T0 + 6 * H)
    # u5b boundary sibling: purchase one microsecond past the cap ->
    # depth 2
    ev(6, "view", T0)
    ev(6, "click", T0 + 1 * H)
    ev(6, "purchase", T0 + 6 * H + US)
    # u7: no view at all -> excluded from the output entirely
    ev(7, "click", T0)
    ev(7, "purchase", T0 + 1 * H)
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")


def test_window_funnel_semantics_on_crafted_events(spark, tmp_path):
    df = _events(spark)
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    out = QUERIES["events_window_funnel_conversion"](spark, sf_dir)
    got = {r.funnel_depth: r.n_users for r in out.collect()}
    # u3 -> 1; u2, u4, u6 -> 2; u1, u5 -> 3; u7 absent
    assert got == {1: 1, 2: 3, 3: 2}

    # the oracle must encode the same rules on the same crafted rows
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet/*.parquet')")
    ok, detail = compare(out, con.sql(ORACLES["events_window_funnel_conversion"]))
    assert ok, detail


_EVENTS_ONLY_KEYS = [
    # every catalog key that reads ONLY the events table and whose
    # oracle has no testdata-dependent constants — eligible for
    # differential fuzzing on random tables
    "events_funnel_steps", "events_window_funnel_conversion",
    "events_sessionize_gap", "events_top_paths", "events_dau_wau",
    "events_attribution_first_last", "retention_cohorts",
    # time-series family (also events-only): interpolation at random
    # gaps, EWMA fold order, MAD thresholds on tied values, per-user
    # distinct accumulation, rollup gap-fill spines, pattern search
    "ts_resample_interp", "ts_ewma", "ts_anomaly_mad",
    "ts_cumulative_distinct", "ts_rollup_gapfill",
    "ts_subsequence_search", "window_gap_islands",
    # as-of / interval joins over events: random timestamps with
    # planted exact ties probe the tolerance and nearest tiebreaks
    "join_asof", "join_asof_tolerance", "join_asof_nearest",
    "join_interval_overlap",
]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_events_keys_differential_fuzz(spark, tmp_path, seed):
    """Differential fuzzing: a RANDOM events table (duplicate
    timestamps included, so tiebreak rules are exercised) is run
    through each events-only catalog key on Spark AND its DuckDB
    oracle. The fixed testdata can only witness the rules its
    distribution happens to hit; random tables probe the rule
    boundaries (session gaps landing exactly on the threshold, funnel
    steps out of order, ties inside ranking windows, single-event
    users). Seeds are fixed so the gate is reproducible."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n = 300
    # timestamps over ~3 weeks so retention_cohorts gets >1 cohort
    # week; second-resolution base + occasional EXACT duplicates
    base = np.datetime64("2024-02-01", "us")
    ts = base + rng.integers(0, 21 * 86_400, n).astype("timedelta64[s]")
    dup_idx = rng.integers(0, n, n // 10)
    ts[dup_idx] = ts[(dup_idx + 1) % n]     # planted exact-tie pairs
    types = np.array(["view", "click", "purchase", "signup", "error"])
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 8, n).astype(np.int64)),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 9, n)]),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')")
    for name in _EVENTS_ONLY_KEYS:
        ok, detail = compare(QUERIES[name](spark, sf_dir),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


@pytest.mark.parametrize("seed", [53])
def test_events_keys_null_injection_fuzz(spark, tmp_path, seed):
    """NULL-injection fuzzing: the driver testdata is fully non-null,
    but a production events feed is not. ~8% NULL event_type and ~8%
    NULL value (user_id/ts stay non-null: they are the partition and
    order keys whose NULL semantics the engine does not promise).
    Every events-only key must agree with its oracle under NULLs —
    conditional aggregates skipping NULL types, value sums/means
    ignoring NULL measures identically on both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n = 300
    base = np.datetime64("2024-02-01", "us")
    ts = base + rng.integers(0, 21 * 86_400, n).astype("timedelta64[s]")
    types = np.array(["view", "click", "purchase", "signup", "error"])
    type_vals = [None if rng.random() < 0.08 else str(types[i])
                 for i in rng.integers(0, 5, n)]
    value_vals = [None if rng.random() < 0.08
                  else float(np.round(rng.uniform(0, 100), 2))
                  for _ in range(n)]
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 8, n).astype(np.int64)),
        "event_type": pa.array(type_vals, pa.string()),
        "value": pa.array(value_vals, pa.float64()),
        "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 9, n)]),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')")
    for name in _EVENTS_ONLY_KEYS:
        ok, detail = compare(QUERIES[name](spark, sf_dir),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


_DOCUMENTS_ONLY_KEYS = [
    "text_token_count_bpe", "text_language_id", "text_quality_score",
    "text_fingerprint", "text_rolling_hash", "text_tokenize_stats",
    "text_repetition_ratio", "text_unigram_logprob",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_containment_ngram",
]


@pytest.mark.parametrize("seed", [5, 31])
def test_documents_keys_differential_fuzz(spark, tmp_path, seed):
    """Differential fuzzing for the documents-only keys: random text
    built to probe the shared Java-regex/RE2 dialect the engine and
    oracles are written in — mixed case, digits, punctuation runs,
    tab/newline/multi-space whitespace, leading/trailing whitespace,
    empty and single-word documents, exact duplicates and
    one-word-perturbed near-duplicates. Any tokenize / normalize /
    n-gram rule where the two dialects diverge on these inputs fails
    here before the driver could ever see it. (Scope: the text stays
    inside the documented shared-dialect whitespace set — space, tab,
    newline — since e.g. vertical tab is classified differently by
    Java \\s and RE2 \\s by design.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array([
        "the", "cat", "Data", "SPARK", "x9", "3.14", "hello,", "world!",
        "a", "re-run", "semi;colon", "(paren)", "end.", "don't", "über",
        "mail@host.io", "42", "--", "...",
    ])
    seps = np.array([" ", "  ", "\t", "\n", " \n "])
    n = 120
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 40))
        words = vocab[rng.integers(0, len(vocab), k)]
        sep = str(seps[rng.integers(0, len(seps))])
        t = sep.join(words)
        if rng.random() < 0.2:
            t = " " + t + "\t"          # leading/trailing whitespace
        texts.append(t)
    texts[7] = ""                        # empty document
    texts[11] = "solo"                   # single word
    for i in range(0, n - 1, 17):        # exact-duplicate tail
        texts[i + 1] = texts[i]
    for i in range(3, n - 1, 29):        # near-duplicate tail
        texts[i + 1] = texts[i] + " extra"
    langs = np.array(["en", "de", "fr", "es", "zh"])
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs[rng.integers(0, 5, n)]),
        "source": pa.array([f"src{k}" for k in rng.integers(0, 5, n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    for name in _DOCUMENTS_ONLY_KEYS:
        ok, detail = compare(QUERIES[name](spark, sf_dir),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


@pytest.mark.parametrize("seed", [61])
def test_documents_keys_null_injection_fuzz(spark, tmp_path, seed):
    """NULL-injection for the documents keys: ~10% NULL text (a real
    corpus always has some). NULL text must flow through tokenize /
    fingerprint / n-gram / quality expressions as NULL (never crash,
    never coerce to empty string) identically on both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    words = np.array(["alpha", "beta", "Gamma", "delta,", "x1", "42."])
    n = 100
    texts = []
    for i in range(n):
        if rng.random() < 0.10:
            texts.append(None)
        else:
            k = int(rng.integers(1, 30))
            texts.append(" ".join(words[rng.integers(0, len(words), k)]))
    langs = np.array(["en", "de", "fr", "es", "zh"])
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs[rng.integers(0, 5, n)]),
        "source": pa.array([f"src{k}" for k in rng.integers(0, 5, n)]),
        "n_chars": pa.array(
            np.array([len(t) if t is not None else 0 for t in texts],
                     dtype=np.int64)),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    for name in _DOCUMENTS_ONLY_KEYS:
        ok, detail = compare(QUERIES[name](spark, sf_dir),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


_LINEITEM_ONLY_KEYS = [
    "agg_hash_sum_avg", "agg_count_distinct", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_stats_moments", "agg_histogram_bins",
    "agg_weighted_avg", "agg_corr_exact", "limit_topk",
]


@pytest.mark.parametrize("seed", [13, 37])
def test_lineitem_keys_differential_fuzz(spark, tmp_path, seed):
    """Differential fuzzing for the lineitem-only aggregation keys,
    with the statistically nasty shapes the uniform testdata never
    produces: a GROUP WITH ONE ROW and a CONSTANT-VALUED group (both
    stress skew/kurtosis/correlation denominators), heavy exact ties
    in every measure, and duplicate whole rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n = 250
    flag_pairs = [("A", "F"), ("N", "F"), ("N", "O"),
                  ("R", "F"), ("R", "O")]
    fp = [flag_pairs[i] for i in rng.integers(0, 4, n)]  # hold out R/O
    fp[0] = ("R", "O")                                   # 1-row group
    qty = rng.choice([1.0, 2.0, 5.0, 50.0], n)           # heavy ties
    price = np.round(rng.choice([100.0, 250.5, 999.99], n)
                     * rng.integers(1, 4, n), 2)
    # constant-valued group: every A/F row gets identical measures
    # (zero variance => skewness/kurtosis/correlation denominators
    # are exactly 0)
    af = np.array([p == ("A", "F") for p in fp])
    qty[af], price[af] = 7.0, 700.0
    base = np.datetime64("1996-01-01", "us")
    ship = base + (rng.integers(0, 400, n) * 86_400).astype("timedelta64[s]")
    tbl = pa.table({
        "l_orderkey": pa.array(rng.integers(0, 30, n).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, 20, n).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, 10, n).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.round(rng.choice([0.0, 0.05, 0.1], n), 2)),
        "l_tax": pa.array(np.round(rng.choice([0.0, 0.04, 0.08], n), 2)),
        "l_returnflag": pa.array([p[0] for p in fp]),
        "l_linestatus": pa.array([p[1] for p in fp]),
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/lineitem.parquet")

    con = duckdb.connect()
    con.sql("CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet')")
    for name in _LINEITEM_ONLY_KEYS:
        ok, detail = compare(QUERIES[name](spark, sf_dir),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


@pytest.mark.parametrize("seed", [71])
def test_lineitem_keys_null_injection_fuzz(spark, tmp_path, seed):
    """NULL-injection for the lineitem aggregation keys: ~8% NULLs in
    the measure columns (quantity/price/discount) and ~5% NULL group
    keys (returnflag) — aggregates must skip NULL measures and group
    NULL keys identically on both engines. Ordering/date columns stay
    non-null (documented scope: they are scan/sort keys whose NULL
    semantics the engine does not promise)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n = 250
    flag_pairs = [("A", "F"), ("N", "F"), ("N", "O"), ("R", "F")]
    fp = [flag_pairs[i] for i in rng.integers(0, 4, n)]
    def null_some(vals, frac):
        return [None if rng.random() < frac else v for v in vals]
    qty = null_some([float(q) for q in rng.choice([1.0, 2.0, 50.0], n)], 0.08)
    price = null_some([float(p) for p in
                       np.round(rng.uniform(900, 10000, n), 2)], 0.08)
    disc = null_some([float(d) for d in rng.choice([0.0, 0.05, 0.1], n)], 0.08)
    flags = null_some([p[0] for p in fp], 0.05)
    base = np.datetime64("1996-01-01", "us")
    ship = base + (rng.integers(0, 400, n) * 86_400).astype("timedelta64[s]")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, 30, n).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, 20, n).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, 10, n).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array(np.round(rng.choice([0.0, 0.08], n), 2)),
        "l_returnflag": pa.array(flags, pa.string()),
        "l_linestatus": pa.array([p[1] for p in fp]),
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
    }), f"{tmp_path}/lineitem.parquet")

    con = duckdb.connect()
    con.sql("CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')")
    for name in _LINEITEM_ONLY_KEYS:
        ok, detail = compare(QUERIES[name](spark, str(tmp_path)),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


_ORDERS_ONLY_KEYS = [
    "window_row_number_topk", "window_running_sum", "sort_multi_key",
    "agg_mode_per_group", "ts_moving_window_avg",
]


@pytest.mark.parametrize("seed", [3, 29])
def test_orders_keys_differential_fuzz(spark, tmp_path, seed):
    """Differential fuzzing for the orders-only window/sort keys with
    EXACT ties on every ranking measure (totalprice drawn from a
    4-value set, duplicate orderdates): any ranking window or sort
    whose tiebreak is not total diverges here."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n = 200
    base = np.datetime64("1997-01-01", "us")
    dates = base + (rng.integers(0, 30, n) * 86_400).astype("timedelta64[s]")
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, 12, n).astype(np.int64)),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n)]),
        "o_totalprice": pa.array(
            rng.choice([1000.0, 2500.5, 2500.5, 90000.99], n)),
        "o_orderdate": pa.array(dates.astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                      "4-NOT SPECIFIED", "5-LOW"])[rng.integers(0, 5, n)]),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/orders.parquet")

    con = duckdb.connect()
    con.sql("CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf_dir}/orders.parquet')")
    for name in _ORDERS_ONLY_KEYS:
        ok, detail = compare(QUERIES[name](spark, sf_dir),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


@pytest.mark.parametrize("seed", [17])
def test_dim_window_keys_differential_fuzz(spark, tmp_path, seed):
    """part/customer ranking keys on random dims with EXACT ties in
    every ranking measure (retailprice/size/acctbal from tiny value
    sets): rank/dense_rank/ntile tiebreaks must be total on both
    engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    npart, ncust = 150, 160
    brands = np.array([f"Brand#{i}{j}" for i in range(1, 4)
                       for j in range(1, 4)])
    types = np.array(["STANDARD PLATED", "SMALL BURNISHED",
                      "LARGE ANODIZED"])
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(npart, dtype=np.int64)),
        "p_name": pa.array([f"part x {i}" for i in range(npart)]),
        "p_brand": pa.array(brands[rng.integers(0, len(brands), npart)]),
        "p_type": pa.array(types[rng.integers(0, 3, npart)]),
        "p_size": pa.array(rng.choice([1, 5, 50], npart).astype(np.int32)),
        "p_retailprice": pa.array(
            rng.choice([901.0, 1500.5, 1500.5, 2099.99], npart)),
    }), f"{tmp_path}/part.parquet")
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                     "HOUSEHOLD", "MACHINERY"])
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(ncust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(ncust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, ncust).astype(np.int32)),
        "c_acctbal": pa.array(
            rng.choice([-10.0, 0.0, 500.25, 500.25, 9999.99], ncust)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, ncust)]),
    }), f"{tmp_path}/customer.parquet")

    con = duckdb.connect()
    for t in ("part", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')")
    for name in ("window_rank_family", "window_ntile_quartiles"):
        ok, detail = compare(QUERIES[name](spark, str(tmp_path)),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


_JOIN_FUZZ_KEYS = ["join_inner_hash", "join_left", "join_semi",
                   "join_anti", "join_full_outer", "join_broadcast",
                   "join_salted_skew", "join_range_theta",
                   "join_null_safe_eq", "join_star_schema"]


@pytest.mark.parametrize("seed", [7, 41])
def test_join_keys_differential_fuzz(spark, tmp_path, seed):
    """Join keys on random tables with DANGLING keys in BOTH
    directions — customers with no orders, orders pointing at
    nonexistent customers, lineitems at missing parts, plus duplicate
    join keys for fanout — shapes the FK-clean testdata can never
    produce. left/anti/full_outer must surface exactly the dangling
    rows; semi/inner must drop them identically on both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ncust, nord, nsupp, npart, nline = 40, 120, 15, 30, 150
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                     "HOUSEHOLD", "MACHINERY"])
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(ncust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(ncust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, ncust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, ncust), 2)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, ncust)]),
    }), f"{tmp_path}/customer.parquet")
    base = np.datetime64("1997-01-01", "us")
    # custkeys 0..59 over 40 real customers: ~1/3 of orders dangle
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(nord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, 60, nord).astype(np.int64)),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, nord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 90000, nord), 2)),
        "o_orderdate": pa.array(
            (base + (rng.integers(0, 60, nord) * 86_400)
             .astype("timedelta64[s]")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])[rng.integers(0, 5, nord)]),
    }), f"{tmp_path}/orders.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(nsupp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(nsupp)]),
        "s_nationkey": pa.array(rng.integers(0, 40, nsupp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, nsupp), 2)),
    }), f"{tmp_path}/supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(npart, dtype=np.int64)),
        "p_name": pa.array([f"part y {i}" for i in range(npart)]),
        "p_brand": pa.array([f"Brand#{1 + i % 3}1" for i in range(npart)]),
        "p_type": pa.array(
            np.array(["STANDARD PLATED", "ECONOMY ANODIZED"])[
                rng.integers(0, 2, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2100, npart), 2)),
    }), f"{tmp_path}/part.parquet")
    flag_pairs = [("A", "F"), ("N", "O"), ("R", "F")]
    fp = [flag_pairs[i] for i in rng.integers(0, 3, nline)]
    # partkeys 0..44 over 30 real parts: dangling lineitems too
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, nord, nline).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, 45, nline).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, nsupp, nline).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, nline).astype(np.int32)),
        "l_quantity": pa.array(rng.choice([1.0, 10.0, 50.0], nline)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 100000, nline), 2)),
        "l_discount": pa.array(np.round(rng.choice([0.0, 0.05], nline), 2)),
        "l_tax": pa.array(np.round(rng.choice([0.0, 0.08], nline), 2)),
        "l_returnflag": pa.array([p[0] for p in fp]),
        "l_linestatus": pa.array([p[1] for p in fp]),
        "l_shipdate": pa.array(
            (base + (rng.integers(0, 400, nline) * 86_400)
             .astype("timedelta64[s]")).astype("datetime64[us]")),
    }), f"{tmp_path}/lineitem.parquet")

    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        "n_regionkey": pa.array(
            np.array([i % 5 for i in range(25)], dtype=np.int32)),
    }), f"{tmp_path}/nation.parquet")

    con = duckdb.connect()
    for t in ("customer", "orders", "supplier", "part", "lineitem",
              "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')")
    for name in _JOIN_FUZZ_KEYS:
        ok, detail = compare(QUERIES[name](spark, str(tmp_path)),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


@pytest.mark.parametrize("seed", [83])
def test_join_keys_null_key_fuzz(spark, tmp_path, seed):
    """NULL JOIN KEYS: ~8% NULL o_custkey and l_partkey on the fact
    sides. SQL equi-joins never match NULL keys — inner/semi drop
    those rows, left/anti keep them, and the salted-skew path must
    salt a NULL key without crashing or inventing matches. Dimension
    primary keys stay non-null."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ncust, nord, nsupp, npart, nline = 30, 100, 12, 25, 130
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                     "HOUSEHOLD", "MACHINERY"])
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(ncust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(ncust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, ncust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, ncust), 2)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, ncust)]),
    }), f"{tmp_path}/customer.parquet")
    base = np.datetime64("1997-01-01", "us")
    cust_keys = [None if rng.random() < 0.08 else int(k)
                 for k in rng.integers(0, 45, nord)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(nord, dtype=np.int64)),
        "o_custkey": pa.array(cust_keys, pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, nord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 90000, nord), 2)),
        "o_orderdate": pa.array(
            (base + (rng.integers(0, 60, nord) * 86_400)
             .astype("timedelta64[s]")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])[rng.integers(0, 5, nord)]),
    }), f"{tmp_path}/orders.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(nsupp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(nsupp)]),
        "s_nationkey": pa.array(rng.integers(0, 40, nsupp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, nsupp), 2)),
    }), f"{tmp_path}/supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(npart, dtype=np.int64)),
        "p_name": pa.array([f"part z {i}" for i in range(npart)]),
        "p_brand": pa.array([f"Brand#{1 + i % 3}1" for i in range(npart)]),
        "p_type": pa.array(
            np.array(["STANDARD PLATED", "ECONOMY ANODIZED"])[
                rng.integers(0, 2, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2100, npart), 2)),
    }), f"{tmp_path}/part.parquet")
    flag_pairs = [("A", "F"), ("N", "O"), ("R", "F")]
    fp = [flag_pairs[i] for i in rng.integers(0, 3, nline)]
    part_keys = [None if rng.random() < 0.08 else int(k)
                 for k in rng.integers(0, 35, nline)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, nord, nline).astype(np.int64)),
        "l_partkey": pa.array(part_keys, pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, nsupp, nline).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, nline).astype(np.int32)),
        "l_quantity": pa.array(rng.choice([1.0, 10.0, 50.0], nline)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 100000, nline), 2)),
        "l_discount": pa.array(np.round(rng.choice([0.0, 0.05], nline), 2)),
        "l_tax": pa.array(np.round(rng.choice([0.0, 0.08], nline), 2)),
        "l_returnflag": pa.array([p[0] for p in fp]),
        "l_linestatus": pa.array([p[1] for p in fp]),
        "l_shipdate": pa.array(
            (base + (rng.integers(0, 400, nline) * 86_400)
             .astype("timedelta64[s]")).astype("datetime64[us]")),
    }), f"{tmp_path}/lineitem.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        "n_regionkey": pa.array(
            np.array([i % 5 for i in range(25)], dtype=np.int32)),
    }), f"{tmp_path}/nation.parquet")

    con = duckdb.connect()
    for t in ("customer", "orders", "supplier", "part", "lineitem",
              "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')")
    for name in _JOIN_FUZZ_KEYS:
        ok, detail = compare(QUERIES[name](spark, str(tmp_path)),
                             con.sql(ORACLES[name]))
        assert ok, f"{name} (seed {seed}): {detail}"


def test_window_funnel_empty_and_degenerate(spark, tmp_path):
    """Zero qualifying users must yield an empty frame (not an error),
    and a single lonely view yields depth 1."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, T0, 9, "view", 1.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.parquet(f"{sf_dir}/events.parquet")
    out = QUERIES["events_window_funnel_conversion"](spark, sf_dir)
    assert [(r.funnel_depth, r.n_users) for r in out.collect()] == [(1, 1)]
