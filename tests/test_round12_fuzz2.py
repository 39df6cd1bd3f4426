"""Round-12 differential-fuzzing extension (wave 2).

The first fuzz campaign (test_round12_fixes.py) covered 54 of the 143
oracled catalog keys and found seven real engine/oracle divergences.
This file extends the same harness — random tables with adversarial
shapes run through the Spark query AND its DuckDB oracle — to the
key families the first campaign skipped. Same rules: fixed seeds so
the gate is reproducible; every divergence is investigated, fixed in
whichever side mis-encodes the intended rule, and the touched key is
re-verified hash-green on driver testdata in a vanilla session.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import compare
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


def _random_events(rng, n: int) -> pa.Table:
    """Random events with the adversarial shapes the uniform testdata
    never produces: exact-duplicate timestamps, a single-event user, a
    constant-valued user (zero variance for OLS/MAD/IQR denominators),
    heavy exact ties in `value`."""
    base = np.datetime64("2024-02-01", "us")
    ts = base + rng.integers(0, 21 * 86_400, n).astype("timedelta64[s]")
    dup_idx = rng.integers(0, n, n // 10)
    ts[dup_idx] = ts[(dup_idx + 1) % n]  # planted exact-tie pairs
    types = np.array(["view", "click", "purchase", "signup", "error"])
    user = rng.integers(1, 8, n).astype(np.int64)
    user[0] = 99                              # single-event user
    value = np.round(rng.choice([1.0, 2.5, 2.5, 42.0, 99.99], n)
                     + rng.choice([0.0, 0.0, 0.01], n), 2)
    value[user == 3] = 7.0                    # constant-valued group
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(value),
        "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 9, n)]),
    })


_EVENTS_BATCH_KEYS = [
    # the events-reading batch keys the first campaign skipped
    "agg_array_collect", "agg_grouped_mad_pandas", "agg_percentile_exact",
    "agg_pivot", "agg_regression_ols", "cogroup_asof_merge",
    "json_funcs", "sample_stratified", "ts_outlier_iqr",
    "window_range_frame",
]


@pytest.mark.parametrize("seed", [5, 61])
def test_events_batch_keys_differential_fuzz(spark, tmp_path, seed):
    """Wave 2a: the remaining events-reading batch keys. Stressors:
    a zero-variance user (OLS slope / MAD / IQR denominators), a
    single-event user (interpolated percentiles on n=1), exact value
    ties (range-frame peers, argmax inside collect ordering), and
    duplicate timestamps (as-of cogroup merge tiebreaks)."""
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _random_events(rng, 300))
    con = _duck(tmp_path, "events")
    _run(spark, tmp_path, con, _EVENTS_BATCH_KEYS, seed)


@pytest.mark.parametrize("seed", [67])
def test_events_batch_keys_null_injection_fuzz(spark, tmp_path, seed):
    """Wave 2a-null: ~8% NULL `value` and ~5% NULL `props` over the
    same keys — aggregates/percentiles/OLS must skip NULL measures
    identically on both engines, and JSON extraction must treat a
    NULL document as an absent key."""
    rng = np.random.default_rng(seed)
    tbl = _random_events(rng, 300)
    value = tbl.column("value").to_pylist()
    props = tbl.column("props").to_pylist()
    value = [None if rng.random() < 0.08 else v for v in value]
    props = [None if rng.random() < 0.05 else p for p in props]
    tbl = tbl.set_column(tbl.schema.get_field_index("value"), "value",
                         pa.array(value, pa.float64()))
    tbl = tbl.set_column(tbl.schema.get_field_index("props"), "props",
                         pa.array(props, pa.string()))
    _write(tmp_path, "events", tbl)
    con = _duck(tmp_path, "events")
    _run(spark, tmp_path, con, _EVENTS_BATCH_KEYS, seed)


# ---------------------------------------------------------------------------
# Wave 2b: orders / customer / nation / part / region keys
# ---------------------------------------------------------------------------

def _random_tpch_dims(rng):
    """Random TPC-H-shaped tables with the adversarial shapes the
    generated testdata never has: duplicate order keys (uniqueness
    audit), dangling FKs in both child directions (fk_integrity must
    count them, joins must drop them identically), boundary prices
    sitting exactly on filter constants (strict-> vs >=), heavy ties
    on every ranking measure, and names that hit the replace/PII
    patterns multiple times."""
    tables = {}

    tables["region"] = pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(["AMERICA", "ASIA", "EUROPE", "AFRICA",
                            "MIDDLE EAST"]),
    })

    n_names = [f"NATION {i:02d}" for i in range(25)]
    n_rk = rng.integers(0, 5, 25).astype(np.int32)
    n_rk[7] = 9                                   # dangling -> region
    tables["nation"] = pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array(n_names),
        "n_regionkey": pa.array(n_rk),
    })

    nc = 80
    names = [f"Customer#{k:09d}" for k in range(1, nc + 1)]
    names[3] = "Customer Customer#000000004"      # double 'Customer'
    names[5] = "Cust 123-456-7890 omer"           # phone-shaped digits
    names[9] = "a.b_c%d+e Customer#10"            # email local-part chars
    c_nk = rng.integers(0, 25, nc).astype(np.int32)
    c_nk[11] = 77                                 # dangling -> nation
    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY",
                     "HOUSEHOLD", "FURNITURE"])
    tables["customer"] = pa.table({
        "c_custkey": pa.array(np.arange(1, nc + 1, dtype=np.int64)),
        "c_name": pa.array(names),
        "c_nationkey": pa.array(c_nk),
        "c_acctbal": pa.array(np.round(
            rng.choice([-999.99, 0.0, 1000.5, 1000.5, 7777.77], nc), 2)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, nc)]),
    })

    np_ = 60
    tables["part"] = pa.table({
        "p_partkey": pa.array(np.arange(1, np_ + 1, dtype=np.int64)),
        "p_name": pa.array([f"part {i} blue" for i in range(np_)]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 6, np_)]),
        "p_type": pa.array(rng.choice(["STANDARD", "SMALL", "LARGE"], np_)),
        "p_size": pa.array(rng.integers(1, 51, np_).astype(np.int32)),
        "p_retailprice": pa.array(np.round(
            rng.choice([901.0, 901.0, 1500.5, 2099.99], np_), 2)),
    })

    no = 400
    okey = np.arange(1, no + 1, dtype=np.int64)
    okey[10], okey[11] = okey[9], okey[9]          # multiplicity-3 PK
    okey[20] = okey[19]                            # multiplicity-2 PK
    ock = rng.integers(1, nc + 1, no).astype(np.int64)
    ock[rng.integers(0, no, 8)] = 901              # dangling -> customer
    base = np.datetime64("1995-01-01", "us")
    odate = base + (rng.integers(0, 1200, no) * 86_400).astype("timedelta64[s]")
    # exactly-on-boundary price for set_union_all's > 300000 branch
    price = np.round(rng.choice(
        [1000.0, 2500.5, 2500.5, 300000.0, 424242.42], no), 2)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])
    tables["orders"] = pa.table({
        "o_orderkey": pa.array(okey),
        "o_custkey": pa.array(ock),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, no)]),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, no)]),
    })

    nl = 300
    lok = rng.choice(okey, nl).astype(np.int64)
    lok[rng.integers(0, nl, 6)] = 9999             # dangling -> orders
    tables["lineitem"] = pa.table({
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array(rng.integers(1, np_ + 1, nl).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(1, 11, nl).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, nl).astype(np.int32)),
        "l_quantity": pa.array(rng.choice([1.0, 5.0, 50.0], nl)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 90000, nl), 2)),
        "l_discount": pa.array(rng.choice([0.0, 0.05, 0.1], nl)),
        "l_tax": pa.array(rng.choice([0.0, 0.08], nl)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], nl)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], nl)),
        "l_shipdate": pa.array(
            (base + (rng.integers(0, 1300, nl) * 86_400)
             .astype("timedelta64[s]")).astype("datetime64[us]")),
    })
    return tables


_TPCH_DIM_KEYS = [
    "project_columns", "rename_columns", "date_funcs", "filter_null_safe",
    "sample_deterministic", "sample_hash_split",
    "set_union_all", "set_intersect", "set_except",
    "window_first_last", "window_lag_lead", "window_rank_family",
    "window_ntile_quartiles", "window_percent_of_total",
    "agg_argmax_struct", "str_funcs", "text_pii_redact",
    "events_rfm_segments", "dq_uniqueness_orders", "dq_fk_integrity",
    "sql_full_surface", "csv_parse_rfc4180",
    "sink_parquet_snappy", "sink_csv_per_source", "sink_jdbc_append",
]


@pytest.mark.parametrize("seed", [13, 83])
def test_tpch_dim_keys_differential_fuzz(spark, tmp_path, seed):
    """Wave 2b: the orders/customer/nation/part keys the first
    campaign skipped — windows with heavy ranking ties, set ops with
    duplicate members, RFM quantile cutoffs over tie-heavy counts,
    uniqueness/FK audits on tables that actually violate them, PII
    redaction over names crafted to hit the patterns, and the three
    sink round-trips on random content."""
    rng = np.random.default_rng(seed)
    tables = _random_tpch_dims(rng)
    for name, tbl in tables.items():
        _write(tmp_path, name, tbl)
    con = _duck(tmp_path, *tables)
    _run(spark, tmp_path, con, _TPCH_DIM_KEYS, seed)


@pytest.mark.parametrize("seed", [89])
def test_dq_uniqueness_null_audit_fuzz(spark, tmp_path, seed):
    """The uniqueness/null audit must COUNT null custkeys and dates,
    so this key gets its own NULL-injected orders table (the other
    orders keys keep non-null sort keys per the recorded scope
    decision on NULL ordering semantics)."""
    rng = np.random.default_rng(seed)
    tables = _random_tpch_dims(rng)
    t = tables["orders"]
    ock = [None if rng.random() < 0.06 else v
           for v in t.column("o_custkey").to_pylist()]
    od = [None if rng.random() < 0.04 else v
          for v in t.column("o_orderdate").to_pylist()]
    t = t.set_column(t.schema.get_field_index("o_custkey"), "o_custkey",
                     pa.array(ock, pa.int64()))
    t = t.set_column(t.schema.get_field_index("o_orderdate"), "o_orderdate",
                     pa.array(od, pa.timestamp("us")))
    _write(tmp_path, "orders", t)
    con = _duck(tmp_path, "orders")
    _run(spark, tmp_path, con, ["dq_uniqueness_orders"], seed)
