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
