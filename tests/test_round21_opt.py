"""Round-21 optimization pins.

The scaled exact-sum fast path (`operators/relational.exact_sum_scaled`)
must be BIT-IDENTICAL to `exact_sum` on every input it was switched to:
the r21 optimization replaced the per-row string-based double->decimal
cast with floor(v*1e6 + 0.5) scaled-integer accumulation at ~20 catalog
call sites, and these tests pin that the replacement computes the same
doubles — on the real testdata columns, on the clean products the
catalog sums, and on randomized <=2dp / round(x, 6) values.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from universal_data_connector_spark.operators import relational as orel
from universal_data_connector_spark.tables import load

SF = "/root/testdata/sf0.001"


def _pairs(df, expr):
    row = df.agg(orel.exact_sum(expr).alias("a"),
                 orel.exact_sum_scaled(expr).alias("b")).collect()[0]
    return row["a"], row["b"]


@pytest.mark.parametrize("table,expr_name", [
    ("orders", "o_totalprice"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("events", "value"),
    ("customer", "c_acctbal"),  # negative balances: HALF_UP away-from-zero side
])
def test_scaled_sum_matches_decimal_sum_on_testdata(spark, table, expr_name):
    a, b = _pairs(load(spark, SF, table), expr_name)
    assert a == b


def test_scaled_sum_matches_on_clean_products(spark):
    """The catalog's converted product expressions: qty*price (2-dp,
    <= ~5.3e6), qty^2 (integer), price*(1-disc) (4-dp, <= ~1.1e5)."""
    li = load(spark, SF, "lineitem")
    x, y, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    for expr in (x * y, x * x, y * (1 - d)):
        a, b = _pairs(li, expr)
        assert a == b


def test_scaled_sum_matches_grouped(spark):
    """Grouped form (the actual catalog shape): every group agrees."""
    li = load(spark, SF, "lineitem")
    rows = (li.groupBy("l_returnflag")
              .agg(orel.exact_sum("l_extendedprice").alias("a"),
                   orel.exact_sum_scaled("l_extendedprice").alias("b"))
              .collect())
    assert rows and all(r["a"] == r["b"] for r in rows)


def test_scaled_sum_null_and_empty_semantics(spark):
    df = spark.createDataFrame(
        [(1, None), (1, 2.25), (2, None)], "k int, v double")
    rows = (df.groupBy("k")
              .agg(orel.exact_sum("v").alias("a"),
                   orel.exact_sum_scaled("v").alias("b"))
              .collect())
    got = {r["k"]: (r["a"], r["b"]) for r in rows}
    assert got[1] == (2.25, 2.25)
    assert got[2] == (None, None)


def test_scaled_sum_property_random_2dp(spark):
    """Randomized: 2-dp money-like values (mixed sign, up to 1e6) and
    F.round(x, 6) outputs both satisfy the clean-6dp contract."""
    rng = random.Random(21)
    vals = [round(rng.uniform(-1e6, 1e6), 2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    a, b = _pairs(df, "v")
    assert a == b
    # round(x, 6) of arbitrary doubles is clean at 6 dp by construction
    raw = [rng.uniform(-1e3, 1e3) for _ in range(5000)]
    df6 = (spark.createDataFrame([(v,) for v in raw], "v double")
           .select(F.round("v", 6).alias("v")))
    a, b = _pairs(df6, "v")
    assert a == b


def test_scaled_running_sum_matches(spark):
    o = load(spark, SF, "orders")
    base = orel.running_sum(
        o, ["o_custkey"],
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        F.col("o_totalprice"), "rt").select("o_orderkey", "rt")
    fast = orel.running_sum(
        o, ["o_custkey"],
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        F.col("o_totalprice"), "rt", clean6=True).select("o_orderkey", "rt")
    diff = base.join(fast, "o_orderkey") \
               .filter(base["rt"] != fast["rt"]).count()
    assert diff == 0


def test_scaled_avg_matches(spark):
    li = load(spark, SF, "lineitem")
    rows = (li.groupBy("l_returnflag")
              .agg(orel.exact_avg("l_quantity").alias("a"),
                   orel.exact_avg_scaled("l_quantity").alias("b"))
              .collect())
    assert rows and all(r["a"] == r["b"] for r in rows)


def test_corr_exact_spreads_narrow_scan(spark):
    """agg_corr_exact pre-spreads the lineitem scan (guide §2.5: a
    single-row-group parquet file scans as ONE task, serializing the
    decimal-cast moment partials on one core). On the narrow local
    input the plan must carry the spread's hashpartitioning(l_orderkey)
    exchange; on a no-files frame (post-shuffle / in-memory, already
    carrying session parallelism) spread must be the identity — the
    guard that keeps wide inputs (the 100 TB case: estimated splits
    >= cluster parallelism) from paying the extra exchange."""
    from universal_data_connector_spark.plans.catalog import QUERIES

    p = QUERIES["agg_corr_exact"](spark, SF)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "l_orderkey" in p, f"spread repartition missing:\n{p}"

    mem = spark.range(100).withColumnRenamed("id", "l_orderkey")
    assert orel.spread(mem, "l_orderkey") is mem


def test_repetition_ratio_spreads_narrow_scan(spark):
    """text_repetition_ratio's interpreted higher-order gram build is
    the heaviest per-row projection in the catalog; it must not fuse
    into a one-task narrow scan (guide §2.5). Same spread() guard as
    agg_corr_exact: fires on the local single-row-group file, identity
    on wide inputs."""
    from universal_data_connector_spark.plans.catalog import QUERIES

    p = QUERIES["text_repetition_ratio"](spark, SF)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # Pin the repartition node itself (the r21 advice flagged the old
    # "doc_id before Relation" fallback as near-vacuous: Project nodes
    # above the scan always reference doc_id).
    assert "RepartitionByExpression" in p, f"spread repartition missing:\n{p}"


def test_cogroup_asof_merge_arrow_path_and_semantics(spark, tmp_path):
    """cogroup_asof_merge moved to applyInArrow + a numpy searchsorted
    body (r21): the pandas cogroup serializer cost ~5 ms/group of
    DataFrame construction and merge_asof another ~2.5 ms/group. Pin
    (a) the Arrow cogroup node in the plan, and (b) the exact asof
    semantics the old body had: backward match, ties on ts take the
    max event_id purchase, clicks with no preceding purchase get NULL,
    purchase-only users emit nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from universal_data_connector_spark.plans.catalog import QUERIES

    p = QUERIES["cogroup_asof_merge"](spark, SF)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "FlatMapCoGroupsInArrow" in p or "Arrow" in p, p
    assert "FlatMapCoGroupsInPandas" not in p

    import numpy as np

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "ts": pa.array(np.array(["2024-01-01T00:00:00", "2024-01-01T00:10:00",
                                 "2024-01-01T00:10:00", "2024-01-01T00:05:00",
                                 "2024-01-01T00:00:30", "2024-01-01T00:20:00",
                                 "2024-01-01T00:01:00"],
                                dtype="datetime64[us]")),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["click", "purchase", "purchase", "click",
                                "purchase", "purchase", "click"]),
        "value": pa.array([None, 10.0, 20.0, None, 5.0, 9.0, None],
                          pa.float64()),
        "props": pa.array(["{}"] * 7),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = {(r["click_id"], r["user_id"]): r["purchase_value"]
            for r in QUERIES["cogroup_asof_merge"](spark, str(tmp_path))
            .collect()}
    # click 1 at 00:00: no purchase at or before -> NULL
    assert rows[(1, 1)] is None
    # click 4 at 00:05: latest preceding purchase is event 5 (00:00:30)
    assert rows[(4, 1)] == 5.0
    # click 7 (user 3): no purchases for the user at all -> NULL
    assert rows[(7, 3)] is None
    # user 2 has only purchases -> no output rows
    assert all(u != 2 for (_, u) in rows)
    assert len(rows) == 3
