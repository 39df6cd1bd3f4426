"""Pins the r17 oracle decimal-cast convention (catalog._dsum): for
ANY double, DuckDB's STRING-hopped conversions must equal Spark's
native casts in BOTH directions —

* double -> DECIMAL(27,6): Spark rounds the shortest repr
  (``BigDecimal(Double.toString(d))``, HALF_UP); DuckDB's direct cast
  rounds the exact binary expansion instead, so the oracle hops
  through STRING.
* DECIMAL -> double: Spark's ``Decimal.toDouble`` is correctly
  rounded; DuckDB's direct cast double-rounds ``unscaled/10^scale``
  past 2^53, so the oracle hops through STRING.

Adversarial inputs: repr-boundary values (shortest repr terminating
in ...5 at the 7th fractional digit), magnitudes straddling 2^53,
and a seeded random spread. Caught live by the r17 sf1 differential
(agg_weighted_avg / sample_hash_split, BENCH_NOTES_r17 §3.1).
"""

from __future__ import annotations

import random

import duckdb
import pytest


def _adversarial_doubles() -> list[float]:
    rng = random.Random(1742)
    vals: list[float] = []
    # repr-boundary: shortest repr ends in '5' right past the 6dp cut
    for base in (1.0, 88322.0, 1234.0):
        for k in range(1, 10):
            vals.append(base + k * 5e-7)
    # magnitudes straddling the 2^53 unscaled cliff (scale 6: the
    # cliff sits near 9e15/1e6 = 9e9)
    for mag in (1e9, 9e9, 3e11, 3e12, 9e15 / 1e6):
        for _ in range(20):
            vals.append(rng.uniform(0.9, 1.1) * mag + rng.random())
    # plain random spread incl. negatives and sub-1 values
    for _ in range(100):
        vals.append(rng.uniform(-1e6, 1e6))
        vals.append(rng.uniform(-1.0, 1.0) * 10 ** rng.randint(-8, 12))
    return vals


def test_string_hop_matches_spark_casts_both_directions(spark):
    from pyspark.sql import functions as F

    vals = _adversarial_doubles()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                "i int, v double")
    spark_rows = (sdf.select(
        "i",
        F.col("v").cast("decimal(27,6)").cast("string").alias("dec"),
        F.col("v").cast("decimal(27,6)").cast("double").alias("back"))
        .collect())
    spark_dec = {r.i: r.dec for r in spark_rows}
    spark_back = {r.i: r.back for r in spark_rows}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, v) for i, v in enumerate(vals)])
    # the _dsum form: the CASE guard zeroes |v| < 5e-7 (DuckDB's
    # sci-notation parse rounds at the first significant digit once
    # every digit falls below the scale — '7e-9' -> 0.000001; Spark
    # rounds those to 0.000000, and so does the guard, exactly)
    duck = con.sql("""
        SELECT i,
               CAST(CAST(CASE WHEN ABS(v) < 5e-7 THEN 0.0 ELSE v END
                    AS STRING) AS DECIMAL(27,6)) AS dec,
               CAST(CAST(CAST(CAST(CASE WHEN ABS(v) < 5e-7 THEN 0.0
                         ELSE v END AS STRING) AS DECIMAL(27,6))
                    AS STRING) AS DOUBLE) AS back
        FROM t""").fetchall()

    bad_dec, bad_back = [], []
    for i, dec, back in duck:
        # decimal compare on normalized string (Spark keeps 6 places)
        if f"{dec:.6f}" != spark_dec[i]:
            bad_dec.append((i, vals[i], str(dec), spark_dec[i]))
        if back != spark_back[i]:
            bad_back.append((i, vals[i], back, spark_back[i]))
    assert not bad_dec, bad_dec[:5]
    assert not bad_back, bad_back[:5]


def test_direct_duckdb_casts_do_diverge():
    """The counter-pin: WITHOUT the hop, DuckDB's direct casts differ
    from the hopped ones on known inputs — i.e. the hop is load-
    bearing, not decorative. (decimal->double double-rounding needs
    unscaled > 2^53.)"""
    con = duckdb.connect()
    direct, hop = con.sql("""
        SELECT CAST(309214536317.350000::DECIMAL(27,6) AS DOUBLE),
               CAST(CAST(309214536317.350000::DECIMAL(27,6) AS STRING)
                    AS DOUBLE)""").fetchone()
    assert direct != hop  # DuckDB double-rounds the direct cast
    assert hop == float("309214536317.35")  # correctly rounded
