"""Loading the driver-generated parquet tables (TESTDATA.md).

Column pruning and predicate pushdown happen at the parquet scan as long
as callers keep the lineage declarative (``load(...).select(...)
.filter(...)``) — verified via ``.explain`` in tests (PushedFilters /
ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as bigint
# (spark.sql.legacy.parquet.nanosAsLong, set in session.pin) and we
# restore TimestampType here by integer-dividing to microseconds.
_NANO_TS_COLS = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load(spark, sf_dir, n) for n in (names or TABLES))
