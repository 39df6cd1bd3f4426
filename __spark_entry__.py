"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over `universal_data_connector_spark.plans.catalog`, the
engine's declared operator catalog (one entry per implemented operator
from SURVEY.md §2B, each paired with its DuckDB oracle SQL where
ANSI-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from universal_data_connector_spark.plans.catalog import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the composed
    LLM-corpus-cleaning pipeline (quality filter -> exact dedup by
    normalized-text fingerprint -> per-language stats), built entirely
    from the engine's own operators."""
    return QUERIES["pipeline_clean_corpus"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query key; keys absent here (LSH
    signatures, approx sketches, IVF) get the driver's rows-only check."""
    return dict(ORACLES)
