"""Source connector registry: config -> DataFrame.

Reference sources (``factory/SourceFactory.java:39-161`` in
ThatNinjaGuy/universal-data-connector) emit in-band string envelopes
(``SOURCE=<file>|TYPE=<t>|<content>``); this engine promotes the
envelope to real columns instead (SURVEY.md §1.5):

    source_file: string   -- originating file path / object key
    file_type:   string   -- CSV | TEXT | PARQUET | CRC | BINARY
    content:     string | binary

One row per *file* (file-mode). Column-aware stages (filter-by-column,
schema-bound parquet sinks) promote file-mode to record-mode — one row
per CSV record with typed columns — via ``records.csv_blob_to_records``.

Every source supports batch (``spark.read``) and streaming
(``spark.readStream``) construction from the same properties; the
streaming file source replaces the reference's static-set dedup +
move-to-processed (``FileSourceContext.java:20-21,113-125``) with
checkpointed file tracking + ``cleanSource=archive`` — the durable,
cluster-wide version of the same behavior.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from universal_data_connector_spark.config import SourceConfig
from universal_data_connector_spark.sources.files import (
    directory_source,
    file_source,
    s3_source,
)
from universal_data_connector_spark.sources.jdbc import jdbc_source
from universal_data_connector_spark.sources.kafka import kafka_source

SourceFn = Callable[[SparkSession, dict, bool], DataFrame]

SOURCES: dict[str, SourceFn] = {
    "file": file_source,
    "directory": directory_source,
    "jdbc": jdbc_source,
    "kafka": kafka_source,
    "s3": s3_source,
}


def create_source(spark: SparkSession, cfg: SourceConfig,
                  streaming: bool = False) -> DataFrame:
    """Type-dispatch mirroring ``SourceFactory.create``
    (``factory/SourceFactory.java:45-52``); unknown type raises."""
    try:
        fn = SOURCES[cfg.type]
    except KeyError:
        raise ValueError(f"unsupported source type: {cfg.type!r}; "
                         f"known: {sorted(SOURCES)}") from None
    return fn(spark, cfg.properties, streaming)
