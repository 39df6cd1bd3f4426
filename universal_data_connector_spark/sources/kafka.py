"""Kafka source: value-first, metadata available.

Reference S4 (``factory/source/KafkaSourceContext.java:48-56``) polls a
``KafkaConsumer`` and keeps only record *values*, discarding key /
topic / partition / offset / timestamp. This source exposes them all as
columns (they're free) but aliases ``value`` -> ``content`` so the
default pipeline surface matches the reference's value-only contract
(SURVEY.md §7.4.7).

Requires the spark-sql-kafka package on the classpath; construction is
declarative so the plan builds anywhere, and fails at execution with
Spark's own error if the connector jar is absent. The option mapping
and the projection are pure functions so the contract is testable
without a broker (tests/test_round3_fixes.py); only the broker I/O
itself is untestable in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_reader_options(props: dict) -> dict:
    """Reference consumer-config mapping (``KafkaSourceContext.java:
    27-41``): bootstrap servers + topic subscription, with the
    reference's legacy ``smallest``/``largest`` auto.offset.reset
    values translated to Spark's ``earliest``/``latest``."""
    offset = str(props.get("autoOffsetReset", "earliest"))
    offset = {"smallest": "earliest", "largest": "latest"}.get(offset, offset)
    opts = {
        "kafka.bootstrap.servers": props["bootstrapServers"],
        "subscribe": props["topic"],
        "startingOffsets": offset,
    }
    if props.get("groupId"):
        opts["kafka.group.id"] = props["groupId"]
    return opts


def project_kafka(df: DataFrame) -> DataFrame:
    """Kafka wire schema -> pipeline surface: value-as-content (the
    reference keeps only values), key/topic/partition/offset/timestamp
    as free metadata columns."""
    return df.select(
        F.col("value").cast("string").alias("content"),
        F.col("key").cast("string").alias("message_key"),
        "topic", "partition", "offset",
        F.col("timestamp").alias("ts"),
        F.lit("KAFKA_SOURCE").alias("source_file"),
    )


def kafka_source(spark: SparkSession, props: dict, streaming: bool = True) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    return project_kafka(
        reader.format("kafka").options(**kafka_reader_options(props)).load())
