"""Kafka source: value-first, metadata available.

Reference S4 (``factory/source/KafkaSourceContext.java:48-56``) polls a
``KafkaConsumer`` and keeps only record *values*, discarding key /
topic / partition / offset / timestamp. This source exposes them all as
columns (they're free) but aliases ``value`` -> ``content`` so the
default pipeline surface matches the reference's value-only contract
(SURVEY.md §7.4.7).

Requires the spark-sql-kafka package on the classpath; construction is
declarative so the plan builds anywhere, and fails at execution with
Spark's own error if the connector jar is absent (no broker in the test
container — engine tests cover dispatch, not brokers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source(spark: SparkSession, props: dict, streaming: bool = True) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    reader = (reader.format("kafka")
              .option("kafka.bootstrap.servers", props["bootstrapServers"])
              .option("subscribe", props["topic"])
              .option("startingOffsets",
                      props.get("autoOffsetReset", "earliest").replace("smallest", "earliest")))
    if props.get("groupId"):
        reader = reader.option("kafka.group.id", props["groupId"])
    df = reader.load()
    return df.select(
        F.col("value").cast("string").alias("content"),
        F.col("key").cast("string").alias("message_key"),
        "topic", "partition", "offset",
        F.col("timestamp").alias("ts"),
        F.lit("KAFKA_SOURCE").alias("source_file"),
    )
