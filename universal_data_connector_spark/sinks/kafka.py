"""Kafka sink.

Reference K4 (``factory/sink/KafkaSinkContext.java:43-56``) sends each
item as BOTH key and value to one topic, fire-and-forget. Mirrored
here: ``content`` becomes key and value unless the frame already
carries explicit ``key``/``value`` columns. Record shaping and option
mapping are pure functions, contract-tested without a broker
(tests/test_round3_fixes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_records(df: DataFrame) -> DataFrame:
    """Frame -> kafka record shape: the reference's item-as-key-AND-
    value contract (``KafkaSinkContext.java:50``) when no explicit
    key/value columns exist. An explicit ``key`` column is ALWAYS
    honored (it is the caller's partitioning key — discarding it would
    silently scatter records across partitions); ``value`` falls back
    to ``content``. A frame with neither value nor content has no
    payload to send and is rejected up front with a clear message
    instead of an AnalysisException from the Kafka writer."""
    if "value" in df.columns:
        return df
    if "content" not in df.columns:
        raise ValueError(
            "kafka sink needs a 'value' column or file-mode 'content' "
            f"to send; frame has {df.columns}")
    src = F.col("content").cast("string")
    key = F.col("key").cast("string") if "key" in df.columns else src
    return df.select(key.alias("key"), src.alias("value"))


def kafka_writer_options(props: dict) -> dict:
    return {
        "kafka.bootstrap.servers": props["bootstrapServers"],
        "topic": props["topic"],
    }


def kafka_sink(df: DataFrame, props: dict, streaming: bool = False):
    df = kafka_records(df)
    opts = kafka_writer_options(props)
    if streaming:
        return (df.writeStream.format("kafka").options(**opts)
                .option("checkpointLocation", props["checkpointLocation"])
                .start())
    df.write.format("kafka").options(**opts).save()
    return None
