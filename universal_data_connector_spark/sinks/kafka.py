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


def _kafka_sink_loopback(df: DataFrame, props: dict) -> None:
    """Produce to the loopback broker (``kafka_loopback.py``):
    executor-side appends via ``foreachPartition`` (the S3 sink's
    distributed-PUT shape), keyed partitioning bit-compatible with
    Kafka's DefaultPartitioner (murmur2). ``numPartitions`` sizes the
    topic at auto-create; an existing topic keeps its count."""
    from universal_data_connector_spark import kafka_loopback as KL

    dir_ = KL.broker_dir(props)
    topic = props["topic"]
    n_parts = KL.ensure_topic(dir_, topic,
                              int(props.get("numPartitions", 1)))
    key = (F.col("key").cast("binary") if "key" in df.columns
           else F.lit(None).cast("binary"))
    shaped = df.select(key.alias("key"),
                       F.col("value").cast("binary").alias("value"))

    def send(rows) -> None:
        from pyspark import TaskContext

        from universal_data_connector_spark import kafka_loopback as kl
        # null values pass through as TOMBSTONES — Spark's real kafka
        # writer produces them too (compacted-topic deletes), so the
        # loopback must not diverge by crashing on them (r10 review)
        batch = [(bytes(r.key) if r.key is not None else None,
                  bytes(r.value) if r.value is not None else None)
                 for r in rows]
        if batch:
            # per-task round-robin seed: without it every task's
            # unkeyed records restart at topic partition 0, skewing
            # the distribution vs the real partitioner (r10 ADVICE)
            tc = TaskContext.get()
            base = tc.partitionId() if tc is not None else 0
            kl.append_records(dir_, topic, batch, n_parts,
                              counter_base=base)

    shaped.foreachPartition(send)


def kafka_sink(df: DataFrame, props: dict, streaming: bool = False):
    from universal_data_connector_spark.kafka_loopback import is_loopback

    df = kafka_records(df)
    if is_loopback(props):
        if streaming:
            raise ValueError(
                "the loopback broker is batch-only; streaming needs a "
                "real broker via Spark's kafka connector")
        _kafka_sink_loopback(df, props)
        return None
    opts = kafka_writer_options(props)
    if streaming:
        return (df.writeStream.format("kafka").options(**opts)
                .option("checkpointLocation", props["checkpointLocation"])
                .start())
    df.write.format("kafka").options(**opts).save()
    return None
