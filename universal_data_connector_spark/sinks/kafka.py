"""Kafka sink.

Reference K4 (``factory/sink/KafkaSinkContext.java:43-56``) sends each
item as BOTH key and value to one topic, fire-and-forget. Mirrored
here: ``content`` becomes key and value unless the frame already
carries explicit ``key``/``value`` columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_sink(df: DataFrame, props: dict, streaming: bool = False):
    if "value" not in df.columns:
        src = F.col("content").cast("string")
        df = df.select(src.alias("key"), src.alias("value"))
    writer_opts = {
        "kafka.bootstrap.servers": props["bootstrapServers"],
        "topic": props["topic"],
    }
    if streaming:
        return (df.writeStream.format("kafka").options(**writer_opts)
                .option("checkpointLocation", props["checkpointLocation"])
                .start())
    df.write.format("kafka").options(**writer_opts).save()
    return None
