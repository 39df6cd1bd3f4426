"""Memory / noop sinks — test and benchmark surfaces (no reference
counterpart; the reference's manual smoke workflow, README.md:34-124,
is replaced by automated assertions over these)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def memory_sink(df: DataFrame, props: dict, streaming: bool = False):
    name = props.get("queryName", "udc_memory")
    if streaming:
        return (df.writeStream.format("memory").queryName(name)
                .outputMode(props.get("outputMode", "append"))
                .start())
    df.createOrReplaceTempView(name)
    return None


def noop_sink(df: DataFrame, props: dict, streaming: bool = False):
    if streaming:
        return (df.writeStream.format("noop")
                .option("checkpointLocation", props["checkpointLocation"])
                .start())
    df.write.format("noop").mode("overwrite").save()
    return None
