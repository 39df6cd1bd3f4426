"""JDBC sink: batched append with real columns.

Reference K3 (``factory/sink/JdbcSinkContext.java:21-93``) binds the
ENTIRE item string as one value into a single-``?`` INSERT and commits
every 100 rows. This sink writes real columns batched through Spark's
JDBC writer (``batchsize`` rows per round-trip, parallel per
partition) — the reference's one-string-per-row quirk is documented,
not reproduced (SURVEY.md §2A K3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _options(props: dict) -> dict:
    opts = {
        "url": props["jdbcUrl"],
        "dbtable": props["table"],
        "batchsize": str(props.get("batchSize", 1000)),
    }
    for k_src, k_dst in (("user", "user"), ("password", "password"), ("driver", "driver")):
        if props.get(k_src) is not None:
            opts[k_dst] = props[k_src]
    return opts


def jdbc_sink(df: DataFrame, props: dict, streaming: bool = False):
    opts = _options(props)
    mode = props.get("mode", "append")
    if streaming:
        def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
            batch_df.write.format("jdbc").options(**opts).mode(mode).save()
        return (df.writeStream.foreachBatch(write_batch)
                .option("checkpointLocation", props["checkpointLocation"])
                .start())
    df.write.format("jdbc").options(**opts).mode(mode).save()
    return None
