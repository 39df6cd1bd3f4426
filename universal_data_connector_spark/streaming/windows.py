"""Event-time windowed aggregation and streaming dedup.

These operators are mode-agnostic: ``F.window`` / ``session_window`` /
``dropDuplicates`` build identical logical plans in batch and
streaming, so the catalog verifies their *semantics* against the DuckDB
oracle in batch (plans/catalog.py ``stream_*`` keys) while the tests
here run the *same* builders under ``readStream`` with real watermarks,
triggers, and state — late-data drops included.

Watermarks bound state at scale: without one, a windowed streaming agg
keeps every window open forever (unbounded state at 100 TB/day);
with one, state for windows older than (max event time - delay) is
evicted each micro-batch, and rows later than that are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(df: DataFrame, ts_col: str = "ts", width: str = "1 hour",
                 watermark: str | None = None, group_cols: tuple[str, ...] = (),
                 aggs: dict | None = None) -> DataFrame:
    """Tumbling event-time window; each row lands in exactly one window."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or {"n": F.count("*")}
    return (df.groupBy(F.window(ts_col, width).alias("w"), *group_cols)
              .agg(*[v.alias(k) for k, v in aggs.items()])
              .select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      *group_cols, *aggs.keys()))


def sliding_agg(df: DataFrame, ts_col: str = "ts", width: str = "2 hours",
                slide: str = "1 hour", watermark: str | None = None,
                aggs: dict | None = None) -> DataFrame:
    """Sliding window: width/slide copies of each row, pre-aggregated
    map-side like any other grouped agg."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or {"n": F.count("*")}
    return (df.groupBy(F.window(ts_col, width, slide).alias("w"))
              .agg(*[v.alias(k) for k, v in aggs.items()])
              .select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"), *aggs.keys()))


def session_agg(df: DataFrame, ts_col: str = "ts", gap: str = "10 minutes",
                key_cols: tuple[str, ...] = ("user_id",),
                watermark: str | None = None) -> DataFrame:
    """Session windows (dynamic gap-merged); streaming requires a
    watermark so closed sessions can be finalized and evicted."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
              .agg(F.count("*").alias("n_events"))
              .select(*key_cols,
                      F.col("w.start").alias("session_start"),
                      F.col("w.end").alias("session_end"), "n_events"))


def stateful_running_totals(df: DataFrame, key_col: str = "user_id",
                            ts_col: str = "ts", value_col: str = "value",
                            watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator: per-key running (count, sum) across
    micro-batches via ``applyInPandasWithState`` — the escape hatch for
    stateful logic that windowed aggregation can't express (reference
    has no stateful surface at all; this is the Spark-native extension
    point, SURVEY.md §2A "Grouped/streaming state").

    State per key is two scalars, updated from Arrow batches; the
    watermark bounds how late input may arrive. Emits one row per key
    per micro-batch that touched it (update mode): the latest row per
    key is the current running total.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (df.withWatermark(ts_col, watermark)
              .groupBy(key_col)
              .applyInPandasWithState(update, out_schema, state_schema,
                                      "update", GroupStateTimeout.NoTimeout))


def stream_dedup(df: DataFrame, keys: tuple[str, ...], ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Keyed streaming dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts
    key state once the watermark passes — the durable, bounded-memory
    version of the reference's JVM-static ``processedFiles`` sets
    (``FileSourceContext.java:20-21``)."""
    return (df.withWatermark(ts_col, watermark)
              .dropDuplicatesWithinWatermark(list(keys)))


def foreachbatch_upsert(stream: DataFrame, path: str, keys: list[str],
                        order_col: str, checkpoint: str,
                        trigger_available_now: bool = True):
    """Streaming upsert (merge-on-key) into a parquet target via
    ``foreachBatch`` — the keep-latest-row-per-key sink every CDC /
    state-snapshot pipeline needs. Each micro-batch is reduced to its
    newest row per key, unioned with the current target, and the
    winner per key (max `order_col`, key tiebreak on the key columns)
    is rewritten atomically (write to a side directory, then swap).

    ``foreachBatch`` gives at-least-once batch delivery with a batch
    id the checkpoint tracks, and the merge is idempotent (re-applying
    a batch picks the same winners), so the target converges to
    exactly-once semantics across restarts. On a real lakehouse this
    body becomes a Delta/Iceberg ``MERGE INTO`` and the rewrite cost
    drops to the touched files; plain-parquet full rewrite is the
    dependency-free equivalent with identical semantics (the
    reference's sinks are append-only — this is new surface).
    Partition discipline: the dedup is one shuffle on the key; the
    target rewrite parallelizes over the same partitioning.
    """
    import os
    import shutil

    from pyspark.sql import Window as W

    def merge(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        rank = F.row_number().over(
            W.partitionBy(*keys).orderBy(F.col(order_col).desc(), *keys))
        latest = (batch_df.withColumn("__rn", rank)
                          .filter(F.col("__rn") == 1).drop("__rn"))
        if os.path.isdir(path):
            current = spark.read.parquet(path)
            latest = current.unionByName(latest)
            latest = (latest.withColumn("__rn", rank)
                            .filter(F.col("__rn") == 1).drop("__rn"))
        staged = path.rstrip("/") + "__staged"
        latest.write.mode("overwrite").parquet(staged)
        old = path.rstrip("/") + "__old"
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(staged, path)
        shutil.rmtree(old, ignore_errors=True)

    writer = (stream.writeStream.foreachBatch(merge)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
