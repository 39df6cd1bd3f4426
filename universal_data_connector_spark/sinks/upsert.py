"""Keyed-state sinks for the YAML pipeline surface.

Engine extensions beyond the reference's sink set (SURVEY.md §2A K1-K5
are append-only): both maintain a key-bucketed parquet target with
crash-safe per-bucket swaps (``streaming/windows.py``), exposed as
declarative sink types so a pipeline config can keep CDC latest-state
or additive per-key aggregates without writing code.

``upsert`` props: path, keys (comma-separated), orderColumn,
checkpointLocation (streaming), numBuckets (optional).
``agg_state`` props: path, keys, valueColumn, checkpointLocation,
numBuckets (optional).

Batch mode wraps the frame in a single AvailableNow micro-batch
through the same merge body, so batch and streaming runs of one config
converge identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _keys(props: dict) -> list[str]:
    raw = props.get("keys", "")
    keys = [k.strip() for k in str(raw).split(",") if k.strip()]
    if not keys:
        raise ValueError("upsert/agg_state sink requires 'keys'")
    return keys


def upsert_sink(df: DataFrame, props: dict, streaming: bool = False):
    from universal_data_connector_spark.streaming.windows import (
        foreachbatch_upsert,
    )

    keys = _keys(props)
    order_col = props.get("orderColumn")
    if not order_col:
        raise ValueError("upsert sink requires 'orderColumn'")
    n = int(props.get("numBuckets", 32))
    if streaming:
        return foreachbatch_upsert(
            df, props["path"], keys=keys, order_col=order_col,
            checkpoint=props["checkpointLocation"], num_buckets=n)
    # batch: one idempotent merge through the same body
    import tempfile

    q = foreachbatch_upsert(
        _as_one_shot_stream(df), props["path"], keys=keys,
        order_col=order_col,
        checkpoint=props.get("checkpointLocation",
                             tempfile.mkdtemp(prefix="udc_upsert_ck_")),
        num_buckets=n)
    q.awaitTermination()
    return None


def agg_state_sink(df: DataFrame, props: dict, streaming: bool = False):
    from universal_data_connector_spark.streaming.windows import (
        foreachbatch_agg_state,
    )

    keys = _keys(props)
    value_col = props.get("valueColumn")
    if not value_col:
        raise ValueError("agg_state sink requires 'valueColumn'")
    n = int(props.get("numBuckets", 32))
    if streaming:
        return foreachbatch_agg_state(
            df, props["path"], keys=keys, value_col=value_col,
            checkpoint=props["checkpointLocation"], num_buckets=n)
    import tempfile

    q = foreachbatch_agg_state(
        _as_one_shot_stream(df), props["path"], keys=keys,
        value_col=value_col,
        checkpoint=props.get("checkpointLocation",
                             tempfile.mkdtemp(prefix="udc_aggstate_ck_")),
        num_buckets=n)
    q.awaitTermination()
    return None


def _as_one_shot_stream(df: DataFrame) -> DataFrame:
    """Replay a batch frame as a single-batch stream: write it to
    scratch parquet, read it back with readStream + AvailableNow —
    the merge body then runs exactly once with full recovery
    semantics. The scratch copy is the price of routing batch mode
    through the one audited merge implementation; state targets are
    keyed aggregates/snapshots, far smaller than raw fact tables."""
    import atexit
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="udc_oneshot_")
    atexit.register(shutil.rmtree, scratch, True)
    df.write.mode("overwrite").parquet(scratch)
    return df.sparkSession.readStream.schema(df.schema).parquet(scratch)
