"""Keyed-state sinks for the YAML pipeline surface.

Engine extensions beyond the reference's sink set (SURVEY.md §2A K1-K5
are append-only): both maintain a key-bucketed parquet target with
crash-safe per-bucket swaps (``streaming/windows.py``), exposed as
declarative sink types so a pipeline config can keep CDC latest-state
or additive per-key aggregates without writing code.

``upsert`` props: path, keys (comma-separated), orderColumn,
checkpointLocation (streaming only), numBuckets (optional).
``agg_state`` props: path, keys, valueColumn, checkpointLocation
(streaming only), numBuckets (optional).

Batch mode calls the audited merge bodies DIRECTLY on the input frame
(no scratch-parquet + readStream round-trip — VERDICT r7 item 2's
write amplification is gone):

* ``upsert``: the keep-latest merge is idempotent, so a plain call
  converges on re-run; no batch id or checkpoint is involved.
* ``agg_state``: the additive merge is NOT idempotent, and a fresh
  per-run streaming checkpoint would replay every run as batch 0 —
  silently dropping increments for previously-touched buckets. Batch
  runs instead claim a MONOTONIC run id (1 + highest applied marker,
  persisted in an intent file for crash-resume) via
  ``begin_batch_run`` so each run applies exactly once; see its
  docstring for the crash-replay contract and the do-not-mix-with-a-
  live-stream caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def s3_state_target(props: dict):
    """Build the object-store state target from S3-sink-style props
    (``bucketName``/``prefix``/``endpoint``/``accessKey``/``secretKey``
    — the same shape the S3 source and sink consume). Presence of
    ``bucketName`` is what routes an upsert/agg_state sink onto the
    CAS-committed object-store backend instead of the POSIX one."""
    from universal_data_connector_spark.streaming.object_state import (
        S3StateTarget,
    )

    kw = {}
    if props.get("accessKey"):
        kw["aws_access_key_id"] = props["accessKey"]
    if props.get("secretKey"):
        kw["aws_secret_access_key"] = props["secretKey"]
    if props.get("endpoint"):
        kw["endpoint_url"] = props["endpoint"]
    if props.get("region"):
        kw["region_name"] = props["region"]
    return S3StateTarget(props["bucketName"],
                         props.get("prefix") or "",
                         num_buckets=int(props.get("numBuckets", 32)),
                         **kw)


def _keys(props: dict) -> list[str]:
    raw = props.get("keys", "")
    keys = [k.strip() for k in str(raw).split(",") if k.strip()]
    if not keys:
        raise ValueError("upsert/agg_state sink requires 'keys'")
    return keys


def upsert_sink(df: DataFrame, props: dict, streaming: bool = False):
    from universal_data_connector_spark.streaming.windows import (
        foreachbatch_upsert,
        upsert_merge,
    )

    keys = _keys(props)
    order_col = props.get("orderColumn")
    if not order_col:
        raise ValueError("upsert sink requires 'orderColumn'")
    n = int(props.get("numBuckets", 32))
    if props.get("bucketName"):
        from universal_data_connector_spark.streaming.object_state import (
            foreachbatch_upsert_s3,
            upsert_merge_s3,
        )

        target = s3_state_target(props)
        if streaming:
            return foreachbatch_upsert_s3(
                df, target, keys=keys, order_col=order_col,
                checkpoint=props["checkpointLocation"])
        upsert_merge_s3(df, 0, target=target, keys=keys,
                        order_col=order_col)
        return None
    if streaming:
        return foreachbatch_upsert(
            df, props["path"], keys=keys, order_col=order_col,
            checkpoint=props["checkpointLocation"], num_buckets=n)
    # batch: one direct, idempotent merge (re-runs pick the same
    # winners — deterministic content tiebreak in _latest_rank)
    upsert_merge(df, 0, path=props["path"], keys=keys,
                 order_col=order_col, num_buckets=n)
    return None


def agg_state_sink(df: DataFrame, props: dict, streaming: bool = False):
    from universal_data_connector_spark.streaming.windows import (
        agg_state_merge,
        begin_batch_run,
        end_batch_run,
        foreachbatch_agg_state,
    )

    keys = _keys(props)
    value_col = props.get("valueColumn")
    if not value_col:
        raise ValueError("agg_state sink requires 'valueColumn'")
    n = int(props.get("numBuckets", 32))
    if props.get("bucketName"):
        from universal_data_connector_spark.streaming.object_state import (
            agg_state_merge_s3,
            begin_batch_run_s3,
            end_batch_run_s3,
            foreachbatch_agg_state_s3,
        )

        target = s3_state_target(props)
        if streaming:
            return foreachbatch_agg_state_s3(
                df, target, keys=keys, value_col=value_col,
                checkpoint=props["checkpointLocation"])
        run_id = begin_batch_run_s3(
            target, fingerprint=props.get("_inputFingerprint"))
        agg_state_merge_s3(df, run_id, target=target, keys=keys,
                           value_col=value_col)
        if not props.get("_deferFinalize"):
            end_batch_run_s3(target)
        return None
    if streaming:
        return foreachbatch_agg_state(
            df, props["path"], keys=keys, value_col=value_col,
            checkpoint=props["checkpointLocation"], num_buckets=n)
    # batch: monotonic run id so every run's increments apply exactly
    # once (and a crashed run resumes, not double-applies). The engine
    # passes an input fingerprint so a resume onto DIFFERENT input
    # (manifest advanced, intent not yet cleared) reclaims fresh
    # instead of skipping the new files' increments (ADVICE r8).
    run_id = begin_batch_run(props["path"], num_buckets=n,
                             fingerprint=props.get("_inputFingerprint"))
    agg_state_merge(df, run_id, path=props["path"], keys=keys,
                    value_col=value_col, num_buckets=n)
    # The engine's pipeline runner sets _deferFinalize and clears the
    # intent itself AFTER its consumed-file bookkeeping (archiveDir /
    # manifestDir): clearing here would let a crash between the merge
    # and the bookkeeping rerun the SAME unrecorded files under a
    # fresh run id — double-applying every increment. Direct callers
    # (no bookkeeping to wait for) finalize immediately.
    if not props.get("_deferFinalize"):
        end_batch_run(props["path"])
    return None
