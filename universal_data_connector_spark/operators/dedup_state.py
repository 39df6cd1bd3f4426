"""Cross-run exact deduplication against a persistent seen-key store.

``operators/dedup.py::exact_dedup`` dedups WITHIN one frame; an
incremental ingestion pipeline (the daily corpus drop of a training-
data pipeline) also needs dedup against HISTORY: a document whose
content already shipped in any previous run must not ship again. This
module maintains that history as a key-bucketed store of content
hashes and exposes the operation as a filter + post-sink commit pair,
wired into the YAML surface as the ``dedup_state`` transformation.

Store layout (same hash-bucket scheme as the state sinks)::

    <stateDir>/_udc_seen_meta            bucket count, fixed for life
    <stateDir>/udc_kb=<K>/seen-*.parquet append-only key files

The store is APPEND-ONLY, which is what makes its crash contract
simple: the anti-join is idempotent under duplicate seen rows, so a
replayed commit that re-appends the same keys changes nothing about
which rows ship — there is no swap, no pointer, and nothing to CAS.
Appends are atomic per file (write-to-staging + ``os.rename`` on
POSIX).

Crash ordering (enforced by the engine, ``finalize_batch_sink``): the
commit runs strictly AFTER the sink succeeds and strictly BEFORE
``manifest_record``. Both orders matter:

* sink first — a failed sink leaves the store untouched, so the rerun
  ships the same survivors (no data loss);
* commit before manifest — if the commit lands and the manifest crash-
  misses, the rerun re-reads the same files and filters the survivors
  as seen, which is CORRECT (they already reached the sink); the
  reverse order would let a manifest-recorded/commit-crashed run leak
  keys that future batches then fail to dedup against (duplicates
  downstream, the one outcome the operator exists to prevent).

Scale posture: the key is ``sha2(to_json(struct(cols)), 256)``
(NULL-faithful, order-faithful; 2^-128 collision odds at corpus
scale), bucketed by ``pmod(xxhash64(key), N)``. A batch reads ONLY its
touched buckets' files (explicit paths — pruning by construction),
anti-joins on the hash, and appends one file per touched bucket.
Per-batch cost is O(touched state + batch), never O(store). Replayed
commits may append duplicate keys; ``compact_seen_store`` rewrites a
bucket to distinct keys as offline maintenance.
"""

from __future__ import annotations

import logging
import os
import shutil
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

_KB = "udc_kb"
_SEEN_META = "_udc_seen_meta"
_SEEN_STAGED_PREFIX = "_udc_seen_staged_"
_KEY = "udc_seen_key"


def _ensure_seen_meta(state_dir: str, num_buckets: int) -> int:
    """Create/validate the store marker; the bucket count persisted at
    creation wins for the store's life (same rule as the state sinks).
    Also sweeps staging leftovers from crashed commits — they are
    unreferenced by construction (live files arrive by rename)."""
    from universal_data_connector_spark.streaming.windows import (
        _reject_remote_target,
    )

    _reject_remote_target(state_dir)
    if os.path.isdir(state_dir):
        for name in os.listdir(state_dir):
            if name.startswith(_SEEN_STAGED_PREFIX):
                shutil.rmtree(os.path.join(state_dir, name),
                              ignore_errors=True)
            elif name.startswith("_udc_old_"):
                # compact_seen_store crashed between its two renames:
                # if the live dir vanished the old copy IS the store —
                # put it back; otherwise the swap completed and the
                # old copy is superseded (same repair as the state
                # sinks' _upsert_recover)
                b = name[len("_udc_old_"):]
                live = os.path.join(state_dir, f"{_KB}={b}")
                old = os.path.join(state_dir, name)
                if os.path.isdir(live):
                    shutil.rmtree(old, ignore_errors=True)
                else:
                    os.rename(old, live)
    meta = os.path.join(state_dir, _SEEN_META)
    if os.path.isfile(meta):
        with open(meta) as fh:
            return int(fh.read().strip())
    if os.path.isdir(state_dir) and any(
            not n.startswith("_") for n in os.listdir(state_dir)):
        raise ValueError(
            f"dedup_state store {state_dir!r} exists but is not a seen "
            "store (missing _udc_seen_meta)")
    os.makedirs(state_dir, exist_ok=True)
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(num_buckets))
    os.rename(tmp, meta)
    return num_buckets


def _batch_keyed(df: DataFrame, cols: list[str], n: int) -> DataFrame:
    """Key + bucket + deterministic within-batch dedup, shared by the
    POSIX and object-store seen stores."""
    key = F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256)
    keyed = df.withColumn(_KEY, key)
    # deterministic within-batch winner: lowest content hash over ALL
    # columns; MapType-carrying columns hash their to_json rendering
    # (xxhash64 cannot hash maps — the windows._latest_rank rule)
    from universal_data_connector_spark.streaming.windows import (
        _contains_map,
    )
    tiebreak = F.xxhash64(*[
        F.to_json(F.col(f.name)) if _contains_map(f.dataType)
        else F.col(f.name)
        for f in sorted(df.schema.fields, key=lambda f: f.name)])
    rn = F.row_number().over(
        Window.partitionBy(_KEY).orderBy(tiebreak.asc()))
    return (keyed.withColumn("__rn", rn)
                 .filter(F.col("__rn") == 1).drop("__rn")
                 .withColumn(_KB, F.pmod(F.xxhash64(F.col(_KEY)),
                                         F.lit(n)).cast("int")))


def _pin(keyed: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    from universal_data_connector_spark.operators.relational import (
        pin_frame,
    )
    return pin_frame(keyed.persist(StorageLevel.DISK_ONLY))


def seen_filter(df: DataFrame, state_dir: str, cols: list[str],
                num_buckets: int = 32, persist: bool = True):
    """(survivors, commit) for one batch against the seen store.

    ``survivors`` is ``df`` minus rows whose key is already in the
    store, also deduplicated WITHIN the batch (deterministic winner:
    lowest content hash over all columns, so replays pick the same
    rows). ``commit()`` appends the survivors' keys to the store —
    call it only after the survivors have durably reached their sink.

    The keyed survivor frame is persisted (DISK_ONLY) and pinned so
    the sink's consumption and the commit's key extraction share ONE
    materialization — without it the commit would re-run the source
    scan and anti-join a second time. Pass ``persist=False`` to opt
    out (e.g. a caller that commits nothing)."""
    n = _ensure_seen_meta(state_dir, num_buckets)
    keyed = _batch_keyed(df, cols, n)

    # touched-bucket set: bounded by num_buckets -> driver-safe
    touched = sorted(r[0] for r in keyed.select(_KB).distinct().collect())
    live = [b for b in touched
            if os.path.isdir(os.path.join(state_dir, f"{_KB}={b}"))]
    if live:
        spark = df.sparkSession
        seen = spark.read.parquet(
            *[os.path.join(state_dir, f"{_KB}={b}") for b in live]
        ).select(_KEY).distinct()
        keyed = keyed.join(seen, on=_KEY, how="left_anti")
    if persist:
        keyed = _pin(keyed)

    def commit() -> None:
        nonce = uuid.uuid4().hex[:8]
        staged = os.path.join(state_dir, f"{_SEEN_STAGED_PREFIX}{nonce}")
        new_keys = keyed.select(_KEY, _KB)
        (new_keys.repartition(max(len(touched), 1), F.col(_KB))
                 .write.mode("overwrite").partitionBy(_KB)
                 .parquet(staged))
        moved = 0
        for b in touched:
            part_dir = os.path.join(staged, f"{_KB}={b}")
            if not os.path.isdir(part_dir):
                continue
            live_dir = os.path.join(state_dir, f"{_KB}={b}")
            os.makedirs(live_dir, exist_ok=True)
            for i, name in enumerate(sorted(
                    f for f in os.listdir(part_dir)
                    if f.endswith(".parquet"))):
                os.rename(os.path.join(part_dir, name),
                          os.path.join(live_dir,
                                       f"seen-{nonce}-{i}.parquet"))
                moved += 1
        shutil.rmtree(staged, ignore_errors=True)
        log.info("dedup_state: appended %d file(s) across %d touched "
                 "bucket(s) in %s", moved, len(touched), state_dir)

    return keyed.drop(_KEY, _KB), commit


def seen_filter_s3(df: DataFrame, target, cols: list[str],
                   persist: bool = True):
    """Object-store twin of ``seen_filter`` on an
    ``object_state.S3StateTarget`` (which owns the bucket count; one
    store per prefix). The append-only design needs NO pointer and no
    CAS here: S3 PUTs are atomic (an object exists fully or not at
    all), torn reads are impossible, and a crash mid-commit leaves
    some buckets' keys appended — harmless, because the commit runs
    only after the sink succeeded, so re-filtering those keys as seen
    on the rerun is correct. Per-bucket listings are prefix-scoped
    (O(touched), never O(store)); data shuttles through a driver-local
    scratch via boto3 exactly like the state backend (same transport
    note: with S3A, read ``s3a://.../kb=K/`` directly)."""
    import tempfile

    n = target.num_buckets
    keyed = _batch_keyed(df, cols, n)
    touched = sorted(r[0] for r in keyed.select(_KB).distinct().collect())
    bucket_keys = {b: [k for k in target.list_keys(under=f"kb={b}")
                       if k.endswith(".parquet")] for b in touched}
    live = {b: ks for b, ks in bucket_keys.items() if ks}
    if live:
        spark = df.sparkSession
        scratch = tempfile.mkdtemp(prefix="udc_seen_s3_")
        try:
            for b, ks in live.items():
                bdir = os.path.join(scratch, f"{_KB}={b}")
                os.makedirs(bdir)
                for i, k in enumerate(ks):
                    target.download_to(
                        k, os.path.join(bdir, f"part-{i}.parquet"))
            seen = (spark.read.parquet(scratch).select(_KEY).distinct()
                    .localCheckpoint(eager=True))
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        keyed = keyed.join(seen, on=_KEY, how="left_anti")
    if persist:
        keyed = _pin(keyed)

    def commit() -> None:
        nonce = uuid.uuid4().hex[:8]
        staged = os.path.join(
            tempfile.mkdtemp(prefix="udc_seen_s3_c_"), "staged")
        (keyed.select(_KEY, _KB)
              .repartition(max(len(touched), 1), F.col(_KB))
              .write.mode("overwrite").partitionBy(_KB).parquet(staged))
        uploaded = 0
        try:
            for b in touched:
                part_dir = os.path.join(staged, f"{_KB}={b}")
                if not os.path.isdir(part_dir):
                    continue
                for i, name in enumerate(sorted(
                        f for f in os.listdir(part_dir)
                        if f.endswith(".parquet"))):
                    target.upload_file(
                        os.path.join(part_dir, name),
                        target._key(f"kb={b}",
                                    f"seen-{nonce}-{i}.parquet"))
                    uploaded += 1
        finally:
            shutil.rmtree(os.path.dirname(staged), ignore_errors=True)
        log.info("dedup_state[s3]: appended %d object(s) across %d "
                 "touched bucket(s) under %s/%s", uploaded,
                 len(touched), target.bucket, target.prefix)

    return keyed.drop(_KEY, _KB), commit


def compact_seen_store(spark, state_dir: str) -> None:
    """Offline maintenance: rewrite each bucket to distinct keys in one
    file (replayed commits may have appended duplicates — harmless for
    correctness, costly for the anti-join's scan over time). Uses the
    state sinks' staged-rename swap per bucket; do not run concurrently
    with a pipeline writing the same store."""
    n = _ensure_seen_meta(state_dir, 32)
    for b in range(n):
        live_dir = os.path.join(state_dir, f"{_KB}={b}")
        if not os.path.isdir(live_dir):
            continue
        nonce = uuid.uuid4().hex[:8]
        staged = os.path.join(state_dir, f"{_SEEN_STAGED_PREFIX}{nonce}")
        (spark.read.parquet(live_dir).select(_KEY).distinct()
         .coalesce(1).write.mode("overwrite").parquet(staged))
        old = os.path.join(state_dir, f"_udc_old_{b}")
        os.rename(live_dir, old)
        os.rename(staged, live_dir)
        shutil.rmtree(old, ignore_errors=True)
        # drop the writer metadata so only key files remain
        for name in os.listdir(live_dir):
            if not name.endswith(".parquet"):
                os.remove(os.path.join(live_dir, name))
