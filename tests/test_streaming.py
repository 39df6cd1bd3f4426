"""Structured Streaming tests: real readStream/writeStream with
watermarks, triggers, state, and file-source exactly-once semantics.

Replaces the reference's untestable streaming behaviors (JVM-static
dedup sets, park-forever one-shots — SURVEY.md §1.4) with observable,
checkpointed equivalents.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from universal_data_connector_spark.sources.files import file_source
from universal_data_connector_spark.streaming import (
    session_agg,
    stream_dedup,
    tumbling_agg,
)

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _write_events(path: str, rows: list[tuple]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for event_id, user_id, ts, value in rows:
            f.write(json.dumps({"event_id": event_id, "user_id": user_id,
                                "ts": ts, "value": value}) + "\n")


@pytest.fixture
def stream_env(spark, tmp_path):
    """A JSON-file event stream the tests can append to, plus a memory
    sink reader."""
    src = tmp_path / "in"
    src.mkdir()

    def start(df_builder, name, output_mode="append"):
        raw = (spark.readStream.schema(EVENTS_SCHEMA)
               .option("maxFilesPerTrigger", "1")
               .json(str(src)))
        q = (df_builder(raw).writeStream.format("memory").queryName(name)
             .outputMode(output_mode)
             .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
             .start())
        return q

    return str(src), start


def test_tumbling_window_and_late_data_drop(spark, stream_env):
    """Rows later than watermark + window close are dropped from the
    result; on-time rows aggregate per hour."""
    src, start = stream_env
    _write_events(f"{src}/b1.json", [
        (1, 1, "2026-01-01 10:05:00", 1.0),
        (2, 1, "2026-01-01 10:55:00", 2.0),
        (3, 1, "2026-01-01 13:00:00", 4.0),   # advances watermark to 12:50
    ])
    q = start(lambda df: tumbling_agg(df, "ts", "1 hour", watermark="10 minutes",
                                      aggs={"n": F.count("*"),
                                            "sv": F.sum("value")}),
              "tumbling", output_mode="append")
    q.processAllAvailable()
    # late row: 10:30 is far behind the 12:50 watermark -> dropped
    _write_events(f"{src}/b2.json", [(4, 1, "2026-01-01 10:30:00", 8.0)])
    # advance watermark past 14:00 so the 13:00 window finalizes too
    _write_events(f"{src}/b3.json", [(5, 1, "2026-01-01 15:00:00", 0.5)])
    q.processAllAvailable()
    q.stop()
    out = {r.window_start.hour: (r.n, r.sv)
           for r in spark.sql("SELECT * FROM tumbling").collect()}
    assert out[10] == (2, 3.0)   # late event 4 NOT counted
    assert out[13] == (1, 4.0)


def test_session_window_merges_and_splits(spark, stream_env):
    src, start = stream_env
    _write_events(f"{src}/b1.json", [
        (1, 7, "2026-01-01 09:00:00", 1.0),
        (2, 7, "2026-01-01 09:04:00", 1.0),   # same session (gap < 10m)
        (3, 7, "2026-01-01 10:00:00", 1.0),   # new session
        (4, 8, "2026-01-01 09:00:00", 1.0),
        (5, 7, "2026-01-01 23:00:00", 1.0),   # watermark push
    ])
    q = start(lambda df: session_agg(df, "ts", "10 minutes", ("user_id",),
                                     watermark="5 minutes"),
              "sessions", output_mode="append")
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sessions ORDER BY user_id, session_start").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert [r.n_events for r in by_user[7][:2]] == [2, 1]
    assert by_user[7][0].session_end.minute == 14  # last event 09:04 + 10m gap
    assert by_user[8][0].n_events == 1


def test_stream_dedup_within_watermark(spark, stream_env):
    src, start = stream_env
    _write_events(f"{src}/b1.json", [
        (1, 1, "2026-01-01 10:00:00", 1.0),
        (1, 1, "2026-01-01 10:00:30", 1.0),   # dup event_id within watermark
        (2, 1, "2026-01-01 10:01:00", 2.0),
    ])
    q = start(lambda df: stream_dedup(df, ("event_id",), "ts", "1 hour"),
              "dedup", output_mode="append")
    q.processAllAvailable()
    _write_events(f"{src}/b2.json", [(1, 1, "2026-01-01 10:02:00", 1.0)])  # dup again
    q.processAllAvailable()
    q.stop()
    ids = [r.event_id for r in spark.sql("SELECT event_id FROM dedup").collect()]
    assert sorted(ids) == [1, 2]


def test_file_source_streaming_exactly_once_with_archive(spark, tmp_path):
    """Reference S1 dedup + move-to-processed
    (FileSourceContext.java:113-125) as checkpointed streaming with
    cleanSource=archive: each file processed once, then physically
    moved to the archive dir."""
    src = tmp_path / "watch"
    archive = tmp_path / "processed"
    src.mkdir()
    (src / "a.txt").write_text("alpha file\n")

    df = file_source(spark, {"path": str(src), "pattern": "*.txt",
                             "archiveDir": str(archive)}, streaming=True)
    q = (df.writeStream.format("memory").queryName("file_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    (src / "b.txt").write_text("beta file\n")
    q.processAllAvailable()
    rows = spark.sql("SELECT source_file, content FROM file_stream").collect()
    assert len(rows) == 2
    assert {os.path.basename(r.source_file) for r in rows} == {"a.txt", "b.txt"}

    # archive happens with a maintenance delay; poll briefly
    q.processAllAvailable()
    deadline = time.time() + 60
    archived = []
    while time.time() < deadline:
        archived = [p for p in archive.rglob("*.txt")] if archive.exists() else []
        if len(archived) >= 1:
            break
        (src / f"tick_{int(time.time()*1000)}.txt").write_text("tick\n")
        q.processAllAvailable()
        time.sleep(1)
    q.stop()
    assert archived, "cleanSource=archive moved no files"
    assert not (src / "a.txt").exists() or not (src / "b.txt").exists()


def test_streaming_pipeline_via_engine(spark, tmp_path):
    """YAML pipeline in streaming mode through the engine: file source
    (streaming: true) -> filter -> file sink via foreachBatch."""
    from universal_data_connector_spark.config import parse_config
    from universal_data_connector_spark.manager import PipelineManager

    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()
    (inp / "x.txt").write_text("very important\n")
    (inp / "y.txt").write_text("not so much\n")
    cfg = parse_config({"pipelines": [{
        "name": "stream-filter",
        "source": {"type": "file",
                   "properties": {"path": str(inp), "pattern": "*.txt",
                                  "streaming": "true"}},
        "transformations": [{"type": "filter",
                             "properties": {"condition": "important"}}],
        "sink": {"type": "file",
                 "properties": {"path": str(out), "extension": ".txt",
                                "checkpointLocation": str(tmp_path / "ck")}},
    }]}).pipelines[0]

    mgr = PipelineManager(spark)
    job = mgr.start_pipeline(cfg)
    assert mgr.is_running(job)
    for q in spark.streams.active:
        q.processAllAvailable()
    mgr.stop(job)
    assert os.listdir(out) == ["x.txt"]
    assert mgr.jobs()[0]["name"] == job


def test_stateful_running_totals_across_batches(spark, stream_env):
    """applyInPandasWithState keeps per-key state across micro-batches:
    the latest emitted row per key carries totals accumulated over ALL
    batches, not just the current one."""
    from universal_data_connector_spark.streaming import stateful_running_totals

    src, start = stream_env
    _write_events(os.path.join(src, "b1.json"), [
        (1, 1, "2024-01-01T10:00:00", 1.0),
        (2, 1, "2024-01-01T10:01:00", 2.0),
        (3, 2, "2024-01-01T10:02:00", 5.0),
    ])
    q = start(lambda raw: stateful_running_totals(raw), "running_totals",
              output_mode="update")
    q.processAllAvailable()
    _write_events(os.path.join(src, "b2.json"), [
        (4, 1, "2024-01-01T10:05:00", 3.0),
    ])
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM running_totals").collect()
    latest = {}
    for r in rows:  # update mode emits once per touched key per batch
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    assert latest[1].n_events == 3 and latest[1].total_value == 6.0
    assert latest[2].n_events == 1 and latest[2].total_value == 5.0


def test_stream_stream_interval_join_multi_batch(spark, tmp_path):
    """Real stream-stream inner join with watermarks across
    micro-batches: in-window pairs emit; once both watermarks advance,
    buffered state is evicted and a late out-of-window arrival joins
    nothing (the bounded-state property that lets the join run forever
    on an unbounded stream — catalog.stream_stream_interval_join checks
    the single-batch semantics against its SQL oracle)."""
    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purch"
    clicks_dir.mkdir()
    purch_dir.mkdir()

    def stream(d, prefix):
        raw = (spark.readStream.schema(EVENTS_SCHEMA)
               .option("maxFilesPerTrigger", "1").json(str(d)))
        return (raw.select(F.col("event_id").alias(f"{prefix}_id"),
                           F.col("user_id").alias(f"{prefix}_user"),
                           F.col("ts").alias(f"{prefix}_ts"))
                   .withWatermark(f"{prefix}_ts", "10 minutes"))

    joined = stream(clicks_dir, "click").join(
        stream(purch_dir, "purchase"),
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner")
    q = (joined.writeStream.format("memory").queryName("ss_join")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())

    _write_events(f"{clicks_dir}/b1.json", [(100, 1, "2026-01-01 10:00:00", 0.0)])
    _write_events(f"{purch_dir}/b1.json", [
        (200, 1, "2026-01-01 10:10:00", 5.0),   # in window  -> pair
        (201, 1, "2026-01-01 10:50:00", 6.0),   # > 30 min   -> no pair
    ])
    q.processAllAvailable()
    # advance BOTH watermarks far past 10:30 so click 100's buffered
    # state is evicted (min-of-sides watermark policy)
    _write_events(f"{clicks_dir}/b2.json", [(101, 2, "2026-01-01 23:00:00", 0.0)])
    _write_events(f"{purch_dir}/b2.json", [(202, 2, "2026-01-01 23:05:00", 7.0)])
    q.processAllAvailable()
    # late purchase behind the watermark: would match click 100 in
    # batch semantics, but the state is gone and the row is late
    _write_events(f"{purch_dir}/b3.json", [(203, 1, "2026-01-01 10:20:00", 8.0)])
    q.processAllAvailable()
    q.stop()

    pairs = {(r.click_id, r.purchase_id)
             for r in spark.sql("SELECT * FROM ss_join").collect()}
    assert pairs == {(100, 200), (101, 202)}


def test_foreachbatch_upsert_converges_across_batches(spark, tmp_path):
    """foreachbatch_upsert keeps the newest row per key across
    micro-batches (maxFilesPerTrigger=1 -> one batch per file), and
    re-running the stream over the same input (fresh checkpoint, same
    target) is idempotent — the merge picks the same winners."""
    from universal_data_connector_spark.streaming import foreachbatch_upsert

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "target")
    _write_events(f"{src}/b1.json", [
        (1, 7, "2026-01-01 10:00:00", 1.0),
        (2, 8, "2026-01-01 10:01:00", 2.0),
    ])
    _write_events(f"{src}/b2.json", [
        (3, 7, "2026-01-01 11:00:00", 3.0),   # newer -> replaces event 1
        (4, 9, "2026-01-01 09:00:00", 4.0),
    ])

    def run(ckpt):
        raw = (spark.readStream.schema(EVENTS_SCHEMA)
               .option("maxFilesPerTrigger", "1").json(str(src)))
        raw = raw.withColumn("__ord", F.struct(F.col("ts"),
                                               F.col("event_id")))
        q = foreachbatch_upsert(raw, target, keys=["user_id"],
                                order_col="__ord",
                                checkpoint=str(tmp_path / ckpt))
        q.awaitTermination()

    run("ckpt1")
    rows = {r.user_id: r.event_id
            for r in spark.read.parquet(target).collect()}
    assert rows == {7: 3, 8: 2, 9: 4}

    run("ckpt2")  # replay everything into the existing target
    rows = {r.user_id: r.event_id
            for r in spark.read.parquet(target).collect()}
    assert rows == {7: 3, 8: 2, 9: 4}


def _upsert_run(spark, src, target, ckpt, num_buckets=4):
    from universal_data_connector_spark.streaming import foreachbatch_upsert

    raw = (spark.readStream.schema(EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", "1").json(str(src)))
    raw = raw.withColumn("__ord", F.struct(F.col("ts"), F.col("event_id")))
    q = foreachbatch_upsert(raw, target, keys=["user_id"],
                            order_col="__ord", checkpoint=str(ckpt),
                            num_buckets=num_buckets)
    q.awaitTermination()


def test_foreachbatch_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """A batch whose keys land in one bucket must leave every other
    bucket directory byte-identical and un-replaced (VERDICT r6 item 2:
    per-batch cost O(touched), not O(target))."""
    import glob

    from universal_data_connector_spark.streaming.windows import (
        _UPSERT_BUCKET_COL,
    )

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "target")
    # seed: users 1..8 spread over 4 buckets
    _write_events(f"{src}/b1.json", [
        (i, i, "2026-01-01 10:00:00", float(i)) for i in range(1, 9)])
    _upsert_run(spark, src, target, tmp_path / "ckpt1")

    bucket_dirs = sorted(glob.glob(f"{target}/{_UPSERT_BUCKET_COL}=*"))
    assert len(bucket_dirs) >= 2, "seed should populate several buckets"

    def snapshot(d):
        return {f: (os.stat(f).st_mtime_ns, open(f, "rb").read())
                for f in glob.glob(f"{d}/*.parquet")}

    before = {d: snapshot(d) for d in bucket_dirs}

    # second run, SAME checkpoint (so only the new file is consumed):
    # ONLY user 1 updated -> exactly one bucket touched
    _write_events(f"{src}/b2.json", [(99, 1, "2026-01-01 12:00:00", 9.0)])
    _upsert_run(spark, src, target, tmp_path / "ckpt1")

    after = {d: snapshot(d) for d in sorted(
        glob.glob(f"{target}/{_UPSERT_BUCKET_COL}=*"))}
    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) <= 1, (
        f"one-key batch must touch at most its own bucket, got {changed}")
    # untouched buckets: identical file list, mtimes and bytes
    for d in before:
        if d not in changed:
            assert before[d] == after[d]
    # and the merge itself is correct
    rows = {r.user_id: r.event_id
            for r in spark.read.parquet(target).collect()}
    assert rows == {1: 99, **{i: i for i in range(2, 9)}}


def test_foreachbatch_upsert_crash_recovery_restores_old_bucket(
        spark, tmp_path):
    """Crash between 'live -> old' and 'staged -> live' leaves no live
    bucket dir; recovery must restore the old copy so previously merged
    keys survive (ADVICE r6, streaming/windows.py:151)."""
    import glob

    from universal_data_connector_spark.streaming.windows import (
        _UPSERT_BUCKET_COL,
        _UPSERT_OLD_PREFIX,
        _UPSERT_STAGED_DIR,
        _upsert_recover,
    )

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "target")
    _write_events(f"{src}/b1.json", [
        (i, i, "2026-01-01 10:00:00", float(i)) for i in range(1, 9)])
    _upsert_run(spark, src, target, tmp_path / "ckpt1")
    want = {r.user_id: r.event_id
            for r in spark.read.parquet(target).collect()}

    # simulate the torn swap on one bucket: live renamed away, staged
    # half-written
    victim = sorted(glob.glob(f"{target}/{_UPSERT_BUCKET_COL}=*"))[0]
    bucket = victim.rsplit("=", 1)[1]
    os.rename(victim, f"{target}/{_UPSERT_OLD_PREFIX}{bucket}")
    os.makedirs(f"{target}/{_UPSERT_STAGED_DIR}/partial", exist_ok=True)

    _upsert_recover(target)
    assert os.path.isdir(victim), "old copy must be restored"
    assert not os.path.isdir(f"{target}/{_UPSERT_STAGED_DIR}")
    got = {r.user_id: r.event_id
           for r in spark.read.parquet(target).collect()}
    assert got == want

    # completed-swap leftover (live present AND old present): old must
    # be dropped, live kept
    os.makedirs(f"{target}/{_UPSERT_OLD_PREFIX}{bucket}", exist_ok=True)
    _upsert_recover(target)
    assert os.path.isdir(victim)
    assert not os.path.isdir(f"{target}/{_UPSERT_OLD_PREFIX}{bucket}")

    # end-to-end: a crashed state heals on the NEXT merge, not just via
    # the helper — replaying a fresh checkpoint over the torn target
    # converges to the same winners
    os.rename(victim, f"{target}/{_UPSERT_OLD_PREFIX}{bucket}")
    _upsert_run(spark, src, target, tmp_path / "ckpt2")
    got = {r.user_id: r.event_id
           for r in spark.read.parquet(target).collect()}
    assert got == want


def test_foreachbatch_upsert_rejects_foreign_directory(spark, tmp_path):
    """A pre-existing non-bucketed directory must be rejected, not
    silently merged into (the old flat layout is not readable as a
    bucketed target)."""
    src = tmp_path / "in"
    src.mkdir()
    target = tmp_path / "target"
    target.mkdir()
    (target / "part-00000.parquet").write_bytes(b"not a bucket layout")
    _write_events(f"{src}/b1.json", [(1, 1, "2026-01-01 10:00:00", 1.0)])
    from py4j.protocol import Py4JJavaError
    with pytest.raises((ValueError, Exception), match="bucketed|_udc_buckets"):
        _upsert_run(spark, src, target, tmp_path / "ckpt1")


def _agg_state_run(spark, src, target, ckpt, num_buckets=4):
    from universal_data_connector_spark.streaming import (
        foreachbatch_agg_state,
    )

    raw = (spark.readStream.schema(EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", "1").json(str(src)))
    q = foreachbatch_agg_state(raw, target, keys=["user_id"],
                               value_col="value", checkpoint=str(ckpt),
                               num_buckets=num_buckets)
    q.awaitTermination()


def test_foreachbatch_agg_state_accumulates(spark, tmp_path):
    """Additive state accumulates across micro-batches and new files
    on the SAME checkpoint add increments exactly once."""
    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "state")
    _write_events(f"{src}/b1.json", [
        (1, 7, "2026-01-01 10:00:00", 1.0),
        (2, 7, "2026-01-01 10:01:00", 2.0),
        (3, 8, "2026-01-01 10:02:00", 5.0),
    ])
    _agg_state_run(spark, src, target, tmp_path / "ckpt")
    state = {r.user_id: (r.n, float(r.total))
             for r in spark.read.parquet(target).collect()}
    assert state == {7: (2, 3.0), 8: (1, 5.0)}

    _write_events(f"{src}/b2.json", [(4, 7, "2026-01-01 11:00:00", 10.0)])
    _agg_state_run(spark, src, target, tmp_path / "ckpt")
    state = {r.user_id: (r.n, float(r.total))
             for r in spark.read.parquet(target).collect()}
    assert state == {7: (3, 13.0), 8: (1, 5.0)}


def test_foreachbatch_agg_state_replay_applies_once(spark, tmp_path):
    """The non-idempotent additive merge must NOT double-count when a
    batch replays: buckets whose applied marker >= the batch id skip.
    Simulated by re-running the same input with a FRESH checkpoint
    (every batch replays) — all buckets carry markers from the first
    run, so state is unchanged."""
    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "state")
    _write_events(f"{src}/b1.json", [
        (1, 7, "2026-01-01 10:00:00", 1.0),
        (2, 8, "2026-01-01 10:01:00", 2.0),
    ])
    _write_events(f"{src}/b2.json", [(3, 7, "2026-01-01 11:00:00", 4.0)])
    _agg_state_run(spark, src, target, tmp_path / "ckpt1")
    want = {r.user_id: (r.n, float(r.total))
            for r in spark.read.parquet(target).collect()}
    assert want == {7: (2, 5.0), 8: (1, 2.0)}

    _agg_state_run(spark, src, target, tmp_path / "ckpt2")  # full replay
    got = {r.user_id: (r.n, float(r.total))
           for r in spark.read.parquet(target).collect()}
    assert got == want


def test_foreachbatch_agg_state_crash_recovery(spark, tmp_path):
    """A torn swap (live renamed away, staged half-written) heals on
    the next run and previously accumulated state survives."""
    import glob

    from universal_data_connector_spark.streaming.windows import (
        _UPSERT_BUCKET_COL,
        _UPSERT_OLD_PREFIX,
    )

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "state")
    _write_events(f"{src}/b1.json", [
        (i, i, "2026-01-01 10:00:00", float(i)) for i in range(1, 9)])
    _agg_state_run(spark, src, target, tmp_path / "ckpt1")
    want = {r.user_id: (r.n, float(r.total))
            for r in spark.read.parquet(target).collect()}

    victim = sorted(glob.glob(f"{target}/{_UPSERT_BUCKET_COL}=*"))[0]
    bucket = victim.rsplit("=", 1)[1]
    os.rename(victim, f"{target}/{_UPSERT_OLD_PREFIX}{bucket}")

    _write_events(f"{src}/b2.json", [(99, 1, "2026-01-01 11:00:00", 10.0)])
    _agg_state_run(spark, src, target, tmp_path / "ckpt1")
    got = {r.user_id: (r.n, float(r.total))
           for r in spark.read.parquet(target).collect()}
    want[1] = (want[1][0] + 1, want[1][1] + 10.0)
    assert got == want
