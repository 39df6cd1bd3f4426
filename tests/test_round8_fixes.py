"""Round-8 regression tests (VERDICT r7 items 2-4 + ADVICE r7 items).

1. Batch agg_state runs with NEW data each run must ACCUMULATE — the
   old fresh-tempdir streaming wrapper replayed every run as batch 0,
   so markers >= 0 silently dropped later runs' increments (ADVICE r7
   high, sinks/upsert.py).
2. A crashed batch agg_state run resumes its claimed run id from the
   intent file: already-swapped buckets skip, unswapped apply.
3. Upsert merge winners are deterministic on order_col ties (content
   tiebreak), across re-runs and crash replays (VERDICT r7 item 1).
4. Batch mode calls the merge bodies directly — no udc_oneshot_
   scratch copy of the input (VERDICT r7 item 2).
5. URI-scheme state targets are rejected up front instead of
   os.makedirs-ing a literal local "s3a:" dir (VERDICT r7 item 4).
6. The state sinks' current-state read partition-prunes on udc_kb —
   untouched buckets never opened (VERDICT r7 item 8a).
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, value double")


def _state(spark, target):
    return {r.user_id: (r.n, float(r.total))
            for r in spark.read.parquet(target).collect()}


def test_batch_agg_state_second_run_accumulates(spark, tmp_path):
    """Two batch runs of the agg_state sink with DIFFERENT data must
    both apply (ADVICE r7 high: the second run's increments were
    silently dropped for previously-touched buckets)."""
    from universal_data_connector_spark.sinks.upsert import agg_state_sink

    target = str(tmp_path / "state")
    props = {"path": target, "keys": "user_id", "valueColumn": "value",
             "numBuckets": 4}
    agg_state_sink(_mk(spark, [(1, 7, 1.0), (2, 7, 2.0), (3, 8, 5.0)]),
                   props)
    assert _state(spark, target) == {7: (2, 3.0), 8: (1, 5.0)}

    # second run, new data, SAME previously-touched key 7
    agg_state_sink(_mk(spark, [(4, 7, 10.0), (5, 9, 1.0)]), props)
    assert _state(spark, target) == {7: (3, 13.0), 8: (1, 5.0),
                                     9: (1, 1.0)}

    # third run exercises monotonic ids past 1
    agg_state_sink(_mk(spark, [(6, 8, 1.0)]), props)
    assert _state(spark, target) == {7: (3, 13.0), 8: (2, 6.0),
                                     9: (1, 1.0)}


def test_batch_agg_state_crash_resume_applies_exactly_once(spark, tmp_path):
    """A rerun after a mid-swap crash resumes the intent's run id:
    buckets that already swapped (marker == id) skip, the rest apply —
    never a double-count, never a drop."""
    from universal_data_connector_spark.sinks.upsert import agg_state_sink
    from universal_data_connector_spark.streaming.windows import (
        _BATCH_INTENT,
        agg_state_merge,
        begin_batch_run,
    )

    target = str(tmp_path / "state")
    props = {"path": target, "keys": "user_id", "valueColumn": "value",
             "numBuckets": 4}
    # users 1..8 spread across the 4 buckets
    agg_state_sink(
        _mk(spark, [(i, i, float(i)) for i in range(1, 9)]), props)
    want = _state(spark, target)

    # simulate a crashed second run: merge ran (all buckets swapped,
    # markers advanced) but end_batch_run never cleared the intent
    batch2 = _mk(spark, [(100 + i, i, 10.0) for i in range(1, 9)])
    run_id = begin_batch_run(target, num_buckets=4)
    agg_state_merge(batch2, run_id, path=target, keys=["user_id"],
                    value_col="value", num_buckets=4)
    assert os.path.isfile(os.path.join(target, _BATCH_INTENT))
    want = {u: (n + 1, t + 10.0) for u, (n, t) in want.items()}
    assert _state(spark, target) == want

    # the rerun (same input batch, per the replay contract) resumes the
    # same id -> every bucket's marker >= id -> no bucket re-applies
    agg_state_sink(batch2, props)
    assert _state(spark, target) == want
    assert not os.path.isfile(os.path.join(target, _BATCH_INTENT))

    # and a FRESH run with new data still applies
    agg_state_sink(_mk(spark, [(200, 1, 1.0)]), props)
    want[1] = (want[1][0] + 1, want[1][1] + 1.0)
    assert _state(spark, target) == want


def test_upsert_tie_winners_deterministic_across_replays(spark, tmp_path):
    """Two rows with EQUAL order_col for one key must merge to the
    same winner on every run — including a replay into a target that
    already holds one of them (VERDICT r7 item 1: the old ordering
    left tie winners to shuffle order)."""
    from universal_data_connector_spark.sinks.upsert import upsert_sink

    rows = [(1, 7, "payload-a"), (2, 7, "payload-b"), (3, 7, "payload-c"),
            (4, 8, "x")]

    def run_fresh(tag):
        target = str(tmp_path / f"t{tag}")
        df = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, payload string"
        ).withColumn("ord", F.lit(5))
        # vary input partitioning run-to-run to stress shuffle order
        upsert_sink(df.repartition(int(tag) + 1),
                    {"path": target, "keys": "user_id",
                     "orderColumn": "ord", "numBuckets": 4})
        return target

    winners = set()
    for tag in "0123":
        t = run_fresh(tag)
        got = {(r.user_id, r.event_id, r.payload)
               for r in spark.read.parquet(t).collect()}
        winners.add(frozenset(got))
    assert len(winners) == 1, f"tie winners varied across runs: {winners}"

    # replay the same batch into an existing target: state (the prior
    # winner) ties with each incoming row -> must keep the same winner
    t0 = str(tmp_path / "t0")
    before = {(r.user_id, r.event_id, r.payload)
              for r in spark.read.parquet(t0).collect()}
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, payload string"
    ).withColumn("ord", F.lit(5))
    from universal_data_connector_spark.sinks.upsert import upsert_sink
    upsert_sink(df, {"path": t0, "keys": "user_id", "orderColumn": "ord",
                     "numBuckets": 4})
    after = {(r.user_id, r.event_id, r.payload)
             for r in spark.read.parquet(t0).collect()}
    assert after == before


def test_batch_state_sinks_skip_scratch_copy(spark, tmp_path, monkeypatch):
    """Batch mode must not write the input to a udc_oneshot_ scratch
    dir (VERDICT r7 item 2: 1x avoidable write + read of the batch)."""
    from universal_data_connector_spark.sinks.upsert import (
        agg_state_sink,
        upsert_sink,
    )

    scratch_root = tmp_path / "scratch"
    scratch_root.mkdir()
    monkeypatch.setenv("TMPDIR", str(scratch_root))
    tempfile.tempdir = None  # re-read TMPDIR
    try:
        df = _mk(spark, [(1, 7, 1.0)]).withColumn("ord", F.lit(1))
        upsert_sink(df, {"path": str(tmp_path / "u"), "keys": "user_id",
                         "orderColumn": "ord"})
        agg_state_sink(_mk(spark, [(1, 7, 1.0)]),
                       {"path": str(tmp_path / "a"), "keys": "user_id",
                        "valueColumn": "value"})
    finally:
        tempfile.tempdir = None
    assert glob.glob(str(scratch_root / "udc_oneshot_*")) == []
    assert glob.glob(str(scratch_root / "udc_upsert_ck_*")) == []
    assert glob.glob(str(scratch_root / "udc_aggstate_ck_*")) == []


@pytest.mark.parametrize("uri", ["s3a://bucket/state", "gs://b/x",
                                 "abfs://c@a.dfs.core.windows.net/s",
                                 "file:///tmp/state"])
def test_state_sinks_reject_uri_scheme_targets(spark, uri):
    """A URI-scheme target must raise up front, naming the lakehouse
    alternative — not os.makedirs a literal local 's3a:' directory
    and silently keep state in the wrong place (VERDICT r7 item 4)."""
    from universal_data_connector_spark.streaming.windows import (
        _upsert_ensure_meta,
        agg_state_merge,
        upsert_merge,
    )

    with pytest.raises(ValueError, match="lakehouse|MERGE INTO"):
        _upsert_ensure_meta(uri, 4)
    df = _mk(spark, [(1, 7, 1.0)]).withColumn("ord", F.lit(1))
    with pytest.raises(ValueError, match="lakehouse|MERGE INTO"):
        upsert_merge(df, 0, path=uri, keys=["user_id"], order_col="ord",
                     num_buckets=4)
    with pytest.raises(ValueError, match="lakehouse|MERGE INTO"):
        agg_state_merge(df, 0, path=uri, keys=["user_id"],
                        value_col="value", num_buckets=4)
    assert not os.path.isdir("s3a:") and not os.path.isdir("gs:")


def test_read_touched_partition_prunes_on_bucket_col(spark, tmp_path):
    """The actual current-state reader used by BOTH merge bodies must
    carry the udc_kb filter as a PARTITION filter — untouched bucket
    directories are never opened (VERDICT r7 item 8a). Guards against
    a future edit reintroducing a full-target read."""
    from universal_data_connector_spark.streaming.windows import (
        _UPSERT_BUCKET_COL,
        _read_touched,
    )

    target = str(tmp_path / "t")
    df = _mk(spark, [(i, i, float(i)) for i in range(1, 9)])
    (df.withColumn(_UPSERT_BUCKET_COL,
                   F.pmod(F.xxhash64("user_id"), F.lit(4)).cast("int"))
       .write.partitionBy(_UPSERT_BUCKET_COL).parquet(target))

    picked = _read_touched(spark, target, [0, 1])
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert _UPSERT_BUCKET_COL in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and _UPSERT_BUCKET_COL in m.group(1), (
        f"udc_kb isin must be a partition filter, plan:\n{plan}")
    # and the pruned read returns exactly the picked buckets' rows
    got = {r.user_id for r in picked.collect()}
    full = {r.user_id: r[_UPSERT_BUCKET_COL]
            for r in spark.read.parquet(target).collect()}
    assert got == {u for u, b in full.items() if b in (0, 1)}
