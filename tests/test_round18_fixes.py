"""Round-18 fixes.

ADVICE r17 (medium): the BATCH pipeline path's dedup_state now holds a
POSIX writer mark across the WHOLE read-filter-ship-commit sequence —
the same span the streaming foreachBatch path got in r17. Without it, a
cross-process compaction's rename swap mid-read silently dropped a
bucket dir from seen_filter's listing, letting already-seen keys ship
as new before the commit's own mark-guarded refusal could land.
"""

from __future__ import annotations

import os

import pytest

from universal_data_connector_spark.config import (
    TransformationConfig,
    parse_config,
)
from universal_data_connector_spark.engine import (
    apply_transformations,
    close_store_spans,
    run,
)
from universal_data_connector_spark.operators.dedup_state import (
    compact_seen_store,
    seen_filter,
)
from universal_data_connector_spark.store_lease import (
    StoreLeaseHeld,
    posix_maintenance_lease,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _seed(spark, store) -> None:
    _, c = seen_filter(_docs(spark, [(1, "aa"), (2, "bb")]), store,
                       ["text"], num_buckets=4)
    c()


def test_batch_dedup_state_span_excludes_maintenance(spark, tmp_path):
    """From the moment a batch dedup_state is BUILT (its seen-store
    listing happens then) until its commit, maintenance must refuse —
    pre-r18 only the commit carried a mark, so a compaction could
    rename-swap bucket dirs between the listing and the commit. Fails
    against the r17 code (the mid-build compaction succeeded)."""
    store = str(tmp_path / "seen")
    _seed(spark, store)
    df = apply_transformations(
        _docs(spark, [(3, "cc")]),
        [TransformationConfig("dedup_state",
                              {"stateDir": store, "keys": "text",
                               "numBuckets": "4"})])
    try:
        with pytest.raises(StoreLeaseHeld):
            compact_seen_store(spark, store)
    finally:
        close_store_spans(df)
    # span released (sink failed / never ran): maintenance proceeds
    compact_seen_store(spark, store)


def test_batch_dedup_state_refuses_up_front_under_maintenance(
        spark, tmp_path):
    """The mirror: a batch pipeline whose dedup_state store is under
    live maintenance refuses at BUILD — before reading anything or
    writing to the sink — instead of shipping rows and only failing at
    the post-sink commit. Fails against the r17 code (the run wrote
    the sink output first and raised at commit time)."""
    store = str(tmp_path / "seen")
    _seed(spark, store)
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()
    (inp / "a.txt").write_text("hello corpus")
    cfg = parse_config({"pipelines": [{
        "name": "dedup-ingest",
        "source": {"type": "file",
                   "properties": {"path": str(inp), "pattern": "*.txt"}},
        "transformations": [
            {"type": "dedup_state",
             "properties": {"stateDir": store, "keys": "content",
                            "numBuckets": "4"}},
        ],
        "sink": {"type": "file",
                 "properties": {"path": str(out), "extension": ".txt"}},
    }]}).pipelines[0]
    with posix_maintenance_lease(store):
        with pytest.raises(StoreLeaseHeld):
            run(spark, cfg)
        assert not out.exists() or os.listdir(out) == []
    # maintenance done: the same run completes and the span is gone
    run(spark, cfg)
    assert sorted(os.listdir(out)) == ["a.txt"]
    compact_seen_store(spark, store)


def test_batch_dedup_state_span_released_on_sink_failure(
        spark, tmp_path, monkeypatch):
    """A failed sink (commit never runs) must release the span, or the
    store wedges maintenance until process exit."""
    import universal_data_connector_spark.engine as eng

    store = str(tmp_path / "seen")
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()
    (inp / "a.txt").write_text("hello corpus")
    cfg = parse_config({"pipelines": [{
        "name": "dedup-ingest",
        "source": {"type": "file",
                   "properties": {"path": str(inp), "pattern": "*.txt"}},
        "transformations": [
            {"type": "dedup_state",
             "properties": {"stateDir": store, "keys": "content",
                            "numBuckets": "4"}},
        ],
        "sink": {"type": "file",
                 "properties": {"path": str(out), "extension": ".txt"}},
    }]}).pipelines[0]

    def failing_sink(*a, **k):
        raise RuntimeError("sink exploded")

    monkeypatch.setattr(eng, "create_sink", failing_sink)
    with pytest.raises(RuntimeError, match="sink exploded"):
        run(spark, cfg)
    monkeypatch.undo()
    # span released on the failure path: maintenance proceeds, and the
    # clean rerun ships the file (nothing was committed)
    compact_seen_store(spark, store)
    run(spark, cfg)
    assert sorted(os.listdir(out)) == ["a.txt"]


def test_manager_batch_dedup_state_span_follows_job_lifecycle(
        spark, tmp_path):
    """Managed batch jobs hold the span from submission (build) to the
    job's terminal state: maintenance refuses while the job runs and
    proceeds after it completes."""
    from universal_data_connector_spark.manager import PipelineManager

    store = str(tmp_path / "seen")
    _seed(spark, store)
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()
    (inp / "a.txt").write_text("hello corpus")
    cfg = parse_config({"pipelines": [{
        "name": "dedup-ingest",
        "source": {"type": "file",
                   "properties": {"path": str(inp), "pattern": "*.txt"}},
        "transformations": [
            {"type": "dedup_state",
             "properties": {"stateDir": store, "keys": "content",
                            "numBuckets": "4"}},
        ],
        "sink": {"type": "file",
                 "properties": {"path": str(out), "extension": ".txt"}},
    }]}).pipelines[0]
    import time

    mgr = PipelineManager(spark)
    job = mgr.start_pipeline(cfg)

    def job_status():
        return {j["name"]: j for j in mgr.jobs()}[job]["status"]

    for _ in range(600):
        if job_status() in ("COMPLETED", "FAILED"):
            break
        time.sleep(0.05)
    assert job_status() == "COMPLETED"
    assert sorted(os.listdir(out)) == ["a.txt"]
    # terminal job: its span is closed, maintenance proceeds
    compact_seen_store(spark, store)
