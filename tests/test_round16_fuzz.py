"""Round-16 concurrency fuzz (VERDICT r15 item 5): randomized
interleavings of ``start_pipeline`` (batch AND streaming) /
``maintenance_window`` / ``stop_all`` schedules against one manager,
asserting the exclusive-window invariant continuously — at no sampled
instant may a job of a window-named pipeline be RUNNING while that
window is open. The directed r15 test pinned one TOCTOU
(start-during-window); this fuzz walks the schedule space around it,
including the r16 streaming register-before-start fix (ADVICE r15:
the query used to start BEFORE the atomic maintenance re-check, so
micro-batch 0 could append to a seen store mid-compaction).

The maintainer thread also runs REAL compaction on the shared store
some of the time, so the manager window and the store-carried lease
(``store_lease``) are fuzzed together: a refusal from either layer is
an acceptable outcome; a silent overlap is the bug.
"""

from __future__ import annotations

import random
import threading
import time
import uuid

from universal_data_connector_spark.config import parse_config
from universal_data_connector_spark.manager import (
    MaintenanceConflict,
    PipelineManager,
)
from universal_data_connector_spark.store_lease import StoreLeaseHeld

NAMES = ["fuzz-pipe-a", "fuzz-pipe-b"]


def _mk_cfg(name: str, tmp_path, store: str, streaming: bool):
    props = {"stateDir": store, "keys": "content"}
    if streaming:
        props["checkpointLocation"] = str(
            tmp_path / f"ckpt-{name}-{uuid.uuid4().hex[:6]}")
    return parse_config({"pipelines": [{
        "name": name,
        "source": {"type": "file",
                   "properties": {"path": str(tmp_path / "in")}},
        "transformations": [
            {"type": "dedup_state", "properties": props}],
        "sink": {"type": "file", "properties": {
            "path": str(tmp_path / "out" / f"{name}-{uuid.uuid4().hex[:6]}"),
            "extension": ".txt"}},
    }]}).pipelines[0]


def test_maintenance_window_interleaving_fuzz(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    for i in range(3):
        (inp / f"doc-{i}.txt").write_text(f"fuzz document {i}")
    store = str(tmp_path / "shared-store")

    mgr = PipelineManager(spark)
    deadline = time.monotonic() + 25.0
    stop_flag = threading.Event()
    violations: list[str] = []
    unexpected: list[str] = []
    counts = {"windows": 0, "window_refusals": 0, "starts": 0,
              "start_refusals": 0, "compactions": 0,
              "lease_refusals": 0, "read_races": 0}

    def live_named() -> set[str]:
        return {j.pipeline for j in list(mgr._jobs.values())
                if j.is_running} & set(NAMES)

    def maintainer(seed: int) -> None:
        rng = random.Random(seed)
        while not stop_flag.is_set():
            try:
                with mgr.maintenance_window(NAMES):
                    counts["windows"] += 1
                    if rng.random() < 0.4:
                        # real maintenance against the shared store —
                        # the store lease may still refuse (a commit
                        # from a pipeline the window aborted mid-build
                        # can be draining): acceptable, loud
                        from universal_data_connector_spark.operators \
                            .dedup_state import compact_seen_store
                        try:
                            compact_seen_store(spark, store)
                            counts["compactions"] += 1
                        except StoreLeaseHeld:
                            counts["lease_refusals"] += 1
                    end = time.monotonic() + rng.uniform(0.05, 0.25)
                    while time.monotonic() < end:
                        bad = live_named()
                        if bad:
                            violations.append(
                                f"running during window: {sorted(bad)}")
                        time.sleep(0.004)
            except MaintenanceConflict:
                counts["window_refusals"] += 1
            except Exception as exc:  # noqa: BLE001
                unexpected.append(f"maintainer: {exc!r}")
            stop_flag.wait(rng.uniform(0.0, 0.08))

    def starter(name: str, seed: int) -> None:
        rng = random.Random(seed)
        while not stop_flag.is_set():
            streaming = rng.random() < 0.5
            try:
                mgr.start_pipeline(
                    _mk_cfg(name, tmp_path, store, streaming),
                    streaming=streaming)
                counts["starts"] += 1
            except MaintenanceConflict:
                counts["start_refusals"] += 1
            except StoreLeaseHeld:
                # r17: a build racing a live compaction refuses
                # LOUDLY at the store (sweep-mark vs lease, or a
                # transient mid-swap park) instead of reading an
                # inconsistent store — a refusal, not a failure
                counts["lease_refusals"] += 1
            except Exception as exc:  # noqa: BLE001
                # a submission whose store read raced a bucket swap
                # fails LOUDLY (reader fencing is a store_lease
                # non-goal — the rerun re-reads); only genuinely
                # foreign errors count as fuzz failures
                if any(s in str(exc) for s in
                       ("FAILED_READ_FILE", "FileNotFoundException",
                        "does not exist")):
                    counts["read_races"] += 1
                else:
                    unexpected.append(f"starter {name}: {exc!r}")
            if rng.random() < 0.4:
                mgr.stop_all()
            stop_flag.wait(rng.uniform(0.0, 0.1))

    threads = [threading.Thread(target=maintainer, args=(1601,)),
               threading.Thread(target=starter, args=(NAMES[0], 1602)),
               threading.Thread(target=starter, args=(NAMES[1], 1603))]
    for t in threads:
        t.daemon = True
        t.start()
    while time.monotonic() < deadline:
        time.sleep(0.25)
    stop_flag.set()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive()

    # drain: stop everything and wait for terminal states
    for _ in range(200):
        mgr.stop_all()
        if not live_named():
            break
        time.sleep(0.25)
    assert not live_named()

    assert violations == [], violations[:5]
    assert unexpected == [], unexpected[:5]
    # the fuzz must have actually exercised both sides
    assert counts["windows"] >= 3, counts
    assert counts["starts"] >= 3, counts
    assert counts["start_refusals"] + counts["window_refusals"] >= 1, counts
