"""Control-plane REST API tests: the reference's 7 endpoints
(API_TESTING.md workflow: start -> status -> jobs -> job status ->
stop), driven over real HTTP against a live manager."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import yaml

from universal_data_connector_spark.manager import PipelineManager
from universal_data_connector_spark.rest import ControlPlaneServer


def _req(method: str, url: str):
    req = urllib.request.Request(url, method=method)
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


def test_rest_lifecycle(spark, tmp_path):
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir(), out.mkdir()
    (inp / "a.txt").write_text("important note\n")
    cfg = {"pipelines": [{
        "name": "rest-pipe",
        "source": {"type": "file", "properties": {"path": str(inp)}},
        "sink": {"type": "file", "properties": {"path": str(out),
                                                "extension": ".txt"}},
    }]}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    mgr = PipelineManager(spark)
    srv = ControlPlaneServer(mgr, port=0).start()
    base = f"http://127.0.0.1:{srv.port}/api/pipelines"
    try:
        # start requires configFilePath (PipelineController.java:105-107)
        try:
            _req("POST", f"{base}/start")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        status, body = _req("POST", f"{base}/start?configFilePath={cfg_path}")
        assert status == 200 and len(body["jobs"]) == 1
        job = body["jobs"][0]
        assert job.startswith("rest-pipe-")

        assert mgr.wait(timeout=120)
        # map keyed by job name (PipelineController.java:45-58)
        status, body = _req("GET", f"{base}/jobs")
        assert body[job]["name"] == job and body[job]["status"] == "COMPLETED"
        assert set(body[job]) == {"name", "status", "submissionTime"}

        # bare boolean body (PipelineController.java:60-75)
        status, body = _req("GET", f"{base}/jobs/{job}/status")
        assert body is False

        status, body = _req("GET", f"{base}/status")
        assert body == {"runningCount": 0, "hasRunningPipelines": False}

        status, body = _req("GET", f"{base}/count")
        assert body == {"count": 0}

        try:
            _req("GET", f"{base}/jobs/nope/status")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        status, body = _req("POST", f"{base}/stop-all")
        assert body == {"stopped": 0}  # nothing left running

        assert os.listdir(out) == ["a.txt"]
    finally:
        srv.stop()


def test_rest_start_bad_config_returns_500(spark, tmp_path):
    import urllib.error
    mgr = PipelineManager(spark)
    srv = ControlPlaneServer(mgr, port=0).start()
    base = f"http://127.0.0.1:{srv.port}/api/pipelines"
    try:
        try:
            _req("POST", f"{base}/start?configFilePath=/nonexistent.yaml")
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.stop()


def test_rest_maintenance_compact(spark, tmp_path):
    """POST /api/pipelines/maintenance?op=compact compacts the
    config's dedup stores through the control plane; bad ops and a
    missing config answer 400."""
    from universal_data_connector_spark.operators.dedup_state import (
        seen_filter,
    )

    store = tmp_path / "seen"
    frame = spark.createDataFrame([(1, "rest compact")],
                                  "doc_id bigint, content string")
    b, c = seen_filter(frame, str(store), ["content"], num_buckets=4)
    b.collect()
    c()
    c()  # duplicate append to supersede

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({"pipelines": [{
        "name": "m",
        "source": {"type": "file",
                   "properties": {"path": str(tmp_path / "in")}},
        "transformations": [{"type": "dedup_state", "properties": {
            "stateDir": str(store), "keys": "content",
            "numBuckets": "4"}}],
        "sink": {"type": "file",
                 "properties": {"path": str(tmp_path / "out")}},
    }]}))

    mgr = PipelineManager(spark)
    srv = ControlPlaneServer(mgr, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        req = urllib.request.Request(
            f"{base}/api/pipelines/maintenance?op=compact"
            f"&configFilePath={cfg_path}", method="POST")
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["compacted"] == [{"store": str(store)}]
        for name in os.listdir(store):
            if name.startswith("udc_kb="):
                parts = [f for f in os.listdir(store / name)
                         if f.endswith(".parquet")]
                assert len(parts) == 1
        # validation parity with the start endpoint
        for bad in (f"{base}/api/pipelines/maintenance?op=compact",
                    f"{base}/api/pipelines/maintenance?op=nope"
                    f"&configFilePath={cfg_path}"):
            req = urllib.request.Request(bad, method="POST")
            try:
                urllib.request.urlopen(req)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()


def test_rest_maintenance_async_polls_to_completion(
        spark, tmp_path, monkeypatch):
    """r17 (VERDICT r16 item 5): ``async=true`` returns a 202 job
    handle immediately for a SLOW compaction; /status and /jobs stay
    responsive while it runs, a second maintenance submission 409s
    (window held by the background job), and polling the jobs surface
    reaches COMPLETED with the op's result attached."""
    import time as _time

    from universal_data_connector_spark import maintenance as maint
    from universal_data_connector_spark.operators.dedup_state import (
        seen_filter,
    )

    store = tmp_path / "seen"
    frame = spark.createDataFrame([(1, "slow compact")],
                                  "doc_id bigint, content string")
    b, c = seen_filter(frame, str(store), ["content"], num_buckets=4)
    b.collect()
    c()
    c()

    real_compact = maint.compact_stores

    def slow_compact(sp, cfg, keep_going=None):
        _time.sleep(1.2)
        return real_compact(sp, cfg)

    monkeypatch.setattr(maint, "compact_stores", slow_compact)

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({"pipelines": [{
        "name": "m-async",
        "source": {"type": "file",
                   "properties": {"path": str(tmp_path / "in")}},
        "transformations": [{"type": "dedup_state", "properties": {
            "stateDir": str(store), "keys": "content",
            "numBuckets": "4"}}],
        "sink": {"type": "file",
                 "properties": {"path": str(tmp_path / "out")}},
    }]}))

    mgr = PipelineManager(spark)
    srv = ControlPlaneServer(mgr, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}/api/pipelines"
        req = urllib.request.Request(
            f"{base}/maintenance?op=compact&async=true"
            f"&configFilePath={cfg_path}", method="POST")
        t0 = __import__("time").monotonic()
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 202
            job = json.loads(resp.read())["job"]
        assert __import__("time").monotonic() - t0 < 1.0  # no blocking
        assert job.startswith("maintenance-compact-")

        # control plane responsive mid-compaction; window held -> 409
        status, body = _req("GET", f"{base}/status")
        assert status == 200
        status, body = _req("GET", f"{base}/jobs")
        assert body[job]["status"] == "RUNNING"
        req2 = urllib.request.Request(
            f"{base}/maintenance?op=compact&async=true"
            f"&configFilePath={cfg_path}", method="POST")
        try:
            urllib.request.urlopen(req2)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409

        deadline = __import__("time").monotonic() + 60
        while True:
            status, body = _req("GET", f"{base}/jobs")
            if body[job]["status"] != "RUNNING":
                break
            assert __import__("time").monotonic() < deadline
            _time.sleep(0.1)
        assert body[job]["status"] == "COMPLETED"
        assert body[job]["result"] == {
            "compacted": [{"store": str(store)}]}
        for name in os.listdir(store):
            if name.startswith("udc_kb="):
                parts = [f for f in os.listdir(store / name)
                         if f.endswith(".parquet")]
                assert len(parts) == 1
        # window released: a synchronous follow-up succeeds
        req3 = urllib.request.Request(
            f"{base}/maintenance?op=compact&configFilePath={cfg_path}",
            method="POST")
        with urllib.request.urlopen(req3) as resp:
            assert resp.status == 200
    finally:
        srv.stop()


def test_rest_maintenance_async_failure_is_recorded(
        spark, tmp_path, monkeypatch):
    """An async op that raises lands FAILED on the jobs surface with
    the error attached, and releases the window."""
    from universal_data_connector_spark import maintenance as maint

    def boom(sp, cfg, keep_going=None):
        raise RuntimeError("compaction exploded")

    monkeypatch.setattr(maint, "compact_stores", boom)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({"pipelines": [{
        "name": "m-fail",
        "source": {"type": "file",
                   "properties": {"path": str(tmp_path / "in")}},
        "sink": {"type": "file",
                 "properties": {"path": str(tmp_path / "out")}},
    }]}))
    mgr = PipelineManager(spark)
    srv = ControlPlaneServer(mgr, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}/api/pipelines"
        req = urllib.request.Request(
            f"{base}/maintenance?op=compact&async=true"
            f"&configFilePath={cfg_path}", method="POST")
        with urllib.request.urlopen(req) as resp:
            job = json.loads(resp.read())["job"]
        assert mgr.wait(timeout=60)
        status, body = _req("GET", f"{base}/jobs")
        assert body[job]["status"] == "FAILED"
        assert "compaction exploded" in body[job]["error"]
        # window released despite the failure
        from universal_data_connector_spark.config import load_config
        with mgr.maintenance_window(
                [p.name for p in load_config(str(cfg_path)).pipelines]):
            pass
    finally:
        srv.stop()
