"""Pipeline manager: the control plane over running pipelines.

Mirrors the reference's REST-shaped operations
(``controller/PipelineController.java`` -> ``service/PipelineService
.java`` -> ``pipeline/PipelineManager.java`` in
ThatNinjaGuy/universal-data-connector) over Spark jobs:

| reference op                          | here                        |
|---------------------------------------|-----------------------------|
| POST /api/pipelines/start             | ``start_all(config_path)``  |
| POST /api/pipelines/stop/{jobName}    | ``stop(job_name)``          |
| POST /api/pipelines/stop-all          | ``stop_all()``              |
| GET  /api/pipelines/status            | ``status()``                |
| GET  /api/pipelines/jobs              | ``jobs()``                  |
| GET  /api/pipelines/jobs/{n}/status   | ``is_running(job_name)``    |
| GET  /api/pipelines/count             | ``count()``                 |

Job names are unique per submission: ``<pipeline>-<millis>``
(``PipelineManager.java:57-61``). Per-pipeline failure isolation: one
bad pipeline logs and does not stop the rest
(``PipelineManager.java:44-50``). Streaming pipelines map to
``StreamingQuery`` handles; batch pipelines run on a worker thread so
submission returns immediately (the reference's Jet submission
boundary, SURVEY.md §3) and terminal state is observable — COMPLETED /
FAILED — which the reference's park-forever JDBC one-shot never reaches
(documented improvement, SURVEY.md §7.4.4).
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from universal_data_connector_spark import engine
from universal_data_connector_spark.config import PipelineConfig, load_config

log = logging.getLogger(__name__)


@dataclass
class Job:
    name: str
    pipeline: str
    submission_time_ms: int
    kind: str  # "batch" | "streaming"
    query: StreamingQuery | None = None
    thread: threading.Thread | None = None
    # DISK_ONLY frames materialize_reliable pinned during THIS job's
    # build (pin_scope'd at submission); released when the job reaches
    # a terminal state — never by another job's bookkeeping.
    pins: list = field(default_factory=list, repr=False)
    _state: str = "RUNNING"
    error: str | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    @property
    def status(self) -> str:
        if self.kind == "streaming" and self.query is not None:
            if self.query.isActive:
                return "RUNNING"
            # the stream reached a terminal state on its own (failure /
            # source exhaustion): its build pins have no consumer left
            self.release_pins()
            return "FAILED" if self.query.exception() else "COMPLETED"
        with self._lock:
            return self._state

    def release_pins(self) -> None:
        """Free this job's DISK_ONLY build pins exactly once
        (idempotent, thread-safe) — called from every terminal path:
        worker finish, stop(), and terminal-status observation of a
        self-terminated stream."""
        with self._lock:
            pins, self.pins = self.pins, []
        if pins:
            from universal_data_connector_spark.operators.relational import (
                release_frames,
            )
            release_frames(pins)

    def _finish(self, state: str, error: str | None = None) -> None:
        """Transition to a terminal state exactly once: a stop() that
        already marked the job CANCELLED wins over the worker thread
        later observing the cancellation as a failure."""
        with self._lock:
            if self._state == "RUNNING":
                self._state = state
                self.error = error

    @property
    def is_running(self) -> bool:
        return self.status == "RUNNING"

    #: async-maintenance result payload (compacted/vacuumed listing);
    #: None for pipeline jobs
    result: dict | None = None

    def info(self) -> dict:
        """DTO shape of ``dto/JobInfo.java:8-34``. PIPELINE jobs keep
        exactly that shape (failed ones included — the reference
        exposes no error field either); async MAINTENANCE jobs, which
        have no reference DTO to match, additionally carry their
        result / error once terminal so the handle is pollable."""
        out = {"name": self.name, "status": self.status,
               "submissionTime": self.submission_time_ms}
        if self.pipeline.startswith("maintenance:"):
            if self.result is not None:
                out["result"] = self.result
            if self.error is not None:
                out["error"] = self.error
        return out


class MaintenanceConflict(RuntimeError):
    """Offline store maintenance refused: jobs are running (or another
    maintenance operation holds the window)."""

    def __init__(self, message: str, running: list[str]):
        super().__init__(message)
        self.running = running


class PipelineManager:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._jobs: dict[str, Job] = {}
        self._lock = threading.Lock()
        self._last_ms = 0
        self._maintenance = False

    # -- maintenance window ----------------------------------------------

    @contextlib.contextmanager
    def maintenance_window(self, pipelines: list[str]):
        """Exclusive window for offline store maintenance (r15 review:
        the one-shot running check was a TOCTOU — a pipeline starting
        DURING a long compaction re-opened the rename-swap data-loss
        race the check exists to prevent). Entry refuses while any job
        of the named pipeline configs is running or another window is
        open; for the window's duration ``start_pipeline`` refuses new
        submissions (checked at entry AND atomically at registration,
        so a submission in flight when the window opens aborts before
        its worker starts)."""
        with self._lock:
            if self._maintenance:
                raise MaintenanceConflict(
                    "another maintenance operation is running", [])
            live = {j.pipeline for j in self._jobs.values()
                    if j.is_running}
            running = sorted(set(pipelines) & live)
            if running:
                raise MaintenanceConflict(
                    "store maintenance is offline-only: stop the "
                    "running pipeline job(s) first", running)
            self._maintenance = True
        try:
            yield
        finally:
            with self._lock:
                self._maintenance = False

    def run_maintenance_async(self, cfg, op: str) -> str:
        """Offline store maintenance as a BACKGROUND job (VERDICT r16
        item 5): the manager window is entered SYNCHRONOUSLY — a
        conflict (running pipelines, another maintenance op) raises
        ``MaintenanceConflict`` before anything is registered — and is
        held by the worker thread for the op's duration, so the
        control plane stays responsive while a large-store compaction
        runs. Progress is a regular entry on the jobs surface
        (status RUNNING → COMPLETED/FAILED, result/error attached);
        ``stop()`` cancels its Spark jobs like any batch job. The
        per-store lease (r16) still guards writers the window cannot
        see, and heartbeat-renews for the op's duration (r17)."""
        from universal_data_connector_spark.maintenance import (
            compact_stores,
            vacuum_stores,
        )

        if op not in ("compact", "vacuum"):
            raise ValueError("op must be 'compact' or 'vacuum'")
        window = self.maintenance_window([p.name for p in cfg.pipelines])
        window.__enter__()  # sync refusal: MaintenanceConflict surfaces
        try:
            with self._lock:
                submit_ms = max(int(time.time() * 1000),
                                self._last_ms + 1)
                self._last_ms = submit_ms
            job_name = f"maintenance-{op}-{submit_ms}"
            job = Job(job_name, f"maintenance:{op}", submit_ms, "batch")

            def target() -> None:
                try:
                    self.spark.sparkContext.setJobGroup(
                        job_name, f"maintenance {op}", True)
                    if not job.is_running:  # stop() landed first
                        return
                    # keep_going: a stop() mid-op lands at the next
                    # STORE boundary (vacuum runs no Spark jobs, so
                    # the job-group cancel alone can't reach it)
                    if op == "compact":
                        job.result = {"compacted": compact_stores(
                            self.spark, cfg,
                            keep_going=lambda: job.is_running)}
                    else:
                        job.result = {"vacuumed": vacuum_stores(
                            cfg, keep_going=lambda: job.is_running)}
                    job._finish("COMPLETED")
                except Exception as exc:  # noqa: BLE001 - job records it
                    job._finish("FAILED", str(exc))
                    log.exception("async maintenance %s failed",
                                  job_name)
                finally:
                    window.__exit__(None, None, None)

            # attach the thread BEFORE registering so a stop() racing
            # the registration always sees a stoppable job, and keep
            # thread.start() inside the cleanup scope: a start() that
            # raises (thread exhaustion) must release the window and
            # unregister instead of wedging the manager forever
            job.thread = threading.Thread(target=target, name=job_name,
                                          daemon=True)
            with self._lock:
                self._jobs[job_name] = job
            try:
                job.thread.start()
            except BaseException:
                with self._lock:
                    self._jobs.pop(job_name, None)
                raise
        except BaseException:
            window.__exit__(None, None, None)
            raise
        return job_name

    # -- start ----------------------------------------------------------

    def start_all(self, config) -> list[str]:
        """Start every pipeline in a YAML path or an already-parsed
        EngineConfig (callers who need the pipeline COUNT for exit
        semantics pass the parsed config so count and start see one
        read — a re-read races concurrent config edits)."""
        cfg = config if hasattr(config, "pipelines") else \
            load_config(config)
        started = []
        for p in cfg.pipelines:
            try:
                started.append(self.start_pipeline(p))
            except Exception:  # noqa: BLE001 - isolation (:44-50)
                log.exception("failed to start pipeline %s", p.name)
        return started

    def start_pipeline(self, cfg: PipelineConfig,
                       streaming: bool | None = None) -> str:
        if streaming is None:
            streaming = _wants_streaming(cfg)
        # jdbc "streaming" is a one-time paged read in the reference —
        # run it with its real (batch) semantics instead of raising on
        # a ported YAML (engine.effective_streaming logs the downgrade)
        streaming = engine.effective_streaming(cfg, streaming)
        with self._lock:
            if self._maintenance:
                raise MaintenanceConflict(
                    "store maintenance is in progress on this manager; "
                    "retry after it completes", [])
        # monotonic submission stamp: two submissions of one pipeline
        # in the same millisecond would otherwise collide on the job
        # name, silently orphaning the first job's handle AND sharing
        # one Spark job group (stop() would cancel both)
        with self._lock:
            submit_ms = max(int(time.time() * 1000), self._last_ms + 1)
            self._last_ms = submit_ms
        job_name = f"{cfg.name}-{submit_ms}"
        # Build the lineage synchronously: config/connector errors
        # surface at submission (the reference's per-pipeline try/catch
        # boundary, PipelineManager.java:44-50); execution is deferred.
        # Pin-scope the build so any DISK_ONLY intermediates belong to
        # this job alone and are released at its terminal state.
        from universal_data_connector_spark.operators.relational import (
            pin_scope,
        )
        with pin_scope() as build_pins:
            source_df, df = engine.build_parts(self.spark, cfg,
                                               streaming=streaming)
        # Anything that raises between here and job registration must
        # free the build's DISK_ONLY pins — an unregistered job has no
        # terminal state and no stop() to release them, and stale
        # cached plans would silently substitute into later builds.
        try:
            if streaming:
                # Register the job BEFORE the query starts (ADVICE
                # r15): a streaming query's micro-batch 0 can append
                # to a seen store the moment start() returns, so the
                # job must already be visible to maintenance_window —
                # the old start-then-register order left a window
                # where a maintenance op opened during the build ran
                # compaction concurrently with batch 0 until the
                # abort's stop() landed. Registration is the atomic
                # re-check: under the lock, a live maintenance window
                # refuses BEFORE anything runs.
                job = Job(job_name, cfg.name, submit_ms,
                          "streaming", pins=build_pins)
                with self._lock:
                    if self._maintenance:
                        raise MaintenanceConflict(
                            "store maintenance began while this "
                            "pipeline was building; retry after it "
                            "completes", [])
                    self._jobs[job_name] = job
                try:
                    query = engine.start_streaming_sink(df, cfg.sink)
                except BaseException:
                    with self._lock:
                        self._jobs.pop(job_name, None)
                    raise
                # a stop()/stop_all() that landed between registration
                # and start marked the job CANCELLED: honor it instead
                # of leaving an orphaned live query behind
                with job._lock:
                    cancelled = job._state != "RUNNING"
                    if not cancelled:
                        job.query = query
                if cancelled:
                    with contextlib.suppress(Exception):
                        query.stop()
                    job.release_pins()
                return job_name
            else:
                job = Job(job_name, cfg.name, submit_ms, "batch",
                          pins=build_pins)
                # Managed pipelines honor archiveDir exactly like direct
                # engine.run callers (same helper, same move-after-sink
                # ordering); the plan is captured here, at submission,
                # from the SOURCE frame — not the transformed plan.
                archive_dir, consumed, source_root = engine.batch_archive_plan(
                    cfg, source_df, streaming)
                manifest_dir, manifest_files = engine.batch_manifest_plan(
                    cfg, source_df, streaming)
        except BaseException:
            from universal_data_connector_spark.operators.relational import (
                release_frames,
            )
            engine.close_store_spans(df)
            release_frames(build_pins)
            raise
        # batch only from here (the streaming branch returned above)

        def target() -> None:
            from universal_data_connector_spark.sinks import create_sink
            try:
                # Tag every Spark job this pipeline submits with its
                # own job group so stop(job_name) can cancel just
                # this pipeline (the reference's per-job
                # stopPipeline, PipelineManager.java:74-81).
                # PySpark's pinned-thread mode makes the group local
                # to this worker thread.
                sc = self.spark.sparkContext
                sc.setJobGroup(job_name, f"pipeline {cfg.name}",
                               interruptOnCancel=True)
                if job.status == "CANCELLED":
                    # stop() landed before the group tag existed;
                    # its cancelJobGroup hit nothing — bail before
                    # the first action instead of running the
                    # pipeline to completion under a CANCELLED
                    # status
                    return
                try:
                    # ONE shared implementation of the agg_state
                    # intent deferral + post-sink bookkeeping
                    # ordering (engine.prepare_batch_sink_cfg /
                    # finalize_batch_sink): the r10 reviews found
                    # the hand-mirrored copies here drifting from
                    # engine.run's — crash-ordering fixes must land
                    # in one place. A stop() that lands mid-
                    # sequence is re-checked before every step.
                    sink_cfg, defer_state = \
                        engine.prepare_batch_sink_cfg(
                            cfg.sink, source_df, streaming=False)
                    create_sink(df, sink_cfg, streaming=False)
                    engine.finalize_batch_sink(
                        source_df.sparkSession, cfg, source_df,
                        archive_dir, consumed, source_root,
                        manifest_dir, manifest_files, defer_state,
                        cancelled=lambda: job.status == "CANCELLED",
                        transformed_df=df)
                    job._finish("COMPLETED")
                except Exception as exc:  # noqa: BLE001
                    if job.status == "CANCELLED":
                        return  # stop() already recorded the outcome
                    log.exception("pipeline %s failed", cfg.name)
                    job._finish("FAILED", str(exc))
            finally:
                # terminal state (completed / failed / cancelled):
                # release any batch dedup_state writer-mark span the
                # build opened (no-op if the commit already closed it)
                # and free exactly this job's pinned intermediates
                # (the build ran under pin_scope)
                engine.close_store_spans(df)
                job.release_pins()
            # No clearJobGroup needed: the group is local to this
            # dedicated worker thread (pinned-thread mode) and the
            # thread ends with the pipeline.

        job.thread = threading.Thread(target=target,
                                      name=job_name, daemon=True)
        # register BEFORE the worker starts (r15 review; the streaming
        # path above registers before its query starts for the same
        # reason): running_pipelines()/the maintenance check must never
        # miss a job that is already doing work. The registration is
        # also the atomic re-check against a maintenance window that
        # opened while this pipeline was building.
        with self._lock:
            aborted = self._maintenance
            if not aborted:
                self._jobs[job_name] = job
        if aborted:
            # The build already opened any batch dedup_state writer-mark
            # span; this job will never run, so close it here exactly like
            # every other failure path — otherwise the span's heartbeat
            # renews the mark forever (live pid + live nonce, never stale)
            # and the very maintenance op that aborted us is refused with
            # StoreLeaseHeld until process exit (ADVICE r18, high).
            engine.close_store_spans(df)
            job.release_pins()
            raise MaintenanceConflict(
                "store maintenance began while this pipeline was "
                "building; retry after it completes", [])
        try:
            job.thread.start()
        except BaseException:
            # can't-spawn-thread: the worker's finally will never run,
            # so unwind its cleanup here (deregister + close spans +
            # release pins) instead of leaking a registered zombie job
            with self._lock:
                self._jobs.pop(job_name, None)
            engine.close_store_spans(df)
            job.release_pins()
            raise
        return job_name

    # -- stop -----------------------------------------------------------

    def stop(self, job_name: str) -> bool:
        with self._lock:
            job = self._jobs.get(job_name)
        if job is None:
            return False
        if job.query is not None:
            job.query.stop()
            # the stream is down: its build-time pins have no consumer
            job.release_pins()
        elif job.kind == "streaming":
            # registered but the query handle is not attached yet (the
            # instant between registration and start()): mark CANCELLED
            # — start_pipeline observes the terminal state right after
            # start() and stops the fresh query instead of orphaning it
            job._finish("CANCELLED")
        elif job.thread is not None:
            # Cancel only this pipeline's Spark jobs — other running
            # pipelines keep their isolation (the worker thread tagged
            # them with setJobGroup(job_name) at start). Mark CANCELLED
            # first: the worker re-checks it after setJobGroup, closing
            # the stop-before-tag race. No is_alive() gate (r17): a
            # stop() landing in the register-to-start instant must
            # still mark CANCELLED (the worker's re-check honors it);
            # on an already-finished job both the mark and the group
            # cancel are no-ops.
            job._finish("CANCELLED")
            sc = self.spark.sparkContext
            try:
                # a multi-action sink keeps submitting Spark jobs after
                # the active one dies; cancel future submissions in the
                # group too (JVM API, Spark >= 4.0)
                sc._jsc.sc().cancelJobGroupAndFutureJobs(job_name)
            except Exception:  # noqa: BLE001 - older/py4j-less builds
                sc.cancelJobGroup(job_name)
        return True

    def stop_all(self) -> int:
        n = 0
        with self._lock:
            names = list(self._jobs)
        for name in names:
            job = self._jobs.get(name)
            if job is not None and job.is_running and self.stop(name):
                n += 1
        return n

    # -- introspection ---------------------------------------------------

    def _snapshot(self) -> list[Job]:
        """Copy under the lock: the ThreadingHTTPServer serves these
        from handler threads while start_pipeline mutates the dict —
        unlocked iteration raises 'dictionary changed size during
        iteration' on a concurrent insert."""
        with self._lock:
            return list(self._jobs.values())

    def status(self) -> dict:
        running = sum(1 for j in self._snapshot() if j.is_running)
        return {"runningCount": running, "hasRunningPipelines": running > 0}

    def jobs(self) -> list[dict]:
        return [j.info() for j in self._snapshot()]

    def is_running(self, job_name: str) -> bool:
        with self._lock:
            job = self._jobs.get(job_name)
        return job is not None and job.is_running

    def running_pipelines(self) -> set:
        """Names of the PIPELINE CONFIGS with at least one running job
        (job names carry a submission stamp; this is the config-name
        view — what the maintenance guard needs)."""
        return {j.pipeline for j in self._snapshot() if j.is_running}

    def count(self) -> int:
        return sum(1 for j in self._snapshot() if j.is_running)

    def wait(self, timeout: float | None = None) -> bool:
        """Wait for all batch jobs to reach a terminal state (test /
        --once helper). Returns True if everything finished."""
        deadline = None if timeout is None else time.time() + timeout
        for job in self._snapshot():
            if job.thread is not None:
                remaining = None if deadline is None else max(0.0, deadline - time.time())
                job.thread.join(remaining)
        return all(not j.is_running for j in self._snapshot()
                   if j.kind == "batch")


def _wants_streaming(cfg: PipelineConfig) -> bool:
    """Streaming iff the source is unbounded-by-nature (kafka) or the
    config asks for it; the reference runs everything as an unbounded
    stream (SURVEY.md §1.4) — we default file/jdbc pipelines to finite
    batch, the semantically honest mode."""
    if str(cfg.source.properties.get("streaming", "")).lower() == "true":
        return True
    if cfg.source.type == "kafka":
        # loopback brokers (bootstrapServers: loopback:///dir) are
        # batch-only: one poll per run, consumer-group offsets for
        # incrementality (sources/kafka.py)
        from universal_data_connector_spark.kafka_loopback import (
            is_loopback,
        )
        return not is_loopback(cfg.source.properties)
    return False
