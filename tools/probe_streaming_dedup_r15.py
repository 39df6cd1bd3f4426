"""r15 scale probe: the STREAMING dedup_state composition end-to-end
(VERDICT r14 item 4).

The store modes were probed in batch form (BENCH_NOTES_r14 §9/§11);
this drives the actual streaming composition — ``readStream ->
foreachBatch(seen-filter -> batch sink -> commit)`` via the engine's
own ``TRANSFORMS["dedup_state"]`` tag + ``start_streaming_sink`` — for
a multi-batch sf1 ingestion on BOTH store backends, recording
per-micro-batch wall clock as the accumulated history grows ~10x.
The O(touched + batch) claim predicts flat-ish per-batch cost; a
linear-in-history trend would falsify it.

Each batch is one parquet drop of ``--batch-rows`` fresh sf1
documents into the stream's input dir followed by
``processAllAvailable()`` (one micro-batch per drop, the
``test_dedup_state_streaming_s3_store`` cadence). Outputs one JSON
blob to scale_probe/probe_r15_streaming_dedup.json.

Usage: python tools/probe_streaming_dedup_r15.py [batches] [batch_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _WerkzeugTap:
    """Per-batch classification of the moto server's request log
    (covers every process — driver and executor workers). ANSI codes
    stripped: werkzeug colorizes non-200 lines (404 probes)."""

    def __init__(self):
        import logging

        class H(logging.Handler):
            def __init__(self, sink):
                super().__init__()
                self.sink = sink

            def emit(self, record):
                import re
                self.sink.append(
                    re.sub(r"\x1b\[[0-9;]*m", "", record.getMessage()))

        self.lines: list[str] = []
        self._h = H(self.lines)
        import logging as _l
        _l.getLogger("werkzeug").addHandler(self._h)

    def take(self) -> dict:
        lines, self.lines[:] = list(self.lines), []
        return {
            "get_data": sum(1 for x in lines if '"GET ' in x
                            and "list-type=" not in x),
            "put": sum(1 for x in lines if '"PUT ' in x),
            "list": sum(1 for x in lines if "list-type=" in x),
        }

    def close(self):
        import logging
        logging.getLogger("werkzeug").removeHandler(self._h)


def _series(spark, docs_parquet, batches, rows, make_props, label,
            maintain=None, maintain_every=0, tap=None):
    """One backend series: fresh input/checkpoint/sink dirs, one
    streaming query, `batches` file drops; returns per-batch walls
    (plus per-batch server op counts when a ``tap`` is given).
    ``maintain(props)`` (if given) runs after every ``maintain_every``
    batches while the stream is quiescent — the offline-compaction
    cadence a production ingestion would schedule."""
    from universal_data_connector_spark.config import SinkConfig
    from universal_data_connector_spark.engine import (
        TRANSFORMS,
        start_streaming_sink,
    )

    work = tempfile.mkdtemp(prefix="probe_r15_")
    input_dir = os.path.join(work, "in")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(input_dir)

    spark_schema = docs_parquet.schema
    stream = spark.readStream.schema(spark_schema).parquet(input_dir)
    props = make_props(work)
    props["checkpointLocation"] = ckpt
    tagged = TRANSFORMS["dedup_state"](stream, props)
    sink = SinkConfig("file", {"path": out_dir, "format": "parquet"})

    walls, ops = [], []
    q = start_streaming_sink(tagged, sink)
    try:
        for i in range(batches):
            lo, hi = i * rows, (i + 1) * rows
            batch = docs_parquet.filter(
                f"doc_id >= {lo} and doc_id < {hi}")
            stage = os.path.join(work, f"stage{i}")
            batch.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(f for f in sorted(os.listdir(stage))
                        if f.endswith(".parquet"))
            shutil.move(os.path.join(stage, part),
                        os.path.join(input_dir, f"batch-{i:03d}.parquet"))
            if tap:
                tap.take()
            t0 = time.perf_counter()
            q.processAllAvailable()
            walls.append(round(time.perf_counter() - t0, 3))
            if tap:
                ops.append(tap.take())
            print(f"  {label} batch {i}: {walls[-1]:.2f}s "
                  f"(history ~{lo} docs)"
                  + (f" ops={ops[-1]}" if tap else ""), flush=True)
            if maintain and maintain_every and (i + 1) % maintain_every == 0:
                maintain(props)
    finally:
        q.stop()
        shutil.rmtree(work, ignore_errors=True)
    return {"walls": walls, "ops": ops} if tap else walls


def main() -> int:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .appName("probe-r15-streaming-dedup").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(
        os.path.join(REPO, "scale_probe/sf1/documents.parquet"))
    out = {"batches": batches, "batch_rows": rows, "series": {}}

    # POSIX exact
    out["series"]["posix_exact"] = _series(
        spark, docs, batches, rows,
        lambda work: {"keys": "text",
                      "stateDir": os.path.join(work, "store")},
        "posix_exact")

    # POSIX near (MinHash against history)
    out["series"]["posix_near"] = _series(
        spark, docs, batches, rows,
        lambda work: {"mode": "near", "textColumn": "text",
                      "idColumn": "doc_id",
                      "stateDir": os.path.join(work, "store")},
        "posix_near")

    # S3 exact (moto loopback, executor-side transport)
    try:
        import boto3
        from moto.server import ThreadedMotoServer
    except ImportError:
        print("moto/boto3 unavailable; skipping s3 series")
        ThreadedMotoServer = None
    if ThreadedMotoServer is not None:
        server = ThreadedMotoServer(port=0)
        server.start()
        port = server._server.socket.getsockname()[1]
        endpoint = f"http://127.0.0.1:{port}"
        client = boto3.client(
            "s3", endpoint_url=endpoint, region_name="us-east-1",
            aws_access_key_id="probe", aws_secret_access_key="probe")
        # SEPARATE buckets per series: moto's in-memory prefix listing
        # scans the whole bucket, so a shared bucket would leak series
        # A's accumulated objects into series B's LIST costs
        client.create_bucket(Bucket="probe-r15-a")
        client.create_bucket(Bucket="probe-r15-b")

        def s3_props(bucket, prefix):
            return lambda work: {"keys": "text",
                                 "bucketName": bucket,
                                 "prefix": prefix,
                                 "endpoint": endpoint,
                                 "accessKey": "probe",
                                 "secretKey": "probe"}

        def compact(props):
            from universal_data_connector_spark.operators.dedup_state \
                import compact_seen_store_s3
            from universal_data_connector_spark.sinks.upsert import (
                s3_state_target,
            )
            n = compact_seen_store_s3(spark, s3_state_target(props))
            print(f"  [compacted {n} superseded objects]", flush=True)

        tap = _WerkzeugTap()
        try:
            out["series"]["s3_exact"] = _series(
                spark, docs, batches, rows,
                s3_props("probe-r15-a", "stream-exact"), "s3_exact",
                tap=tap)
            # same series with the offline-compaction cadence a real
            # ingestion schedules: per-bucket object count stays O(1),
            # so the per-batch GET count stays flat instead of growing
            # with RUN COUNT (the documented compact_seen_store
            # rationale)
            out["series"]["s3_exact_compact4"] = _series(
                spark, docs, batches, rows,
                s3_props("probe-r15-b", "stream-exact-c4"),
                "s3_exact_compact4",
                maintain=compact, maintain_every=4, tap=tap)
        finally:
            tap.close()
            server.stop()

    path = os.path.join(REPO, "scale_probe/probe_r15_streaming_dedup.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
