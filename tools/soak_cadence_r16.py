"""r16 soak (VERDICT r15 item 6): 50 micro-batches of sf1 documents
through the streaming dedup_state composition on the OBJECT-STORE
backend with the IN-LOOP ``compactEveryBatches: 4`` cadence — ~12
compaction cycles. Two claims under test:

* the per-batch data-GET count stays in a CONSTANT band across cycles
  (each cycle resets the per-bucket object count to O(1); without the
  cadence it grows one per run — BENCH_NOTES_r15 §3 measured the
  uncompacted growth at exactly 32n+1);
* survivors stay EXACT across the whole soak: every distinct document
  text ships exactly once over the 50 batches (the at-least-once
  commit contract plus history filtering must not double-ship OR
  drop under ~12 interleaved compactions — now each running under
  the r16 store lease with the stream's checkpoint-scoped owner).

Per-batch op counts come from the moto server's werkzeug access log
(ANSI-stripped), so driver AND executor traffic is visible.

Usage: python tools/soak_cadence_r16.py [batches] [batch_rows] [cadence]
Writes scale_probe/soak_cadence_<UDC_SOAK_TAG|r16>.json; exit 1 on any violation.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _WerkzeugTap:
    def __init__(self):
        import logging

        class H(logging.Handler):
            def __init__(self, sink):
                super().__init__()
                self.sink = sink

            def emit(self, record):
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
            "delete": sum(1 for x in lines if '"DELETE ' in x
                          or '"POST ' in x and "delete" in x),
            "list": sum(1 for x in lines if "list-type=" in x),
        }

    def close(self):
        import logging
        logging.getLogger("werkzeug").removeHandler(self._h)


def main() -> int:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cadence = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import boto3
    from moto.server import ThreadedMotoServer
    from pyspark.sql import SparkSession

    from universal_data_connector_spark.config import SinkConfig
    from universal_data_connector_spark.engine import (
        TRANSFORMS,
        start_streaming_sink,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .appName("soak-cadence-r16").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(
        os.path.join(REPO, "scale_probe/sf1/documents.parquet"))

    server = ThreadedMotoServer(port=0)
    server.start()
    port = server._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    client = boto3.client(
        "s3", endpoint_url=endpoint, region_name="us-east-1",
        aws_access_key_id="soak", aws_secret_access_key="soak")
    client.create_bucket(Bucket="soak-r16")

    work = tempfile.mkdtemp(prefix="soak_r16_")
    input_dir = os.path.join(work, "in")
    out_dir = os.path.join(work, "out")
    os.makedirs(input_dir)

    stream = spark.readStream.schema(docs.schema).parquet(input_dir)
    props = {"keys": "text", "bucketName": "soak-r16",
             "prefix": "stream-soak", "endpoint": endpoint,
             "accessKey": "soak", "secretKey": "soak",
             "compactEveryBatches": str(cadence),
             "checkpointLocation": os.path.join(work, "ckpt")}
    tagged = TRANSFORMS["dedup_state"](stream, props)
    sink = SinkConfig("file", {"path": out_dir, "format": "parquet"})

    tap = _WerkzeugTap()
    walls, ops = [], []
    q = start_streaming_sink(tagged, sink)
    try:
        for i in range(batches):
            lo, hi = i * rows, (i + 1) * rows
            batch = docs.filter(f"doc_id >= {lo} and doc_id < {hi}")
            stage = os.path.join(work, f"stage{i}")
            batch.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(f for f in sorted(os.listdir(stage))
                        if f.endswith(".parquet"))
            shutil.move(os.path.join(stage, part),
                        os.path.join(input_dir, f"batch-{i:03d}.parquet"))
            tap.take()
            t0 = time.perf_counter()
            q.processAllAvailable()
            walls.append(round(time.perf_counter() - t0, 3))
            ops.append(tap.take())
            print(f"  batch {i:02d}: {walls[-1]:.2f}s ops={ops[-1]}",
                  flush=True)
    finally:
        q.stop()
        tap.close()

    # --- exactness over the whole soak -------------------------------
    shipped = spark.read.parquet(out_dir).select("text")
    n_shipped = shipped.count()
    n_shipped_distinct = shipped.distinct().count()
    n_input_distinct = (docs.filter(f"doc_id < {batches * rows}")
                        .select("text").distinct().count())
    exact = (n_shipped == n_shipped_distinct == n_input_distinct)

    # --- GET band across compaction cycles ---------------------------
    # compare the first post-compaction batch of each cycle: with the
    # cadence the count must stay in a constant band (no run-count
    # growth); judge with max/min over cycle starts after warmup
    cycle_start_gets = [ops[i]["get_data"]
                        for i in range(cadence, batches, cadence)]
    band = (max(cycle_start_gets) / max(min(cycle_start_gets), 1)
            if cycle_start_gets else 1.0)
    flat = band <= 1.6  # constant band, vs ~(n_cycles)x if growth held

    out = {"batches": batches, "batch_rows": rows, "cadence": cadence,
           "walls": walls, "ops": ops,
           "shipped": n_shipped, "shipped_distinct": n_shipped_distinct,
           "input_distinct": n_input_distinct, "exact": exact,
           "cycle_start_gets": cycle_start_gets,
           "get_band_ratio": round(band, 3), "get_band_flat": flat}
    tag = os.environ.get("UDC_SOAK_TAG", "r16")
    path = os.path.join(REPO, f"scale_probe/soak_cadence_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"-- exact={exact} ({n_shipped} shipped, "
          f"{n_input_distinct} distinct input) "
          f"get-band={band:.2f} flat={flat} -> {path}", flush=True)
    shutil.rmtree(work, ignore_errors=True)
    return 0 if (exact and flat) else 1


if __name__ == "__main__":
    sys.exit(main())
