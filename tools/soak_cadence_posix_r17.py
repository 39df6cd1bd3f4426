"""POSIX mirror of the r16 object-store cadence soak, added in r17
because the round changed the POSIX streaming hot path: every batch
now spans its read-filter-ship-commit in a store writer mark
(engine.py batch_span) and the store setup's sweep takes a mark too.
Claims under test:

* survivors stay EXACT across N batches with the in-loop
  ``compactEveryBatches`` cadence — every distinct document text
  ships exactly once under interleaved lease-guarded compactions,
  with the new marks in the loop;
* per-bucket file count returns to 1 after each cadence (the
  compaction actually ran — the span mark releases before the
  cadence window, so the loop never starves its own compaction);
* per-batch wall stays in a flat band (the two extra filesystem
  metadata ops + heartbeat thread per batch are noise).

Usage: python tools/soak_cadence_posix_r17.py [batches] [rows] [cadence]
Writes scale_probe/soak_cadence_posix_<UDC_SOAK_TAG|r17>.json;
exit 1 on any violation.
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


def main() -> int:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cadence = int(sys.argv[3]) if len(sys.argv) > 3 else 4

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
             .appName("soak-cadence-posix-r17").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(
        os.path.join(REPO, "scale_probe/sf1/documents.parquet"))

    work = tempfile.mkdtemp(prefix="soak_posix_r17_")
    input_dir = os.path.join(work, "in")
    out_dir = os.path.join(work, "out")
    store = os.path.join(work, "store")
    os.makedirs(input_dir)

    stream = spark.readStream.schema(docs.schema).parquet(input_dir)
    props = {"keys": "text", "stateDir": store,
             "compactEveryBatches": str(cadence),
             "checkpointLocation": os.path.join(work, "ckpt")}
    tagged = TRANSFORMS["dedup_state"](stream, props)
    sink = SinkConfig("file", {"path": out_dir, "format": "parquet"})

    def files_per_bucket() -> list[int]:
        out = []
        for name in sorted(os.listdir(store)):
            if name.startswith("udc_kb="):
                out.append(sum(1 for f in os.listdir(
                    os.path.join(store, name))
                    if f.endswith(".parquet")))
        return out

    walls, post_cadence_max = [], []
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
            t0 = time.perf_counter()
            q.processAllAvailable()
            walls.append(round(time.perf_counter() - t0, 3))
            if (i + 1) % cadence == 0:
                post_cadence_max.append(max(files_per_bucket()))
            print(f"  batch {i:02d}: {walls[-1]:.2f}s "
                  f"buckets_max={max(files_per_bucket())}", flush=True)
    finally:
        q.stop()

    shipped = spark.read.parquet(out_dir).select("text")
    n_shipped = shipped.count()
    n_distinct = shipped.distinct().count()
    n_input = (docs.filter(f"doc_id < {batches * rows}")
               .select("text").distinct().count())
    exact = (n_shipped == n_distinct == n_input)
    compacted = all(m == 1 for m in post_cadence_max)

    out = {"batches": batches, "batch_rows": rows, "cadence": cadence,
           "walls": walls, "post_cadence_bucket_max": post_cadence_max,
           "shipped": n_shipped, "shipped_distinct": n_distinct,
           "input_distinct": n_input, "exact": exact,
           "every_cadence_compacted": compacted}
    tag = os.environ.get("UDC_SOAK_TAG", "r17")
    path = os.path.join(REPO,
                        f"scale_probe/soak_cadence_posix_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"-- exact={exact} ({n_shipped} shipped, {n_input} distinct "
          f"input) every_cadence_compacted={compacted} -> {path}",
          flush=True)
    shutil.rmtree(work, ignore_errors=True)
    return 0 if (exact and compacted) else 1


if __name__ == "__main__":
    sys.exit(main())
