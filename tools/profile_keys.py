"""Per-key stage-level profiler for the bench headline keys.

Runs each named catalog key exactly as bench.py does (noop sink,
local[$SPARK_GRAFT_CPUS], sf0.1 by default) with the Spark UI enabled,
then pulls the per-job / per-stage metrics for that key's run window
from the UI REST API — so "where does the time go" (scan vs shuffle vs
Python eval vs job-count overhead) is answered from Spark's own
accounting instead of wall-clock guesswork.

Usage: python tools/profile_keys.py [key ...]   (default: a hot-key set)
Writes JSON to plans/$UDC_PLANS_DIR (default r22) profile_<key>.json and a summary to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT = [
    "agg_corr_exact", "ts_rollup_gapfill", "events_rfm_segments",
    "sim_search_lsh", "dedup_cluster_cc", "pipeline_training_data",
    "dedup_embedding_cosine", "market_basket_pairs", "dedup_near_minhash",
    "ts_outlier_iqr", "stream_upsert_latest", "agg_hash_sum_avg",
    "stream_agg_state_totals", "join_broadcast", "dq_fk_integrity",
    "agg_weighted_avg", "ts_anomaly_mad", "dedup_ngram_jaccard",
]


def api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    keys = sys.argv[1:] or HOT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from universal_data_connector_spark.plans.catalog import QUERIES

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("udc-profile")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedJobs", "5000")
             .config("spark.ui.retainedStages", "5000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        spark.catalog.clearCache()
        return el

    # warm-up (JVM, codegen, python workers)
    run("agg_hash_sum_avg")
    run(keys[0])

    os.makedirs(os.path.join(REPO, "plans", os.environ.get("UDC_PLANS_DIR", "r22")), exist_ok=True)
    for name in keys:
        before_jobs = {j["jobId"] for j in api(f"applications/{app_id}/jobs")}
        wall = run(name)
        jobs = [j for j in api(f"applications/{app_id}/jobs")
                if j["jobId"] not in before_jobs]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in api(f"applications/{app_id}/stages/{sid}"):
                    if att["status"] == "SKIPPED":
                        continue
                    stages.append({
                        "stageId": sid,
                        "name": att["name"].split("\n")[0][:140],
                        "status": att["status"],
                        "numTasks": att["numTasks"],
                        "executorRunTime_ms": att["executorRunTime"],
                        "executorCpuTime_ms": att.get("executorCpuTime", 0) // 1_000_000,
                        "shuffleReadBytes": att["shuffleReadBytes"],
                        "shuffleWriteBytes": att["shuffleWriteBytes"],
                        "inputBytes": att["inputBytes"],
                        "durationWall_ms": (
                            att.get("completionTime") is not None and
                            att.get("firstTaskLaunchedTime") is not None and
                            _ms(att["completionTime"], att["firstTaskLaunchedTime"]) or None),
                    })
            except Exception as exc:  # stage may have no attempts
                stages.append({"stageId": sid, "error": str(exc)})
        prof = {"key": name, "wall_sec": round(wall, 3),
                "n_jobs": len(jobs), "n_stages": len(stages),
                "stages": stages}
        out = os.path.join(REPO, "plans", os.environ.get("UDC_PLANS_DIR", "r22"), f"profile_{name}.json")
        with open(out, "w") as fh:
            json.dump(prof, fh, indent=1)
        top = sorted((s for s in stages if "error" not in s),
                     key=lambda s: -(s["durationWall_ms"] or 0))[:4]
        tops = "; ".join(
            f"{s['name'][:60]} wall={s['durationWall_ms']}ms "
            f"run={s['executorRunTime_ms']}ms tasks={s['numTasks']}"
            for s in top)
        print(f"{name:32s} wall={wall:6.3f}s jobs={len(jobs):3d} "
              f"stages={len(stages):3d} | {tops}", flush=True)
    spark.stop()


def _ms(end_iso: str, start_iso: str) -> int:
    from datetime import datetime
    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        e = datetime.strptime(end_iso.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        s = datetime.strptime(start_iso.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        return int((e - s).total_seconds() * 1000)
    except Exception:
        return 0


if __name__ == "__main__":
    main()
