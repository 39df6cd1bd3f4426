"""Scale probe: execute the scale-critical chains at sf0.1 AND sf1.0
on data from ONE generator and record wall-clock + shuffle + spill
(VERDICT r10 item 2 — "measure the 100x claims").

Both directories come from tools/gen_scale_probe_data.py (seed 42), so
the sf1/sf0.1 wall-clock ratio is an apples-to-apples scaling factor:
~10x data through the same plans. A ratio well above ~10 (beyond the
extra shuffle-wave constant) flags a superlinear operator; spill bytes
flag partitions outgrowing memory.

Shuffle/spill come from the Spark status REST API (the probe session
enables the UI; `session.get_spark` keeps it off for bench runs), as
per-stage deltas between queries.

Usage: python tools/scale_probe.py [reps] [sf ...]
(defaults: 2 reps over sf0.1 and sf1 — pass e.g. `2 0.1 1 10` for a
three-point curve). Writes scale_probe/probe_results.json and prints
a summary table; ratios are reported against the SMALLEST sf given.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_KEYS = [
    # the five chains the verdict names, + embeddings/events coverage
    "pipeline_clean_corpus",
    "pipeline_training_data",
    "dedup_near_minhash",
    "dedup_cluster_cc",
    "events_rfm_segments",      # drives exact_group_percentiles
    "market_basket_pairs",
    "agg_percentile_exact",
    "sim_search_lsh",
    "events_sessionize_gap",
    # second wave (r11 review): state sink, brute/banded ANN, rollup
    # spine join, TF-IDF, exact dedup, big-join coverage
    "stream_upsert_latest",     # foreachBatch bucket-swap state sink
    "dedup_exact",
    "dedup_embedding_cosine",
    "sim_search_cosine_topk",
    "ts_rollup_gapfill",
    "text_tfidf_topk",
    "join_inner_hash",          # the plain big-big shuffle join
    # round 12: the retirement-swap key's scale posture (two range
    # window frames + rollup on one user partitioning)
    "events_window_funnel_conversion",
    # round 14 (VERDICT r13 item 4): the decimal moment-sum aggregate —
    # map-side partials into one groupBy shuffle; probed under
    # local-cluster to confirm the exact-decimal accumulators pay no
    # serialization penalty across real executor processes
    "agg_stats_moments",
    # round 12: capped variant of the embedding near-dup chain —
    # same plan as dedup_embedding_cosine but with the per-bucket
    # candidate cap engaged, so its shuffle delta vs the uncapped key
    # MEASURES how much of the quadratic within-cluster candidate
    # tail the cap removes (VERDICT r11 item 4)
    "dedup_embedding_cosine_cap64",
]


def _embedding_cosine_cap64(spark, sf_dir):
    from pyspark.sql import functions as F

    from universal_data_connector_spark.operators.similarity import (
        lsh_near_dup_pairs,
    )
    from universal_data_connector_spark.tables import load

    e = load(spark, sf_dir, "embeddings")
    return lsh_near_dup_pairs(e, threshold=0.95, bucket_cap=64) \
        .select("id_1", "id_2")


CUSTOM_CHAINS = {"dedup_embedding_cosine_cap64": _embedding_cosine_cap64}


def stage_totals(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    # generous timeout + retry: the first status-API hit after session
    # start can exceed 10s while Jersey + the status store warm up
    # (observed under local-cluster, where it killed the whole probe)
    last_err = None
    for attempt in range(3):
        try:
            with urllib.request.urlopen(url, timeout=60) as fh:
                stages = json.load(fh)
            break
        except Exception as e:   # noqa: BLE001 - retried, then re-raised
            last_err = e
            time.sleep(2 * (attempt + 1))
    else:
        raise last_err
    # dedupe to the LAST attempt per stage: summing every attempt
    # double-counts retried stages (ADVICE r11)
    latest: dict[int, tuple[int, dict]] = {}
    for s in stages:
        sid, att = s["stageId"], s.get("attemptId", 0)
        if sid not in latest or att > latest[sid][0]:
            latest[sid] = (att, s)
    kept = [s for _, s in latest.values()]
    return {
        "n_stages": len(kept),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in kept),
        "spill_disk": sum(s.get("diskBytesSpilled", 0) for s in kept),
        "spill_mem": sum(s.get("memoryBytesSpilled", 0) for s in kept),
        "input": sum(s.get("inputBytes", 0) for s in kept),
    }


def settled_stage_totals(spark, timeout: float = 6.0) -> dict:
    """Stage-completion events reach the status store through the
    async listener bus, so a snapshot taken the instant an action
    returns can miss that action's last stages (they would then be
    mis-attributed to the NEXT query's delta — ADVICE r11). Poll until
    two consecutive reads agree, bounded by `timeout`."""
    prev = stage_totals(spark)
    deadline = time.perf_counter() + timeout
    while time.perf_counter() < deadline:
        time.sleep(0.25)
        cur = stage_totals(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


def main() -> None:
    # env knobs for driving long multi-sf curves in bounded slices:
    # SPARK_GRAFT_PROBE_KEYS=k1,k2 subsets PROBE_KEYS;
    # SPARK_GRAFT_PROBE_OUT names the results file.
    keys = PROBE_KEYS
    if os.environ.get("SPARK_GRAFT_PROBE_KEYS"):
        want = os.environ["SPARK_GRAFT_PROBE_KEYS"].split(",")
        keys = [k for k in want if k in PROBE_KEYS] or PROBE_KEYS
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sfs = [float(a) for a in sys.argv[2:]] or [0.1, 1.0]
    sfs.sort()
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_probe")
    dirs = {f"sf{sf:g}": os.path.join(root, f"sf{sf:g}") for sf in sfs}
    base_label = f"sf{sfs[0]:g}"
    top_label = f"sf{sfs[-1]:g}"
    for d in dirs.values():
        if not os.path.isdir(d):
            raise SystemExit(f"{d} missing - run gen_scale_probe_data.py")

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_MASTER overrides the master URL (VERDICT r11 item 3:
    # e.g. `local-cluster[4,8,28672]` = 4 worker JVMs x 8 cores x
    # 28 GiB — real executor processes, so the big shuffles pay actual
    # serialization + loopback network transfer instead of local[32]'s
    # in-process block handoff). Executor python workers need the repo
    # importable, hence the PYTHONPATH propagation.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    builder = (SparkSession.builder.master(master)
               .appName("udc-scale-probe")
               .config("spark.sql.shuffle.partitions", cpus)
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.driver.memory",
                       os.environ.get("SPARK_DRIVER_MEM", "48g"))
               .config("spark.executorEnv.PYTHONPATH", repo)
               .config("spark.ui.enabled", "true")
               .config("spark.ui.port", "4097")
               # the probe's before/after stage deltas are only truthful
               # while NO completed stage is evicted mid-measurement; the
               # default retainedStages=1000 can evict during the
               # multi-job sf1.0 chains (review finding r11)
               .config("spark.ui.retainedStages", "100000"))
    if master.startswith("local-cluster"):
        # worker mem spec is the third bracket field (MiB); size the
        # executors to it so the cluster actually schedules
        mem_mb = master.rstrip("]").split(",")[-1]
        builder = builder.config("spark.executor.memory", f"{mem_mb}m")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from universal_data_connector_spark.plans.catalog import QUERIES

    # warm-up: JVM, codegen, python worker pool
    QUERIES["agg_hash_sum_avg"](spark, dirs[base_label]) \
        .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    results: dict[str, dict] = {}
    for key in keys:
        results[key] = {}
        for sf_label, sf_dir in dirs.items():
            samples, met0 = [], None
            for _ in range(reps):
                fn = CUSTOM_CHAINS.get(key) or QUERIES[key]
                before = settled_stage_totals(spark)
                t0 = time.perf_counter()
                fn(spark, sf_dir) \
                    .write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                after = settled_stage_totals(spark)
                spark.catalog.clearCache()
                samples.append(dt)
                if met0 is None:
                    met0 = {k: after[k] - before[k] for k in after
                            if k != "n_stages"}
            results[key][sf_label] = {
                "sec_min": round(min(samples), 3),
                "sec_all": [round(s, 3) for s in samples],
                **{k: met0[k] for k in
                   ("shuffle_write", "spill_disk", "spill_mem", "input")},
            }
            print(f"{key:32s} {sf_label}: {min(samples):7.2f}s "
                  f"shuffle={met0['shuffle_write']/1e6:9.1f}MB "
                  f"spill={met0['spill_disk']/1e6:6.1f}MB", flush=True)

    for key, r in results.items():
        a, b = r[base_label]["sec_min"], r[top_label]["sec_min"]
        r["scaling_x"] = round(b / a, 2) if a > 0 else None
    out = os.environ.get("SPARK_GRAFT_PROBE_OUT",
                         os.path.join(root, "probe_results.json"))
    with open(out, "w") as fh:
        json.dump({"reps": reps, "cpus": int(cpus),
                   "spark": spark.version, "results": results}, fh, indent=1)
    hdr = " ".join(f"{lbl:>8s}" for lbl in dirs)
    print(f"\n{'key':32s} {hdr} {'ratio':>6s}")
    for key, r in results.items():
        row = " ".join(f"{r[lbl]['sec_min']:8.2f}" for lbl in dirs)
        print(f"{key:32s} {row} {r['scaling_x']:6.2f}")
    print(f"\nwrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
