"""r15 cluster-realism probe: the executor-side S3 store transport
under `local-cluster[2,4,2048]` — separate executor JVMs + their own
Python workers, i.e. real process/JVM boundaries between the driver
(which holds only client kwargs and the pointer CAS) and the tasks
that GET/PUT the data objects.

Proves, off the driver host path: (a) `S3StateTarget.client_kwargs`
ship to and reconstruct clients on real executors, (b) a 40k-key
upsert + agg merge round-trips byte-faithfully through
`write_objects`/`read_objects` across JVM boundaries, (c) the exact
seen store filters correctly across two batches. Records walls to
scale_probe/probe_r15_transport_localcluster.json.

Usage: python tools/probe_s3_transport_localcluster_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import boto3
    from moto.server import ThreadedMotoServer
    from pyspark.sql import SparkSession

    from universal_data_connector_spark.operators.dedup_state import (
        seen_filter_s3,
    )
    from universal_data_connector_spark.streaming.object_state import (
        S3StateTarget,
        agg_state_merge_s3,
        read_state_s3,
        upsert_merge_s3,
    )

    spark = (SparkSession.builder.master("local-cluster[2,4,2048]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("probe-r15-transport-cluster").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    server = ThreadedMotoServer(port=0)
    server.start()
    port = server._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    creds = {"aws_access_key_id": "probe",
             "aws_secret_access_key": "probe",
             "region_name": "us-east-1"}
    client = boto3.client("s3", endpoint_url=endpoint, **creds)
    client.create_bucket(Bucket="cluster-probe")
    out = {}

    try:
        # upsert: 40k keys, two merges, keep-latest read-back
        tgt = S3StateTarget("cluster-probe", "upsert", client=client,
                            num_buckets=32, endpoint_url=endpoint,
                            **creds)
        n = 40_000
        f1 = spark.range(n).selectExpr(
            "id as user_id", "cast(1 as bigint) ord",
            "cast(id as double) value")
        f2 = spark.range(0, n, 2).selectExpr(
            "id as user_id", "cast(2 as bigint) ord",
            "cast(-id as double) value")
        t0 = time.perf_counter()
        upsert_merge_s3(f1, 1, target=tgt, keys=["user_id"],
                        order_col="ord")
        out["upsert_merge1_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        upsert_merge_s3(f2, 2, target=tgt, keys=["user_id"],
                        order_col="ord")
        out["upsert_merge2_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        state = read_state_s3(
            spark, tgt, "user_id bigint, ord bigint, value double")
        agg = state.selectExpr(
            "count(*) n", "sum(case when ord = 2 then 1 else 0 end) upd",
            "sum(value) total").collect()[0]
        out["upsert_read_s"] = round(time.perf_counter() - t0, 2)
        assert agg["n"] == n and agg["upd"] == n // 2, agg
        # evens flipped negative at ord 2: total = sum(odds) - sum(evens)
        expect = sum(i for i in range(n) if i % 2) - sum(
            i for i in range(0, n, 2))
        assert int(agg["total"]) == expect, (agg["total"], expect)
        out["upsert_check"] = "ok"

        # agg_state: two additive merges, exact decimal totals
        tgt2 = S3StateTarget("cluster-probe", "agg", client=client,
                             num_buckets=32, endpoint_url=endpoint,
                             **creds)
        g = spark.range(n).selectExpr("id % 1000 as user_id",
                                      "cast(1.5 as double) value")
        t0 = time.perf_counter()
        agg_state_merge_s3(g, 1, target=tgt2, keys=["user_id"],
                           value_col="value")
        agg_state_merge_s3(g, 2, target=tgt2, keys=["user_id"],
                           value_col="value")
        out["agg_two_merges_s"] = round(time.perf_counter() - t0, 2)
        tot = read_state_s3(
            spark, tgt2,
            "user_id bigint, n bigint, total decimal(27,6)"
        ).selectExpr("sum(n) n", "sum(total) t").collect()[0]
        assert tot["n"] == 2 * n and float(tot["t"]) == 1.5 * 2 * n, tot
        out["agg_check"] = "ok"

        # exact seen store: two batches, half-overlap
        tgt3 = S3StateTarget("cluster-probe", "seen", client=client,
                             num_buckets=32, endpoint_url=endpoint,
                             **creds)
        d1 = spark.range(10_000).selectExpr(
            "id as doc_id", "concat('doc-', id) text")
        d2 = spark.range(5_000, 15_000).selectExpr(
            "id as doc_id", "concat('doc-', id) text")
        t0 = time.perf_counter()
        s1, c1 = seen_filter_s3(d1, tgt3, ["text"])
        assert s1.count() == 10_000
        c1()
        s2, c2 = seen_filter_s3(d2, tgt3, ["text"])
        got = s2.count()
        c2()
        out["seen_two_batches_s"] = round(time.perf_counter() - t0, 2)
        assert got == 5_000, got
        out["seen_check"] = "ok"
    finally:
        server.stop()

    path = os.path.join(
        REPO, "scale_probe/probe_r15_transport_localcluster.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
