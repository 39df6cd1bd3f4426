"""Re-run of the BENCH_NOTES_r14 §6 op-count table after the r15
executor-side transport (VERDICT r14 item 1 done-criterion: protocol
GET/PUT totals unchanged, data half moved off the driver).

Methodology: TOTAL requests are counted at the moto SERVER (a werkzeug
log handler sees every HTTP request from every process — driver and
executor workers alike), the DRIVER share with a counting client
wrapper; executor share = total - driver. Same shape as r14: 32-bucket
target, steady-state second agg merge, get/put object ops only
(list/head excluded on both sides, as in r14).

Usage: python tools/measure_s3_opcounts_r15.py
"""

from __future__ import annotations

import json
import logging
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _ReqCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.get = 0
        self.put = 0

    def emit(self, record):
        import re

        # strip ANSI color codes: werkzeug colorizes non-200 lines
        # (the intent probe is a 404), which otherwise hides that GET
        msg = re.sub(r"\x1b\[[0-9;]*m", "", record.getMessage())
        if '"GET ' in msg:
            self.get += 1
        elif '"PUT ' in msg:
            self.put += 1

    def reset(self):
        self.get = self.put = 0


class _CountingClient:
    def __init__(self, inner):
        self._inner = inner
        self.get = 0
        self.put = 0

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if name == "get_object":
            def g(*a, **k):
                self.get += 1
                return attr(*a, **k)
            return g
        if name == "put_object":
            def p(*a, **k):
                self.put += 1
                return attr(*a, **k)
            return p
        return attr

    def reset(self):
        self.get = self.put = 0


def main() -> int:
    import boto3
    from moto.server import ThreadedMotoServer
    from pyspark.sql import SparkSession

    from universal_data_connector_spark.streaming.object_state import (
        S3StateTarget,
        agg_state_merge_s3,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .appName("opcounts-r15").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    server = ThreadedMotoServer(port=0)
    server.start()
    port = server._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    creds = {"aws_access_key_id": "probe",
             "aws_secret_access_key": "probe",
             "region_name": "us-east-1"}
    raw = boto3.client("s3", endpoint_url=endpoint, **creds)
    raw.create_bucket(Bucket="opcounts")

    counter = _ReqCounter()
    logging.getLogger("werkzeug").addHandler(counter)

    rows_out = []
    try:
        for n_keys in (4, 400, 40000):
            driver = _CountingClient(raw)
            tgt = S3StateTarget(
                "opcounts", f"agg-{n_keys}", client=driver,
                num_buckets=32, endpoint_url=endpoint, **creds)
            frame = spark.createDataFrame(
                [(i, float(i)) for i in range(n_keys)],
                "user_id bigint, value double")
            # merge 1 seeds the store; merge 2 is the steady state
            agg_state_merge_s3(frame, 1, target=tgt, keys=["user_id"],
                               value_col="value")
            touched = sum(1 for b in range(tgt.num_buckets)
                          if tgt.read_pointer(b)[0] is not None)
            counter.reset()
            driver.reset()
            agg_state_merge_s3(frame, 2, target=tgt, keys=["user_id"],
                               value_col="value")
            rows_out.append({
                "batch_keys": n_keys, "touched": touched,
                "total_get": counter.get, "total_put": counter.put,
                "driver_get": driver.get, "driver_put": driver.put,
                "executor_get": counter.get - driver.get,
                "executor_put": counter.put - driver.put,
            })
            print(rows_out[-1], flush=True)
    finally:
        server.stop()
        logging.getLogger("werkzeug").removeHandler(counter)

    with open(os.path.join(REPO, "scale_probe/opcounts_r15.json"),
              "w") as fh:
        json.dump(rows_out, fh, indent=1)
    print(json.dumps(rows_out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
