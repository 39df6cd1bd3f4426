"""CLI autostart: ``python -m universal_data_connector_spark.cli
--config pipeline-config.yaml [--once]``.

Mirrors the reference's boot-time autostart
(``PipelineApplication.java:26-35`` loads
``pipeline-config/pipeline-config.yaml`` on startup).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from universal_data_connector_spark.manager import PipelineManager
from universal_data_connector_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="universal_data_connector_spark")
    ap.add_argument("--config", required=True, help="pipeline YAML path")
    ap.add_argument("--once", action="store_true",
                    help="run batch pipelines to completion and exit")
    ap.add_argument("--cpus", default=None, help="local[N] parallelism")
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="expose the REST control plane on this port "
                         "(the reference's PipelineController API)")
    ap.add_argument("--compact-stores", action="store_true",
                    help="instead of running pipelines, compact every "
                         "dedup_state store the config references "
                         "(offline maintenance — do not run while a "
                         "pipeline is writing the same store), then "
                         "exit")
    ap.add_argument("--vacuum-stores", action="store_true",
                    help="instead of running pipelines, vacuum every "
                         "object-store upsert/agg_state target the "
                         "config references (reclaims generations no "
                         "pointer references; offline maintenance), "
                         "then exit")
    args = ap.parse_args(argv)

    spark = get_spark("udc-cli", cpus=args.cpus)
    if args.compact_stores or args.vacuum_stores:
        from universal_data_connector_spark.config import load_config
        cfg = load_config(args.config)
        rc = 0
        if args.compact_stores:
            rc = _compact_stores(spark, cfg)
        if args.vacuum_stores:
            rc = rc or _vacuum_stores(cfg)
        return rc
    mgr = PipelineManager(spark)
    server = None
    if args.serve is not None:
        from universal_data_connector_spark.rest import serve
        server = serve(mgr, port=args.serve)
        print(json.dumps({"control_plane": f"http://127.0.0.1:{server.port}"}))
    from universal_data_connector_spark.config import load_config
    cfg = load_config(args.config)
    started = mgr.start_all(cfg)
    print(json.dumps({"started": started}))

    if args.once:
        ok = mgr.wait()
        for q in spark.streams.active:
            q.processAllAvailable()
            q.stop()
        print(json.dumps({"jobs": mgr.jobs()}))
        # a pipeline that failed at BUILD never started (per-pipeline
        # isolation in start_all, mirroring the reference's try/catch
        # boundary) — a batch invocation must still exit non-zero, or
        # a config typo looks like a clean no-op run to schedulers.
        # Count from the SAME parse start_all used: a re-read here
        # would race a concurrent config edit (mask a failure, fail a
        # success, or traceback on a deleted file).
        all_started = len(started) == len(cfg.pipelines)
        return 0 if (ok and all_started
                     and all(j["status"] != "FAILED"
                             for j in mgr.jobs())) else 1

    try:
        while True:
            time.sleep(5)
    except KeyboardInterrupt:
        mgr.stop_all()
    finally:
        if server is not None:
            server.stop()
    return 0


def _vacuum_stores(cfg) -> int:
    """CLI wrapper over ``maintenance.vacuum_stores`` (prints the
    summary the way the run path prints job JSON)."""
    from universal_data_connector_spark.maintenance import vacuum_stores

    print(json.dumps({"vacuumed": vacuum_stores(cfg)}))
    return 0


def _compact_stores(spark, cfg) -> int:
    """CLI wrapper over ``maintenance.compact_stores``."""
    from universal_data_connector_spark.maintenance import (
        compact_stores,
    )

    print(json.dumps({"compacted": compact_stores(spark, cfg)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
