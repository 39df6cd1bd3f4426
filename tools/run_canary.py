"""One sf0.1 bench canary with /proc/stat steal-time bookkeeping.

Round 19 adjudicated every headline regression as ambient host
contention, and the judge asked (VERDICT r19 item 3) that every future
canary record the hypervisor steal-time delta alongside its walls so
those adjudications stay evidence-backed rather than asserted. This
wrapper runs ``bench.py`` exactly as the driver does (sf0.1,
local[32]) and writes the bench JSON augmented with:

* ``steal_jiffies_before`` / ``steal_jiffies_after`` / ``steal_delta``
  (field 8 of /proc/stat's aggregate cpu line — time this guest's
  vCPUs were runnable but not scheduled by the host);
* ``wall_sec`` for the whole bench process, so steal_delta can be
  read as a rate.

Usage: python tools/run_canary.py BENCH_NOTES_r20_canaryA.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_steal() -> int | None:
    try:
        with open("/proc/stat") as fh:
            fields = fh.readline().split()
        # cpu  user nice system idle iowait irq softirq steal ...
        return int(fields[8])
    except (OSError, IndexError, ValueError):
        return None


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    before = read_steal()
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO)
    wall = time.perf_counter() - t0
    after = read_steal()
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        return proc.returncode
    # Scan from the end for the first line that parses as a JSON
    # object — a trailing JVM shutdown/log line must not discard a
    # multi-minute bench run (ADVICE r20).
    data = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict):
            data = parsed
            break
    if data is None:
        sys.stderr.write("no JSON object line in bench stdout:\n")
        sys.stderr.write(proc.stdout[-2000:])
        return 1
    data["steal_jiffies_before"] = before
    data["steal_jiffies_after"] = after
    data["steal_delta"] = (after - before
                           if before is not None and after is not None
                           else None)
    data["wall_sec"] = round(wall, 1)
    body = json.dumps(data, indent=1)
    if out_path:
        with open(os.path.join(REPO, out_path), "w") as fh:
            fh.write(body)
        print(f"-> {out_path}: headline {data.get('value')} s, "
              f"steal_delta {data['steal_delta']} jiffies over "
              f"{data['wall_sec']} s")
    else:
        print(body)
    return 0


if __name__ == "__main__":
    sys.exit(main())
