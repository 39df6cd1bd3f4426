"""Rotation-invariant auditor for the driver correctness window.

The driver oracles only the FIRST 50 `queries()` keys each round, so
`__spark_entry__._CHECK_FIRST` rotates per round to keep every key's
most recent driver evidence at most two rounds old. Every round the
judge recomputes the invariant from scratch (VERDICT r16-r18); this
tool mechanizes that computation so the builder, the test suite and
the judge all read ONE derivation:

* latest-evidence round per live catalog key across every
  CORRECTNESS_r*.json (a key counts as evidenced in a round iff its
  record is a full pass — rows+schema+hash True — or a rows-only
  execution: err == 'no_oracle' with spark_rows recorded);
* the three-way split (with 147 keys and a 50-key window the steady
  state is oldest:48 / middle:49 / newest:50);
* the STALE set (latest evidence older than the three most recent
  rounds) and the NEVER-EVIDENCED set — both must be empty;
* the prescribed NEXT window: the oldest-evidence cohort + the
  flagship (`pipeline_clean_corpus`, the every-round insurance row) +
  spares drawn from the middle cohort to reach 50 (spare CHOICE is
  judgment — this tool lists the eligible middle cohort rather than
  dictating one).

Usage: python tools/window_rotation.py          # report + exit 0/1
       python tools/window_rotation.py --check  # also assert the
           CURRENT _CHECK_FIRST window is exactly: oldest cohort +
           flagship + spares from the middle cohort, 50 keys total
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLAGSHIP = "pipeline_clean_corpus"


def _evidenced(rec: dict) -> bool:
    """A driver row counts as evidence iff it's a FULL pass or a
    rows-only key executing cleanly (the driver's weaker check for
    keys without oracle SQL)."""
    if rec.get("err") == "no_oracle":
        return isinstance(rec.get("spark_rows"), int)
    return bool(rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match"))


def latest_evidence(live_keys: set[str]) -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        data = json.load(open(path))
        for key, rec in data.items():
            if key in live_keys and _evidenced(rec):
                latest[key] = max(latest.get(key, 0), rnd)
    return latest


def main() -> int:
    from universal_data_connector_spark.plans.catalog import QUERIES

    live = set(QUERIES)
    latest = latest_evidence(live)
    never = sorted(live - set(latest))
    rounds = sorted({r for r in latest.values()}, reverse=True)
    newest3 = set(rounds[:3])
    stale = sorted(k for k, r in latest.items() if r not in newest3)
    split = {r: sorted(k for k, rr in latest.items() if rr == r)
             for r in sorted(newest3)}
    oldest = min(newest3)
    middle = sorted(newest3 - {oldest, max(newest3)})
    cohort = split[oldest]
    print(f"live keys: {len(live)}; latest-evidence split: "
          + " / ".join(f"r{r}:{len(split[r])}" for r in sorted(newest3)))
    print(f"stale (older than 3 newest rounds): {stale}")
    print(f"never-evidenced: {never}")
    n_spares = 50 - len(cohort) - (0 if FLAGSHIP in cohort else 1)
    print(f"next window = the {len(cohort)}-key r{oldest} cohort + "
          f"{FLAGSHIP} + {n_spares} spare(s) from the r{middle[0]} cohort"
          if middle else "")
    print("oldest cohort:", ", ".join(cohort))
    ok = not stale and not never
    if "--check" in sys.argv:
        import __spark_entry__ as e
        window = list(e._CHECK_FIRST)
        wset = set(window)
        well_formed = (len(window) == 50 and len(wset) == 50
                       and FLAGSHIP in wset and wset <= live)
        # Phase A — pre-rotation (or mid-round): _CHECK_FIRST is the
        # NEXT prescribed window: oldest cohort + flagship + spares
        # drawn from the middle cohort.
        missing = sorted(set(cohort) - wset)
        mid_keys = set(split[middle[0]]) if middle else set()
        extras = sorted(wset - set(cohort) - {FLAGSHIP} - mid_keys)
        phase_next = well_formed and not missing and not extras
        # Phase B — window-already-ran (VERDICT r19 wrong #1): the
        # driver just landed CORRECTNESS_r{newest}.json for THIS
        # window, which shifts the "next window" derivation above to
        # the following cohort. _CHECK_FIRST exactly equal to the
        # newest CORRECTNESS file's key set is evidence the current
        # window already executed — green, not stale. A genuinely
        # wrong window matches NEITHER phase and still fails.
        newest_keys = set(split[max(newest3)])
        phase_ran = well_formed and wset == newest_keys
        print(f"_CHECK_FIRST: {len(window)} keys; "
              f"oldest-cohort keys missing from it: {missing}; "
              f"keys that are neither cohort, flagship nor "
              f"middle-cohort spare: {extras}; "
              f"equals newest-evidence (r{max(newest3)}) key set: "
              f"{phase_ran}")
        if phase_next:
            print("window phase: NEXT (pre-rotation / mid-round)")
        elif phase_ran:
            print("window phase: ALREADY-RAN (driver artifact landed)")
        ok = ok and (phase_next or phase_ran)
    print("INVARIANT", "OK" if ok else "VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
