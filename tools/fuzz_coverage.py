"""Mechanical audit of differential-fuzz coverage over the catalog.

The fuzz campaign's claim — "every catalog key swept by at least one
differential/NULL-injection case" (VERDICT r13 item 2's done-criterion)
— should be checkable, not asserted. This tool derives it from source:

- TARGETED coverage: a key's name appears as a string literal in one of
  the campaign's test files (waves 1-3), i.e. a generator built an
  adversarial table specifically for the family containing that key.
- CARDINALITY coverage: the wave-3f sweep iterates ``ORACLES``
  wholesale, so every oracled key additionally runs on 0-row and 1-row
  inputs regardless of whether it is named anywhere.

Output: one JSON object to ``FUZZCOV.json`` and a human summary to
stdout. Exit 1 if any catalog key has NO coverage of either kind.

Run:  python tools/fuzz_coverage.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The fuzz campaign's files, in wave order. Only these count: a key
# name appearing in an ordinary unit test elsewhere is not fuzz.
WAVE_FILES = [
    "tests/test_round12_fixes.py",   # wave 1: events/documents/lineitem/orders/join families
    "tests/test_round12_fuzz2.py",   # wave 2: events batch keys, tpch dims, NULL joins
    "tests/test_round14_fuzz3.py",   # wave 3: long tails, streaming, rows-only, cardinality
]

# Wave-3f iterates ORACLES wholesale — every oracled key gets the
# 0-row/1-row cardinality sweep without being named.
CARDINALITY_SWEEP_FILE = "tests/test_round14_fuzz3.py"


def main() -> int:
    sys.path.insert(0, str(REPO))
    from universal_data_connector_spark.plans.catalog import ORACLES, QUERIES

    keys = sorted(QUERIES)
    string_lit = re.compile(r"[\"']([a-z0-9_]+)[\"']")

    targeted: dict[str, list[str]] = {k: [] for k in keys}
    for rel in WAVE_FILES:
        text = (REPO / rel).read_text()
        found = set(string_lit.findall(text))
        for k in keys:
            if k in found:
                targeted[k].append(rel)

    report = {
        k: {
            "targeted": targeted[k],
            "cardinality_swept": k in ORACLES,
            "oracled": k in ORACLES,
        }
        for k in keys
    }
    uncovered = [k for k, r in report.items()
                 if not r["targeted"] and not r["cardinality_swept"]]
    untargeted = [k for k, r in report.items() if not r["targeted"]]

    summary = {
        "catalog_keys": len(keys),
        "targeted_covered": len(keys) - len(untargeted),
        "cardinality_swept": sum(r["cardinality_swept"] for r in report.values()),
        "uncovered": uncovered,
        "untargeted_but_cardinality_swept": sorted(untargeted),
        "wave_files": WAVE_FILES,
        "keys": report,
    }
    (REPO / "FUZZCOV.json").write_text(json.dumps(summary, indent=1))

    print(f"catalog keys:            {summary['catalog_keys']}")
    print(f"targeted fuzz coverage:  {summary['targeted_covered']}")
    print(f"cardinality-swept:       {summary['cardinality_swept']}")
    if untargeted:
        print(f"untargeted (cardinality only): {sorted(untargeted)}")
    if uncovered:
        print(f"UNCOVERED: {uncovered}")
        return 1
    print("every catalog key is fuzz-covered")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
