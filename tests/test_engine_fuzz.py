"""Differential fuzzing of the §2A pipeline ENGINE surface.

The round-12/14 campaigns fuzz the catalog keys against DuckDB; this
file fuzzes the reference-parity engine itself (file source -> T1
filter / T2 map -> file sink, `engine.py`) against a pure-Python MODEL
of the reference contract (`PipelineBuilder.java:42-116` semantics as
documented in SURVEY §2A/§7.4): literal-substring matching (never
regex — conditions here include regex metacharacters to prove it),
whole-file keep/drop, case-insensitive header binding with trimmed
fields, blank/short data rows never matching, row-granularity rebuild
as header + matching rows in original order, and prefix/suffix
mapping. Random files include CRLF line endings, trailing-newline-free
files, unicode content, extra-field rows, and files whose every row
misses.

Scope: unquoted CSV fields (the RFC-4180 quoted-comma divergence from
the reference's naive split is a DOCUMENTED intentional divergence,
SURVEY §7.4.2 — quoting behavior is pinned separately in
test_engine_pipelines.py).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

from universal_data_connector_spark.engine import run
from tests.test_engine_pipelines import _pipeline


# --- the reference-contract model -----------------------------------------

def _model_csv_file_match(content: str, column: str, condition: str) -> bool:
    lines = re.split(r"\r?\n", content)
    if not lines:
        return False
    header = [h.strip().lower() for h in lines[0].split(",")]
    col = column.strip().lower()
    if col not in header:
        return False
    idx = header.index(col)
    for line in lines[1:]:
        if not line.strip():
            continue
        fields = line.split(",")
        if len(fields) < len(header):
            continue
        if condition in fields[idx].strip():
            return True
    return False


def _model_csv_row_rebuild(content: str, column: str,
                           condition: str) -> str | None:
    lines = re.split(r"\r?\n", content)
    header = [h.strip().lower() for h in lines[0].split(",")]
    col = column.strip().lower()
    if col not in header:
        return None
    idx = header.index(col)
    kept = [ln for ln in lines[1:]
            if ln.strip() and len(ln.split(",")) >= len(header)
            and condition in ln.split(",")[idx].strip()]
    if not kept:
        return None
    return lines[0] + "\n" + "\n".join(kept)


# --- generators -----------------------------------------------------------

_WORDS = ["alpha", "Beta", "give.me", "x[1]", "a*b", "  pad  ", "über",
          "important", "IMPORTANT", "imp", "nope", "42", ""]
_CONDITIONS = ["important", "a*b", "x[1]", "give.me", "p", "42"]


def _random_csv(rng) -> str:
    headers = rng.choice(["status", "Status", " STATUS ", "other"],
                         size=3, replace=False)
    n_rows = int(rng.integers(0, 7))
    lines = [",".join(headers)]
    for _ in range(n_rows):
        shape = rng.random()
        if shape < 0.1:
            lines.append("")                      # blank line
        elif shape < 0.2:
            lines.append(str(rng.choice(_WORDS))) # short row
        else:
            n_fields = 3 + (1 if shape > 0.9 else 0)  # extra-field row
            lines.append(",".join(str(rng.choice(_WORDS))
                                  for _ in range(n_fields)))
    sep = "\r\n" if rng.random() < 0.3 else "\n"
    tail = sep if rng.random() < 0.5 else ""
    return sep.join(lines) + tail


def _random_txt(rng) -> str:
    n = int(rng.integers(0, 5))
    body = "\n".join(" ".join(str(rng.choice(_WORDS))
                              for _ in range(int(rng.integers(0, 6))))
                     for _ in range(n))
    return body + ("\n" if rng.random() < 0.6 else "")


# --- the fuzz -------------------------------------------------------------

@pytest.mark.parametrize("seed", [37, 103])
def test_engine_csv_filter_differential_fuzz(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    condition = str(rng.choice(_CONDITIONS))
    files = {f"f{i}.csv": _random_csv(rng) for i in range(6)}
    for gran in ("file", "row"):
        inp = tmp_path / f"in_{gran}"
        out = tmp_path / f"out_{gran}"
        inp.mkdir(), out.mkdir()
        for name, content in files.items():
            (inp / name).write_text(content)
        props = {"column": "status", "condition": condition}
        if gran == "row":
            props["granularity"] = "row"
        cfg = _pipeline("fz", {"path": str(inp), "pattern": "*.csv"},
                        {"path": str(out), "extension": ".csv"},
                        [{"type": "filter", "properties": props}])
        run(spark, cfg)
        if gran == "file":
            # the sink writes content + trailing newline when missing
            # (reference FileSinkContext contract, sinks/files.py)
            want = {n: c if c.endswith("\n") else c + "\n"
                    for n, c in files.items()
                    if _model_csv_file_match(c, "status", condition)}
        else:
            want = {n: _model_csv_row_rebuild(c, "status", condition)
                    for n, c in files.items()}
            want = {n: c for n, c in want.items() if c is not None}
        # read_bytes: Path.read_text applies universal-newline
        # translation and would mask a CRLF-corrupting engine (the
        # engine preserves CRLF byte-for-byte on whole-file keep)
        got = {n: (out / n).read_bytes().decode()
               for n in os.listdir(out)}
        if gran == "row":
            # the rebuilt content is newline-joined with no trailing
            # newline; normalize only the sink's trailing byte
            got = {n: c.rstrip("\n") for n, c in got.items()}
            want = {n: c.rstrip("\n") for n, c in want.items()}
        assert got == want, f"gran={gran} cond={condition!r}"


@pytest.mark.parametrize("seed", [53, 107])
def test_engine_txt_filter_map_differential_fuzz(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    condition = str(rng.choice(_CONDITIONS))
    prefix, suffix = ">> ", " <<"
    files = {f"t{i}.txt": _random_txt(rng) for i in range(6)}
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir(), out.mkdir()
    for name, content in files.items():
        (inp / name).write_text(content)
    cfg = _pipeline(
        "fz", {"path": str(inp), "pattern": "*.txt"},
        {"path": str(out), "extension": ".txt"},
        [{"type": "filter", "properties": {"condition": condition}},
         {"type": "map", "properties": {"prefix": prefix,
                                        "suffix": suffix}}])
    run(spark, cfg)
    want = {n: prefix + c + suffix + "\n"   # sink's trailing newline
            for n, c in files.items() if condition in c}
    got = {n: (out / n).read_bytes().decode() for n in os.listdir(out)}
    assert got == want, f"cond={condition!r}"
