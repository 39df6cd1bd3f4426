"""Regression tests for the round-1 ADVICE findings.

Each test pins the corrected behavior:

* stop(job_name) cancels ONLY that pipeline's Spark jobs (job-group
  scoped, the reference's per-job stopPipeline semantics,
  PipelineManager.java:74-81) and leaves a terminal CANCELLED state.
* directory_source path stripping treats the configured base path as a
  literal, not a regex (DirectorySourceContext.java:110-121).
* as-of join is deterministic under (key, ts) ties via an explicit
  tiebreak key.
* lenient_long preserves exact integers above 2^53
  (ParquetSinkContext.java:409 Long.parseLong first).
* file-mode filter with a column only CSV-parses TYPE=CSV items; other
  types fall back to whole-item contains, and field values are trimmed
  before matching (PipelineBuilder.java:42-83).
"""

from __future__ import annotations

import os
import textwrap
import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from universal_data_connector_spark.config import parse_config
from universal_data_connector_spark.engine import run
from universal_data_connector_spark.functions.casts import lenient_long
from universal_data_connector_spark.manager import PipelineManager
from universal_data_connector_spark.operators.relational import as_of_join
from universal_data_connector_spark.sources.files import directory_source


def _write(path: str, content: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)
    return path


def test_stop_cancels_only_named_job(spark, tmp_path):
    """Stopping a slow batch pipeline must not cancel a concurrently
    running one, and must leave the stopped job in a terminal state."""
    inp_a, out_a = str(tmp_path / "ia"), str(tmp_path / "oa")
    inp_b, out_b = str(tmp_path / "ib"), str(tmp_path / "ob")
    _write(f"{inp_a}/slow.txt", "slow\n")
    _write(f"{inp_b}/fast.txt", "fast\n")

    def sleepy(s: str) -> str:
        time.sleep(300)
        return s

    spark.udf.register("udc_test_sleepy", sleepy)

    def pipe(name, inp, out, transformations=()):
        return parse_config({"pipelines": [{
            "name": name,
            "source": {"type": "file", "properties": {"path": inp}},
            "transformations": [dict(t) for t in transformations],
            "sink": {"type": "file", "properties": {"path": out, "extension": ".txt"}},
        }]}).pipelines[0]

    slow_cfg = pipe("slow", inp_a, out_a, [{"type": "sql", "properties": {
        "query": "SELECT source_file, file_type, "
                 "udc_test_sleepy(content) AS content FROM _input"}}])
    fast_cfg = pipe("fast", inp_b, out_b)

    mgr = PipelineManager(spark)
    slow_name = mgr.start_pipeline(slow_cfg, streaming=False)
    time.sleep(3)  # let the slow job actually submit Spark stages
    fast_name = mgr.start_pipeline(fast_cfg, streaming=False)

    deadline = time.time() + 120
    while mgr.is_running(fast_name) and time.time() < deadline:
        time.sleep(0.5)
    # the fast pipeline completed while the slow one still runs
    assert not mgr.is_running(fast_name)
    assert next(j for j in mgr.jobs() if j["name"] == fast_name)["status"] == "COMPLETED"
    assert mgr.is_running(slow_name)
    assert os.listdir(out_b) == ["fast.txt"]

    assert mgr.stop(slow_name)
    assert next(j for j in mgr.jobs() if j["name"] == slow_name)["status"] == "CANCELLED"
    job = mgr._jobs[slow_name]
    job.thread.join(60)
    assert not job.thread.is_alive(), "cancelled job's thread did not unwind"
    # terminal state survives the thread observing the cancellation
    assert job.status == "CANCELLED"
    assert mgr.status()["runningCount"] == 0


def test_directory_source_literal_base_path(spark, tmp_path):
    """A configured path containing regex metacharacters must strip
    literally (was: regexp_replace on the raw path -> runtime error or
    mis-replacement)."""
    # '(', ')', '+', '.' are regex metachars but not glob chars (Spark
    # load paths are globs, so glob chars can't appear in a real path)
    base = tmp_path / "in (v1)+.dir"
    _write(str(base / "sub" / "a.bin"), "payload")
    df = directory_source(spark, {"path": str(base), "preserveStructure": "true"})
    rows = df.collect()
    assert [r.source_file for r in rows] == ["sub/a.bin"]
    assert rows[0].file_type == "BINARY"


def test_as_of_join_deterministic_on_ties(spark):
    """Two right rows tied on (key, ts): the tiebreaker column decides,
    identically on every run/partitioning."""
    left = spark.createDataFrame([Row(k=1, lts=10)])
    right = spark.createDataFrame(
        [Row(k=1, rts=5, rid=7), Row(k=1, rts=5, rid=9), Row(k=1, rts=2, rid=1)])
    out = as_of_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     tiebreakers=["rid"]).select("rid").collect()
    assert [r.rid for r in out] == [9]  # max rid wins among ts ties


def test_lenient_long_exact_above_2_53(spark):
    big = (1 << 62) + 1  # not representable as a double
    df = spark.createDataFrame(
        [(str(big),), ("42.7",), ("  17 ",), ("junk",), ("-",)], "s string")
    got = [r.v for r in df.select(lenient_long(F.col("s")).alias("v")).collect()]
    assert got == [big, 42, 17, None, None]


def test_file_filter_text_fallback_and_trim(spark, tmp_path):
    """Column-configured filter: TEXT items use whole-content contains
    (the reference only CSV-parses TYPE=CSV); CSV field values are
    trimmed before the contains check."""
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    # CSV whose 'status' values carry trailing spaces -> must still match
    _write(f"{inp}/padded.csv", textwrap.dedent("""\
        id,status
        1,  important
        2,normal
        """))
    # TEXT file containing the condition anywhere -> kept via fallback
    _write(f"{inp}/note.txt", "an important note\n")
    # TEXT file without it -> dropped
    _write(f"{inp}/other.txt", "nothing here\n")
    cfg = parse_config({"pipelines": [{
        "name": "gate",
        "source": {"type": "file", "properties": {"path": inp}},
        "transformations": [{"type": "filter", "properties": {
            "column": "status", "condition": "important"}}],
        "sink": {"type": "file", "properties": {"path": out, "extension": ""}},
    }]}).pipelines[0]
    run(spark, cfg)
    assert sorted(os.listdir(out)) == ["note.txt", "padded.csv"]


def test_filter_on_binary_directory_source(spark, tmp_path):
    """Directory-source frames carry BinaryType content; both filter
    branches (whole-item and column-aware CSV) must decode and match."""
    from universal_data_connector_spark.engine import apply_transformations
    from universal_data_connector_spark.config import TransformationConfig
    from universal_data_connector_spark.sources.files import directory_source
    base = tmp_path / "bin"
    _write(str(base / "match.csv"), "id,status\n1,important\n")
    _write(str(base / "nomatch.csv"), "id,status\n2,normal\n")
    _write(str(base / "note.bin"), "important binary payload")
    df = directory_source(spark, {"path": str(base)})
    whole = apply_transformations(df, [TransformationConfig(
        type="filter", properties={"condition": "important"})])
    assert {r.source_file for r in whole.collect()} == {"match.csv", "note.bin"}
    col = apply_transformations(df, [TransformationConfig(
        type="filter", properties={"column": "status", "condition": "important"})])
    assert {r.source_file for r in col.collect()} == {"match.csv", "note.bin"}


def test_record_mode_filter_missing_column_drops_all(spark):
    """Record-mode filter on a nonexistent column: the reference's
    error->drop path (empty result), with case-insensitive resolution
    for columns that do exist."""
    from universal_data_connector_spark.config import TransformationConfig
    from universal_data_connector_spark.engine import apply_transformations
    df = spark.createDataFrame([(1, "Alpha"), (2, "beta")], "id bigint, Name string")
    ok = apply_transformations(df, [TransformationConfig(
        type="filter", properties={"column": "name", "condition": "Alp"})])
    assert [r.id for r in ok.collect()] == [1]
    gone = apply_transformations(df, [TransformationConfig(
        type="filter", properties={"column": "nope", "condition": "x"})])
    assert gone.count() == 0
