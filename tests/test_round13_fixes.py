"""Round-13 fixes, each pinned by a test:

1. `decoded_uri_path_col` degradation contract (ADVICE r12): the
   Spark-version assumption (metadata columns are URI-encoded) is
   pinned by an on-disk round-trip, and a malformed percent sequence
   now degrades to the raw spelling via try_url_decode + coalesce
   instead of raising mid-pipeline.
2. `release_frames` contract observability (ADVICE r12): releasing a
   pinned frame whose consuming action never ran logs an info line
   (the BUILD-then-ACT contract of plans/catalog.query is observable
   at runtime, not just documented).

The third r13 ADVICE item (bucket_cap one-materialization audit) is
pinned in tests/test_dedup.py::
test_embedding_cosine_dedup_bucket_cap_bounds_dense_cluster (e).
"""

from __future__ import annotations

import logging

from pyspark.sql import functions as F


def test_uri_decode_roundtrip_pins_encoding_assumption(spark, tmp_path):
    """A file named with a space MUST surface URI-encoded in the raw
    text-source metadata on this Spark version (that is the assumption
    `decoded_uri_path_col` exists to reverse), and decoded back to the
    literal on-disk name after it. A Spark upgrade that changes the
    metadata spelling fails HERE, loudly, instead of silently mangling
    sink filenames."""
    p = tmp_path / "report final v2.txt"
    p.write_text("hello\n")
    from universal_data_connector_spark.sources.files import (
        decoded_uri_path_col)
    row = (spark.read.format("text").load(str(tmp_path))
           .select(F.col("_metadata.file_name").alias("raw"),
                   decoded_uri_path_col(
                       F.col("_metadata.file_name")).alias("dec"))
           .collect()[0])
    assert row.raw == "report%20final%20v2.txt"   # the pinned assumption
    assert row.dec == "report final v2.txt"       # the reversal


def test_uri_decode_malformed_percent_degrades_to_raw(spark):
    """try_url_decode + coalesce fallback: a percent sequence that is
    not valid encoding (e.g. a raw-path spelling leaking through on
    some future Spark) surfaces AS-IS instead of raising
    URL_DECODE_ERROR. Valid sequences still decode; literal `+` stays
    a plus (URI path semantics, not form encoding)."""
    from universal_data_connector_spark.sources.files import (
        decoded_uri_path_col)
    cases = spark.createDataFrame(
        [("file:/d/bad%zzname.txt",),    # malformed -> raw preserved
         ("file:/d/ok%20name.txt",),     # valid -> decoded
         ("file:/d/a+b%25c.txt",)],      # + literal, %25 -> %
        "u string")
    got = [r.d for r in
           cases.select(decoded_uri_path_col(F.col("u")).alias("d"))
                .collect()]
    assert got == ["file:/d/bad%zzname.txt",
                   "file:/d/ok name.txt",
                   "file:/d/a+b%c.txt"]


def test_release_frames_logs_never_materialized_pin(spark, caplog):
    """BUILD-then-ACT contract observability: releasing a pinned frame
    whose persist was never populated by an action logs at info; a
    properly acted-on pin releases silently."""
    from universal_data_connector_spark.operators import relational as orel

    log_name = "universal_data_connector_spark.operators.relational"
    msg_frag = "consuming action never ran"

    # violation: persist + pin, release with NO action in between
    bad = spark.range(50).selectExpr("id", "id * 3 AS y").persist()
    with caplog.at_level(logging.INFO, logger=log_name):
        orel.release_frames([bad])
    assert any(msg_frag in r.message for r in caplog.records)

    caplog.clear()
    # compliant: persist + action, then release -> no log line
    good = spark.range(50).selectExpr("id", "id * 5 AS y").persist()
    good.count()
    with caplog.at_level(logging.INFO, logger=log_name):
        orel.release_frames([good])
    assert not any(msg_frag in r.message for r in caplog.records)
