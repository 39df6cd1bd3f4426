"""Round-7 regression tests (ADVICE r6 items).

1. Raw-object S3 streaming checkpoint default must be a key under the
   SAME bucket — with an empty prefix the old default named a different
   bucket entirely (``s3a://bucket_checkpoint``).
2. A catalog build that raises must release the frames it pinned —
   otherwise a failing query leaks corpus-sized DISK_ONLY cache entries
   for the rest of the session.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_s3_default_checkpoint_stays_in_bucket():
    from universal_data_connector_spark.sinks.files import (
        _s3_default_checkpoint,
    )

    assert (_s3_default_checkpoint({"bucketName": "b"})
            == "s3a://b/_checkpoint")
    assert (_s3_default_checkpoint({"bucketName": "b", "prefix": ""})
            == "s3a://b/_checkpoint")
    assert (_s3_default_checkpoint({"bucketName": "b", "prefix": "p/q"})
            == "s3a://b/p/q/_checkpoint")
    assert (_s3_default_checkpoint({"bucketName": "b", "prefix": "p/"})
            == "s3a://b/p/_checkpoint")


def test_failed_catalog_build_releases_pins(spark):
    """query()'s wrapper must release pin_scope frames when the build
    fn raises, not leave them for a next-build release that never comes
    (ADVICE r6, plans/catalog.py:84)."""
    from universal_data_connector_spark.operators import relational as orel
    from universal_data_connector_spark.plans import catalog

    captured = {}
    orig_release = orel.release_frames

    def spy_release(frames):
        captured.setdefault("released", []).extend(frames)
        return orig_release(frames)

    @catalog.query("_r7_test_failing_build")
    def _failing(spark_, sf_dir):
        df = spark_.read.parquet(f"{sf_dir}/region.parquet")
        orel.materialize_reliable(df)
        raise RuntimeError("boom")

    try:
        orel.release_frames = spy_release
        # isolate from any pins a previous query on this thread left
        catalog._BUILD_TL.prev_pins = None
        with pytest.raises(RuntimeError, match="boom"):
            catalog.QUERIES["_r7_test_failing_build"](spark, SF_DIR)
    finally:
        orel.release_frames = orig_release
        catalog.QUERIES.pop("_r7_test_failing_build", None)
        catalog.ORACLES.pop("_r7_test_failing_build", None)

    released = captured.get("released", [])
    assert len(released) == 1, (
        "the pinned frame of a failing build must be released exactly "
        f"once, got {len(released)} releases")
    assert released[0].storageLevel.useMemory is False
    assert getattr(catalog._BUILD_TL, "prev_pins", None) is None


def test_manifest_uri_canon_column_matches_python(spark):
    """The JVM regexp_replace canonicalization used by the manifest
    anti-join must agree with the Python canonical_file_uri used when
    recording — a divergence would silently re-consume or skip files."""
    from pyspark.sql import functions as F

    from universal_data_connector_spark.sources.files import (
        _canonical_uri_col,
        canonical_file_uri,
    )

    uris = ["file:///a/b.txt", "file:/a/b.txt", "file:////weird",
            "s3a://bucket/k.txt", "hdfs://nn:8020/x", "/plain/path",
            "a+b.scheme-x:///y"]
    df = spark.createDataFrame([(u,) for u in uris], "u string")
    got = [r[0] for r in df.select(_canonical_uri_col(F.col("u"))).collect()]
    assert got == [canonical_file_uri(u) for u in uris]
