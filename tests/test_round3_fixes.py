"""Regression tests for round-3 ADVICE/VERDICT fixes."""

from __future__ import annotations

import os

import pytest

from universal_data_connector_spark.sources.files import directory_source


def _write(path: str, content: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)
    return path


def test_s3_content_type_mapping():
    """Reference S3SinkContext.java:105-115 switch, exactly: CSV ->
    text/csv, PARQUET -> application/x-parquet, everything else ->
    application/octet-stream."""
    from universal_data_connector_spark.sinks.files import content_type_for
    assert content_type_for("CSV") == "text/csv"
    assert content_type_for("csv") == "text/csv"
    assert content_type_for("PARQUET") == "application/x-parquet"
    assert content_type_for("CRC") == "application/octet-stream"
    assert content_type_for("BINARY") == "application/octet-stream"
    assert content_type_for("TEXT") == "application/octet-stream"
    assert content_type_for("anything") == "application/octet-stream"
    assert content_type_for(None) == "application/octet-stream"


def test_directory_source_root_reappearing_in_tree(spark, tmp_path):
    """preserveStructure must strip only the PREFIX occurrence of the
    configured root: a root /a/b holding /a/b/x/a/b/y.bin yields
    x/a/b/y.bin (substring_index on the LAST occurrence truncated it
    to y.bin)."""
    base = tmp_path / "a" / "b"
    _write(str(base / "x" / "a" / "b" / "y.bin"), "payload")
    df = directory_source(spark, {"path": str(base), "preserveStructure": "true"})
    assert [r.source_file for r in df.collect()] == ["x/a/b/y.bin"]
