"""File sinks: text/CSV passthrough and schema-bound Parquet.

Reference K1 (``factory/sink/FileSinkContext.java``) keeps one writer
per distinct source file and swaps the configured extension into the
output name (`:81-93`); K2 (``factory/sink/ParquetSinkContext.java``)
converts CSV text to Avro records and writes Snappy+dictionary Parquet.

Here:

* text/CSV file-mode output preserves the one-output-file-per-input-
  file contract via ``foreachPartition`` — each executor writes the
  files for its rows directly (a file-mode row IS a whole file, so
  row count == file count and per-row file IO is the natural unit);
* Parquet output is ``df.write.parquet`` — Spark's writer does Snappy,
  dictionary encoding, and row-group sizing natively
  (``spark.sql.parquet.compression.codec=snappy``); the CSV->typed
  conversion (lenient casts, defaults, row drops) happens in
  ``sources.records.csv_blob_to_records`` as column expressions;
* ``partitionBy`` is available via the ``partitionBy`` property for
  the scalable directory-layout variant (SURVEY.md §7.4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_data_connector_spark.config import avro_schema_to_struct


def _swap_extension(filename: str, extension: str) -> str:
    """Output naming of ``FileSinkContext.java:81-93``: swap in the
    configured extension; empty extension keeps the original name."""
    base = os.path.basename(filename)
    if not extension:
        return base
    stem, _, _ = base.rpartition(".")
    return (stem or base) + extension


def _write_file_mode(df: DataFrame, out_dir: str, extension: str) -> None:
    """One output file per source file, written from executors."""
    os.makedirs(out_dir, exist_ok=True)
    rows = df.select("source_file", "content")

    def write_partition(it):
        for row in it:
            name = _swap_extension(row.source_file, extension)
            with open(os.path.join(out_dir, name), "w") as f:
                f.write(row.content)
                if not row.content.endswith("\n"):
                    f.write("\n")  # reference writes content + newline

    rows.foreachPartition(write_partition)


def _to_schema_records(df: DataFrame, props: dict) -> DataFrame:
    """Bind the frame to the sink's declared Avro schema."""
    from universal_data_connector_spark.functions import casts as fc
    from universal_data_connector_spark.sources.records import (
        _LENIENT, _TYPE_NAMES, csv_blob_to_records)

    schema = avro_schema_to_struct(props["schema"])
    if "content" in df.columns and "file_type" in df.columns:
        # file-mode CSV blobs -> typed records
        return csv_blob_to_records(df, schema).drop("source_file", "__line_no")
    # record-mode (e.g. JDBC source): bind by case-insensitive name,
    # lenient-cast to the declared type, apply per-type defaults.
    lower_cols = {c.lower(): c for c in df.columns}
    out = []
    for f in schema.fields:
        src = lower_cols.get(f.name.lower())
        col = (F.col(src).cast("string") if src is not None
               else F.lit(None).cast("string"))
        conv = _LENIENT[f.dataType](col)
        out.append(fc.with_default(conv, _TYPE_NAMES[f.dataType]).alias(f.name))
    return df.select(*out)


def file_sink(df: DataFrame, props: dict, streaming: bool = False):
    out_dir = props["path"]
    fmt = str(props.get("format", "")).lower()

    if fmt == "parquet":
        records = _to_schema_records(df, props) if props.get("schema") else df
        writer = records.write.mode(props.get("mode", "append"))
        if props.get("partitionBy"):
            writer = writer.partitionBy(*props["partitionBy"])
        if streaming:
            return (records.writeStream
                    .format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", props.get(
                        "checkpointLocation", out_dir.rstrip("/") + "_checkpoint"))
                    .start())
        writer.parquet(out_dir)
        return None

    if fmt == "csv" and "content" not in df.columns:
        # record-mode CSV directory output
        writer = (df.write.mode(props.get("mode", "append"))
                  .option("header", str(props.get("includeHeaders", True)).lower()))
        writer.csv(out_dir)
        return None

    # text / CSV passthrough: one output file per input file
    extension = props.get("extension", "")
    if streaming:
        def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
            _write_file_mode(batch_df, out_dir, extension)
        return (df.writeStream.foreachBatch(write_batch)
                .option("checkpointLocation", props.get(
                    "checkpointLocation", out_dir.rstrip("/") + "_checkpoint"))
                .start())
    _write_file_mode(df, out_dir, extension)
    return None


def s3_sink(df: DataFrame, props: dict, streaming: bool = False):
    """Reference K5 (``factory/sink/S3SinkContext.java``): object per
    file under ``bucket/prefix``. Content-type selection (`:105-115`)
    is metadata the S3A connector derives from extensions; credentials
    go to Hadoop conf like the S3 source."""
    spark = df.sparkSession
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if props.get("accessKey"):
        hconf.set("fs.s3a.access.key", props["accessKey"])
    if props.get("secretKey"):
        hconf.set("fs.s3a.secret.key", props["secretKey"])
    if props.get("endpoint"):
        hconf.set("fs.s3a.endpoint", props["endpoint"])
    path = f"s3a://{props['bucketName']}/{props.get('prefix', '')}"
    sub = dict(props)
    sub["path"] = path
    return file_sink(df, sub, streaming)
