"""Table-maintenance operators: the operational jobs a 100 TB lake
needs between queries.

The reference has no maintenance surface at all (its parquet sink just
appends files, ``factory/sink/ParquetSinkContext.java``); on a real
lake the resulting small-files problem — thousands of KB-sized files
per partition — destroys scan throughput (per-file open/footer cost,
tiny row groups, starved column compression). Compaction rewrites a
directory into size-targeted files and is idempotent."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total byte size of a directory through Hadoop's FileSystem (works
    for any scheme Spark can read — local, HDFS, s3a)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    return int(fs.getContentSummary(hpath).getLength())


def compact_parquet_dir(spark: SparkSession, src: str, dest: str,
                        target_bytes: int = 128 << 20) -> DataFrame:
    """Rewrite a parquet directory into ~``target_bytes`` files.

    File count = ceil(total_bytes / target); the rewrite is a
    round-robin ``repartition`` (no key assumptions, even output
    sizes) and content is bit-preserved — compaction must never
    change query results, only layout. At 100 TB this runs
    per-partition-directory, not over the whole table at once; the
    byte measurement is filesystem metadata only (no scan).

    Returns the compacted frame (lazy, reading ``dest``)."""
    df = spark.read.parquet(src)
    total = _dir_bytes(spark, src)
    n = max(1, math.ceil(total / target_bytes))
    df.repartition(n).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)
