"""JDBC source: partitioned, pushdown-friendly database ingest.

Reference S3 (``factory/source/JdbcSourceContext.java``) opens ONE
connection and streams a scrollable cursor in ``batchSize`` chunks,
narrowing every SQL type to CSV text (``:112-143``). Spark's JDBC
source is strictly better on both axes and we use it directly:

* real types from ``ResultSetMetaData`` — kept, not stringified;
* parallel reads via ``partitionColumn/lowerBound/upperBound/
  numPartitions`` (N concurrent connections, one per partition) —
  the 100 TB path the reference's single cursor cannot take;
* arbitrary SQL pushdown via the ``query`` property (the reference
  passes user SQL through too, ``:28``, and validates it with EXPLAIN
  ``:47-53`` — Spark achieves the same by schema-resolving the query
  at plan time).

``oneTimeOperation`` (reference parks the thread forever after the
query drains, ``factory/SourceFactory.java:95-99``) becomes a finite
batch read that actually completes — a documented improvement
(SURVEY.md §7.4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jdbc_source(spark: SparkSession, props: dict, streaming: bool = False) -> DataFrame:
    if streaming:
        # Kept explicit: CDC-style JDBC streaming is out of scope, same
        # as the reference (its "streaming" JDBC is a polling loop over
        # the same query). Pipelines use batch / AvailableNow semantics.
        raise ValueError("jdbc source supports batch pipelines only; "
                         "use oneTimeOperation semantics (finite batch)")
    url = props["jdbcUrl"]
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("fetchsize", str(props.get("batchSize", 1000))))
    if props.get("user"):
        reader = reader.option("user", props["user"])
    if props.get("password") is not None:
        reader = reader.option("password", props["password"])
    if props.get("driver"):
        reader = reader.option("driver", props["driver"])
    if props.get("query"):
        reader = reader.option("query", props["query"])
    else:
        reader = reader.option("dbtable", props["table"])
    # Parallel partitioned read when the caller names a numeric column.
    if props.get("partitionColumn"):
        reader = (reader
                  .option("partitionColumn", props["partitionColumn"])
                  .option("lowerBound", str(props["lowerBound"]))
                  .option("upperBound", str(props["upperBound"]))
                  .option("numPartitions", str(props.get("numPartitions", 8))))
    df = reader.load()
    # Reference lower-cases JDBC column names (JdbcSourceContext.java:71-83).
    renames = {c: c.lower() for c in df.columns if c != c.lower()}
    if renames:
        df = df.withColumnsRenamed(renames)
    return df.withColumn("source_file", F.lit("JDBC_SOURCE"))
