"""Round-6 regression tests.

1. events.ts must load as TimestampType (watermark-legal) regardless of
   the parquet layout the testdata generator used — TIMESTAMP(NANOS)
   (read as bigint under nanosAsLong) or naive TIMESTAMP(MICROS) (read
   as TIMESTAMP_NTZ unless NTZ inference is pinned off). Round 5 broke
   `stream_stateful_totals` when the testdata switched layouts because
   only the nanos case was guarded (VERDICT r5 item 1).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_DIR


def test_events_ts_is_watermark_compatible(spark):
    """tables.load must yield TimestampType for events.ts — the exact
    type withWatermark requires (TIMESTAMP_NTZ and bigint both throw
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE / unsupported)."""
    from universal_data_connector_spark import tables

    df = tables.load(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_events_stream_watermark_accepts_ts(spark):
    """The exact readStream + withWatermark path stream_stateful_totals
    uses must analyze cleanly (this is what threw in round 5)."""
    from universal_data_connector_spark.tables import watermarkable_ts

    raw_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(SF_DIR))
    stream = watermarkable_ts(stream, "ts")
    # withWatermark analyzes eagerly enough to throw on a bad type.
    wm = stream.withWatermark("ts", "1 hour")
    assert isinstance(wm.schema["ts"].dataType, T.TimestampType)


def test_watermarkable_ts_ntz_cast_value_preserving(spark):
    """NTZ → LTZ cast under the pinned UTC session TZ keeps wall-clock
    values identical (the correctness condition the fix relies on)."""
    from universal_data_connector_spark.session import pin
    from universal_data_connector_spark.tables import watermarkable_ts

    pin(spark)
    naive = datetime.datetime(2024, 3, 1, 12, 34, 56, 789000)
    df = spark.createDataFrame(
        [(naive,)], T.StructType([T.StructField("ts", T.TimestampNTZType())]))
    out = watermarkable_ts(df, "ts")
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    rendered = out.select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("s")
    ).collect()[0]["s"]
    assert rendered == "2024-03-01 12:34:56.789"


def test_watermarkable_ts_passthrough_on_timestamp(spark):
    """Already-TimestampType columns pass through untouched (no extra
    projection node for the common pinned-session path)."""
    from universal_data_connector_spark.tables import watermarkable_ts

    df = spark.sql("SELECT timestamp'2024-01-01 00:00:00' AS ts")
    assert watermarkable_ts(df, "ts") is df
