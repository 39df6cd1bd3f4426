"""Sink connector registry: DataFrame -> storage.

Reference sinks (``factory/SinkFactory.java:19-176`` in
ThatNinjaGuy/universal-data-connector) parse the in-band string
envelope; here sinks consume the engine's real columns. Each sink is a
callable ``(df, props, streaming) -> None | StreamingQuery``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from universal_data_connector_spark.config import SinkConfig
from universal_data_connector_spark.sinks.files import file_sink, s3_sink
from universal_data_connector_spark.sinks.jdbc import jdbc_sink
from universal_data_connector_spark.sinks.kafka import kafka_sink
from universal_data_connector_spark.sinks.memory import memory_sink, noop_sink
from universal_data_connector_spark.sinks.upsert import (
    agg_state_sink,
    upsert_sink,
)

SinkFn = Callable[[DataFrame, dict, bool], object]

SINKS: dict[str, SinkFn] = {
    "file": file_sink,
    "s3": s3_sink,
    "jdbc": jdbc_sink,
    "kafka": kafka_sink,
    "memory": memory_sink,   # test/debug surface
    "noop": noop_sink,       # benchmarking surface
    # engine extensions beyond the reference's sink set: keyed state
    # targets (bucketed parquet, crash-safe per-bucket swaps)
    "upsert": upsert_sink,
    "agg_state": agg_state_sink,
}


def create_sink(df: DataFrame, cfg: SinkConfig, streaming: bool = False):
    """Type-dispatch mirroring ``SinkFactory.create``
    (``factory/SinkFactory.java:25-31``); unknown type raises."""
    try:
        fn = SINKS[cfg.type]
    except KeyError:
        raise ValueError(f"unsupported sink type: {cfg.type!r}; "
                         f"known: {sorted(SINKS)}") from None
    return fn(df, cfg.properties, streaming)
