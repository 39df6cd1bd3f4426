"""Structured Streaming operators (event-time semantics the reference
never had — it runs everything ``withoutTimestamps()``,
``pipeline/PipelineBuilder.java:152`` in
ThatNinjaGuy/universal-data-connector)."""

from universal_data_connector_spark.streaming.windows import (
    foreachbatch_agg_state,
    foreachbatch_upsert,
    session_agg,
    sliding_agg,
    stateful_running_totals,
    stream_dedup,
    tumbling_agg,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "stream_dedup",
           "stateful_running_totals", "foreachbatch_upsert",
           "foreachbatch_agg_state"]
