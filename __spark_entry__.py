"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over `universal_data_connector_spark.plans.catalog`, the
engine's declared operator catalog (one entry per implemented operator
from SURVEY.md §2B, each paired with its DuckDB oracle SQL where
ANSI-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from universal_data_connector_spark.plans.catalog import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"

# The driver's CORRECTNESS check oracles the FIRST 50 keys in dict
# iteration order. The window below ROTATES per round so no key's most
# recent driver evidence goes stale (>2 rounds old). Round-15 rotation
# (VERDICT r14 item 2): the 49-key r12-evidence cohort — every key whose
# latest driver evidence is CORRECTNESS_r12 (recomputed union over
# r01..r14: split r12:49 / r13:48 / r14:50) — plus the flagship.
# This cohort carries the wave-3f-touched agg_rollup / agg_cube /
# scan_partition_pruned, so their r14 oracle-side changes get driver
# confirmation. 49 + 1 = 50; catalog holds at 147.
_CHECK_FIRST = [
    # r12 aggregation keys (nine)
    "agg_approx_count_distinct", "agg_count_distinct", "agg_cube",
    "agg_grouping_sets", "agg_hash_sum_avg", "agg_histogram_bins",
    "agg_pivot", "agg_rollup", "agg_stats_moments",
    # r12 cast keys (two)
    "cast_currency_double", "cast_lenient_int",
    # r12 dedup key
    "dedup_simhash",
    # r12 map/defaults key
    "defaults_on_null",
    # r12 data-quality keys (two)
    "dq_column_profile", "dq_expectations",
    # r12 analytics keys (three)
    "events_funnel_steps", "events_window_funnel_conversion",
    "retention_cohorts",
    # r12 filter keys (four)
    "filter_any_row_per_file", "filter_contains", "filter_equality",
    "filter_null_safe",
    # r12 join keys (ten)
    "join_anti", "join_asof", "join_full_outer", "join_inner_hash",
    "join_interval_overlap", "join_left", "join_range_theta",
    "join_salted_skew", "join_semi", "join_star_schema",
    # r12 maintenance key
    "maintenance_compact_files",
    # r12 map key
    "map_prefix_suffix",
    # r12 multimodal key (rows-only)
    "multimodal_resize",
    # r12 composition key (perf-watch key: fresh driver row each window)
    "pipeline_training_data",
    # r12 projection keys (two)
    "project_columns", "rename_columns",
    # r12 reshape / sampling keys (two)
    "reshape_chunk_tokens", "sample_capped_per_key",
    # r12 scan keys (two)
    "scan_jsonl_roundtrip", "scan_partition_pruned",
    # r12 streaming keys (two)
    "stream_stateful_totals", "stream_stream_interval_join",
    # r12 text key
    "text_repetition_ratio",
    # r12 time-series keys (two)
    "ts_rollup_gapfill", "ts_subsequence_search",
    # r12 window keys (two)
    "window_row_number_topk", "window_running_sum",
    # flagship: insurance row each round
    "pipeline_clean_corpus",
]


def _ordered(d: dict) -> dict:
    front = [k for k in _CHECK_FIRST if k in d]
    seen = set(front)
    return {k: d[k] for k in [*front, *(k for k in d if k not in seen)]}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the composed
    LLM-corpus-cleaning pipeline (quality filter -> exact dedup by
    normalized-text fingerprint -> per-language stats), built entirely
    from the engine's own operators."""
    return QUERIES["pipeline_clean_corpus"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query key; keys absent here (LSH
    signatures, approx sketches, IVF) get the driver's rows-only check."""
    return _ordered(ORACLES)
