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
# recent driver evidence goes stale (>2 rounds old). Round-9 rotation
# (VERDICT r8 item 1): the entire 46-key r6-evidence cohort + the
# three rows-only keys with the oldest spark_rows evidence
# (multimodal_resize / sim_search_ivf_kmeans r5, dedup_simhash r7) +
# the flagship = exactly 50. The catalog (147 keys) now sits at the
# 3-round rotation capacity (49x3 + the every-round flagship = 148),
# so this round adds NO new keys — consolidation over scope, per the
# r8 verdict. The r7-evidence cohort (49 keys) rotates in r10, the
# r8 cohort in r11.
_CHECK_FIRST = [
    # r6-evidence cohort — project / rename / filter / map / casts
    "project_columns", "rename_columns",
    "filter_contains", "filter_equality", "filter_null_safe",
    "filter_any_row_per_file",
    "map_prefix_suffix", "cast_lenient_int", "cast_currency_double",
    "defaults_on_null",
    # the 11 r6 joins
    "join_inner_hash", "join_broadcast", "join_left", "join_semi",
    "join_anti", "join_range_theta", "join_asof",
    "join_interval_overlap", "join_salted_skew", "join_full_outer",
    "join_star_schema",
    # the 9 r6 aggregation keys (incl. the rows-only HLL sketch)
    "agg_hash_sum_avg", "agg_count_distinct", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_pivot", "agg_stats_moments",
    "agg_histogram_bins", "agg_approx_count_distinct",
    # windows
    "window_row_number_topk", "window_running_sum",
    # r6 streaming / stateful pair
    "stream_stateful_totals", "stream_stream_interval_join",
    # text / sampling / reshape
    "text_repetition_ratio", "sample_capped_per_key",
    "reshape_chunk_tokens",
    # r6 analytics four
    "events_funnel_steps", "retention_cohorts", "ts_rollup_gapfill",
    "ts_subsequence_search",
    # DQ / maintenance
    "dq_expectations", "dq_column_profile", "maintenance_compact_files",
    # scans
    "scan_jsonl_roundtrip", "scan_partition_pruned",
    # rows-only keys re-windowed for spark_rows drift (oldest evidence)
    "multimodal_resize", "sim_search_ivf_kmeans", "dedup_simhash",
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
