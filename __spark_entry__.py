"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual workload lives in
``common_survey_data_pipeline_spark/workload.py`` — every operator from
SURVEY.md §2 plus the dedup/similarity/text/multimodal/streaming
extension surface, with each DuckDB oracle defined next to its Spark
plan.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_survey_data_pipeline_spark.workload import REGISTRY, flagship  # noqa: E402

# The correctness harness records queries in dict order and caps how many
# it covers per round; rounds 1-2 both recorded exactly these 50, leaving
# the rest of the registry without a driver row. Surface the NOT-yet-
# recorded queries first so round 3 closes the coverage gap; the already-
# double-recorded 50 go last.
_RECORDED_R1_R2 = [
    "s1_scan_filter_project", "s3_metadata_transpose", "f2_digit_recency_key",
    "p5_filter_r_na_semantics", "p6_conditional_map_rank", "j1_fuzzy_brand_join",
    "j2_best_item_per_order", "j3_coalesce_left_join", "j4_anti_join",
    "j5_semi_join", "a1_conditional_counts", "a2_distinct_summary",
    "w1_latest_orders_per_customer", "o1_sort_nulls_last", "topk_orders",
    "u1_union_by_name", "u2_intersect_nations", "u3_except_nations",
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_region_nation_revenue",
    "text_stats", "text_quality", "text_lang_id", "text_fingerprints",
    "dedup_exact_groups", "dedup_ngram_exact", "dedup_minhash",
    "dedup_clusters", "curate_corpus", "dedup_simhash", "similarity_topk",
    "similarity_signlsh", "similarity_ivf", "embedding_neardup",
    "events_tumbling_1h", "events_sliding_2h_1h", "events_sessions_30m",
    "events_daily_dense", "events_dedup_first", "multimodal_decode",
    "multimodal_resize", "multimodal_frames", "j6_asof_join",
    "j9_asof_forward", "j7_interval_join", "j8_salted_skew_join",
    "w2_lead_lag_gaps", "w3_rolling_avg", "w4_running_total",
]


def _driver_order() -> list[str]:
    recorded = set(_RECORDED_R1_R2)
    fresh = [n for n in REGISTRY if n not in recorded]
    return fresh + [n for n in _RECORDED_R1_R2 if n in REGISTRY]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extension
    surface). Each callable takes (spark, sf_dir) and returns a
    DataFrame; column names/dtypes are aligned with ``oracle_sql``."""
    return {name: REGISTRY[name].fn for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (tables pre-registered as
    views). Every registry query has one: operators whose internals SQL
    can't mirror (sign-LSH / IVF hyperplanes, HLL sketches) are oracled
    through engine-independent contracts instead — recall-vs-exact and
    error-tolerance booleans both engines compute identically.
    """
    return {
        name: REGISTRY[name].oracle
        for name in _driver_order()
        if REGISTRY[name].oracle is not None
    }
