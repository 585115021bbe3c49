"""Partitioning-invariance: results must not depend on
spark.sql.shuffle.partitions. A query whose output changes with the
partition count is broken at scale by construction (every cluster
resize or AQE coalesce would change answers) — this catches
order-dependent folds, non-total sort keys, and unrounded float
aggregation leaking into comparisons.

Representative subset: the queries most exposed to partition-order
effects (float aggregation, window frames, global rank kernels,
candidate-pair generation)."""

from __future__ import annotations

import pytest

from common_survey_data_pipeline_spark.workload import REGISTRY

QUERIES = (
    "q1_pricing_summary",          # decimal + float aggregation
    "stats_moments",               # skew/kurtosis float folds
    "lineitem_correlations",       # corr/covar aggregates
    "embedding_random_projection", # avg of per-row doubles
    "ewma_user_value",             # window frame order
    "rolling_median_user_value",   # windowed order statistic
    "customer_abc_classes",        # distributed prefix-sum kernel
    "ntile_spend_quartiles",       # global ntile kernel
    "er_sorted_neighborhood",      # global row-number kernel + pairs
    "dedup_minhash",               # banded candidate generation
    "drift_psi_report",            # broadcast bounds + ln arithmetic
    "zipf_fit",                    # rank kernel + log-log OLS
    "bpe_train_merges",            # 32 argmax rounds: any tie broken by
                                   # partition order would cascade
    "lm_perplexity_buckets",       # r8 ordering-key change: unscaled
                                   # qsum/n double + ntile boundary
    "j14_qgram_longtext_join",     # prefix-gram candidate generation
    "profile_appended",            # HLL union across batch states
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(REGISTRY[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = _rows(REGISTRY[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b
