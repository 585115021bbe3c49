"""Observation-based row accounting: metrics computed in the pipeline's
own pass, no extra count() jobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions.text import quality_score
from common_survey_data_pipeline_spark.plans.observe import observed_filter
from common_survey_data_pipeline_spark.sources.tables import load_table


def test_observed_filter_accounts_in_one_pass(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "quality", quality_score(F.col("text"))
    )
    kept, obs = observed_filter(docs, F.col("quality") >= 0.3, "qgate")
    n_kept = kept.count()  # the ONLY job; metrics ride along
    got = obs.get
    assert got["qgate_in"] == docs.count()
    assert got["qgate_kept"] == n_kept
    assert got["qgate_dropped"] == got["qgate_in"] - n_kept


def test_observed_filter_chains(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    step1, o1 = observed_filter(docs, F.col("lang") == "en", "lang")
    step2, o2 = observed_filter(step1, F.col("n_chars") > 100, "length")
    final = step2.count()
    assert o1.get["lang_kept"] == o2.get["length_in"]
    assert o2.get["length_kept"] == final
    assert o1.get["lang_in"] == docs.count()


def test_observed_filter_counts_null_conditions_as_dropped(spark):
    """in == kept + dropped even when the condition evaluates to NULL
    (regression: NULL-cond rows vanished from both sums)."""
    from common_survey_data_pipeline_spark.plans.observe import observed_filter

    df = spark.createDataFrame(
        [(1, 0.9), (2, None), (3, 0.1), (4, None)], "id long, score double"
    )
    out, obs = observed_filter(df, F.col("score") > 0.5, "g")
    assert out.count() == 1
    m = obs.get
    assert m["g_in"] == 4
    assert m["g_kept"] == 1
    assert m["g_dropped"] == 3
    assert m["g_in"] == m["g_kept"] + m["g_dropped"]


def test_observed_filter_empty_input_zero_metrics(spark):
    from common_survey_data_pipeline_spark.plans.observe import observed_filter

    df = spark.createDataFrame([], "id long, score double")
    out, obs = observed_filter(df, F.col("score") > 0.5, "e")
    assert out.count() == 0
    m = obs.get
    assert (m["e_in"], m["e_kept"], m["e_dropped"]) == (0, 0, 0)
