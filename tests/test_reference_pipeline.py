"""Golden tests of the full varinfo pipeline on the reference's own
example fixtures (SURVEY.md §5.2 item 2).

Counts below were produced by this engine's faithful translation and
cross-checked for internal consistency (exact+fuzzy+unmatched == total;
joined preserves every prior row; sentinel excluded from the unmatched
report under dplyr NA-matching). They lock the R-semantics translation
decisions: NA→"" pre-fill, sentinel distance-0 matching, NULLS LAST
sort, R %in% NA behavior, any_of projection.
"""

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark import PipelineConfig
from common_survey_data_pipeline_spark.operators.recency import (
    build_recency_rank,
    discover_recency_columns,
    recency_digit_key,
    sort_varinfo,
)
from common_survey_data_pipeline_spark.pipeline import (
    generate_dashboard_data,
    get_unmatched,
    join_varinfo,
    load_survey_column_info,
)
from common_survey_data_pipeline_spark.sources.csv import read_csv_readr

QUALTRICS = "/root/reference/examples/Qualtrics_raw_UCGSES2025.csv"
PRIOR = "/root/reference/examples/experience_cumulative-varinfo_updated-2024.csv"


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig()


@pytest.fixture(scope="module")
def column_info(spark, cfg):
    return load_survey_column_info(spark, QUALTRICS, cfg).cache()


@pytest.fixture(scope="module")
def prior(spark):
    return read_csv_readr(spark, PRIOR).cache()


@pytest.fixture(scope="module")
def joined_and_stats(prior, column_info, cfg):
    return join_varinfo(prior, column_info, cfg)


def test_column_info_shape(column_info, cfg):
    # 262 Qualtrics columns + 1 sentinel row
    assert column_info.count() == 263
    assert column_info.columns == [
        cfg.qualtrics_col_name,
        cfg.question_text_col_name,
        cfg.survey_admin_year_col_name,
    ]
    sentinel = column_info.where(
        F.col(f"`{cfg.qualtrics_col_name}`").isNull()
    ).collect()
    assert len(sentinel) == 1
    assert sentinel[0][cfg.question_text_col_name] == ""


def test_prior_shape(prior):
    assert prior.count() == 420
    assert len(prior.columns) == 16


def test_join_stats_golden(joined_and_stats):
    _, stats = joined_and_stats
    assert stats == {
        "total": 263,
        "exact": 137,
        "fuzzy": 70,
        "unmatched": 56,
        "total_matched": 222,
        "additional_matches": 15,
        "still_unmatched": 41,
    }


def test_joined_preserves_prior_rows(joined_and_stats, prior):
    joined, _ = joined_and_stats
    assert joined.count() == prior.count()
    # row_id is a dense 1..420 index
    ids = joined.agg(
        F.min("row_id").alias("lo"), F.max("row_id").alias("hi"),
        F.countDistinct("row_id").alias("n"),
    ).collect()[0]
    assert (ids["lo"], ids["hi"], ids["n"]) == (1, 420, 420)


def test_unmatched_excludes_sentinel(joined_and_stats, column_info, cfg):
    joined, stats = joined_and_stats
    unmatched = get_unmatched(column_info, joined, cfg)
    assert unmatched.count() == stats["still_unmatched"] == 41
    assert unmatched.where(F.col(f"`{cfg.qualtrics_col_name}`").isNull()).count() == 0


def test_blocked_strategy_same_stats(prior, column_info, cfg, joined_and_stats):
    _, stats = joined_and_stats
    _, stats_b = join_varinfo(prior, column_info, cfg, strategy="blocked")
    assert stats_b == stats


def test_recency_digit_keys():
    assert recency_digit_key("SurveyAdminYear2023") == 2023
    assert recency_digit_key("SurveyAdminYear.2025") == 2025
    assert recency_digit_key("SurveyAdminTerm25-2") == 252
    assert recency_digit_key("SurveyAdminMisc") is None


def test_discover_recency_columns_order():
    cols = [
        "ITEM_NAME",
        "SurveyAdminYear2023",
        "QuestionText.2023",
        "SurveyAdminYear2021",
        "SurveyAdminYear.2025",
        "SurveyAdminTerm25-2",
        "SurveyAdminYear2024",
    ]
    assert discover_recency_columns(cols) == [
        "SurveyAdminYear.2025",
        "SurveyAdminYear2024",
        "SurveyAdminYear2023",
        "SurveyAdminYear2021",
        "SurveyAdminTerm25-2",
    ]


def test_build_recency_rank_first_occurrence_wins():
    assert build_recency_rank(["2025", "2024", None, "2024", "2021"]) == {
        "2025": 1,
        "2024": 2,
        "2021": 5,
    }


def test_sort_varinfo_end_to_end(joined_and_stats, cfg):
    joined, _ = joined_and_stats
    sorted_vi, rank = sort_varinfo(joined.drop("row_id", "string_distance"))
    assert rank == {"2025": 1, "2024": 2, "2023": 3, "2022": 4, "2021": 5}
    rows = sorted_vi.select("ITEM_TYPE", "most_recent").collect()
    assert len(rows) == 420
    # admin/metadata items sort first (priority -1)
    head_types = [r["ITEM_TYPE"] for r in rows[:8]]
    assert all(t == "metadata" for t in head_types)
    # rows with no SurveyAdmin values (NULL priority) sort last
    assert rows[-1]["most_recent"] is None or rows[-1]["most_recent"] in rank


def test_dashboard_golden(joined_and_stats, cfg):
    joined, _ = joined_and_stats
    sorted_vi, _ = sort_varinfo(joined.drop("row_id", "string_distance"))
    dash = generate_dashboard_data(sorted_vi, cfg)
    assert dash.columns == [
        "ITEM_NAME",
        "ITEM_SECTION",
        "ITEM_STEM",
        "ITEM_MEMBER",
        "SCALE_OPTIONS",
        "ITEM_TYPE",
        "ITEM_PARENT_ID",
        "most_recent",
    ]
    # 420 - 8 metadata - 1 CONSENT = 411
    assert dash.count() == 411
    types = {r["ITEM_TYPE"] for r in dash.select("ITEM_TYPE").distinct().collect()}
    assert "metadata" not in types and "administrative" not in types
    assert dash.where(F.col("ITEM_NAME") == "CONSENT").count() == 0


def test_two_phase_io_roundtrip(spark, tmp_path, cfg):
    """prepare → (no manual edits) → finalize, via the CSV files."""
    from common_survey_data_pipeline_spark.pipeline import finalize, prepare

    manual = str(tmp_path / "manual.csv")
    unmatched = str(tmp_path / "unmatched.csv")
    out = str(tmp_path / "out.csv")
    trimmed = str(tmp_path / "trimmed.csv")
    stats = prepare(spark, QUALTRICS, PRIOR, manual, unmatched, cfg)
    assert stats["total_matched"] == 222
    rank = finalize(spark, manual, out, trimmed, cfg)
    assert rank == {"2025": 1, "2024": 2, "2023": 3, "2022": 4, "2021": 5}
    final = read_csv_readr(spark, out)
    assert final.count() == 420
    dash = read_csv_readr(spark, trimmed)
    assert dash.count() == 411
