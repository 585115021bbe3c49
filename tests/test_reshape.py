"""Wide ↔ long codebook reshaping: roundtrip fidelity on the
reference's real example codebook (420 rows, 4 administrations with
mixed dot/no-dot admin column spellings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.reshape import (
    codebook_to_long,
    codebook_to_wide,
    discover_year_columns,
)
from common_survey_data_pipeline_spark.sources.csv import read_csv_readr

REF_CODEBOOK = (
    "/root/reference/examples/experience_cumulative-varinfo_updated-2024.csv"
)


@pytest.fixture(scope="module")
def wide(spark):
    return read_csv_readr(spark, REF_CODEBOOK)


def test_discover_years_tolerates_both_spellings(wide):
    years = discover_year_columns(wide.columns)
    assert set(years) == {"2021", "2022", "2023", "2024"}
    assert years["2023"]["admin"] == "SurveyAdminYear2023"  # no-dot spelling
    assert years["2023"]["question_text"] == "QuestionText.2023"


def test_long_form_shape(wide):
    long_df = codebook_to_long(wide)
    assert long_df.columns[-3:] == ["year", "admin_value", "question_text"]
    # every long row keeps at least one payload value
    assert (
        long_df.where(
            F.col("admin_value").isNull() & F.col("question_text").isNull()
        ).count()
        == 0
    )
    # item count preserved: every wide row with any year data appears
    n_items_with_data = wide.where(
        F.coalesce(
            *[
                F.col(f"`{c}`")
                for c in wide.columns
                if c.startswith(("SurveyAdmin", "QuestionText."))
            ]
        ).isNotNull()
    ).count()
    assert long_df.select("ITEM_NAME").distinct().count() >= 1
    assert long_df.count() >= n_items_with_data


def test_roundtrip_preserves_values(spark, wide):
    long_df = codebook_to_long(wide)
    back = codebook_to_wide(long_df)
    # compare per (item, year): admin value and question text survive
    for yr in ("2021", "2023", "2024"):
        orig_admin = {
            r["ITEM_NAME"]: r[f"SurveyAdminYear{yr}"]
            for r in wide.select("ITEM_NAME", f"`SurveyAdminYear{yr}`").collect()
            if r[f"SurveyAdminYear{yr}"] is not None
        }
        got_admin = {
            r["ITEM_NAME"]: r[f"SurveyAdminYear{yr}"]
            for r in back.select("ITEM_NAME", f"`SurveyAdminYear{yr}`").collect()
            if r[f"SurveyAdminYear{yr}"] is not None
        }
        assert got_admin == orig_admin, yr
        orig_qt = {
            r["ITEM_NAME"]: r[f"QuestionText.{yr}"]
            for r in wide.select("ITEM_NAME", f"`QuestionText.{yr}`").collect()
            if r[f"QuestionText.{yr}"] is not None
        }
        got_qt = {
            r["ITEM_NAME"]: r[f"QuestionText.{yr}"]
            for r in back.select("ITEM_NAME", f"`QuestionText.{yr}`").collect()
            if r[f"QuestionText.{yr}"] is not None
        }
        assert got_qt == orig_qt, yr


def test_long_form_is_year_partitionable(wide, tmp_path):
    long_df = codebook_to_long(wide)
    path = str(tmp_path / "codebook_long")
    long_df.write.partitionBy("year").parquet(path)
    import os

    parts = sorted(d for d in os.listdir(path) if d.startswith("year="))
    assert parts == ["year=2021", "year=2022", "year=2023", "year=2024"]


def test_codebook_to_long_unrecognized_layout_is_loud(spark):
    """No recognizable year columns must raise, not silently explode an
    empty array into an empty codebook."""
    import pytest

    from common_survey_data_pipeline_spark.operators.reshape import (
        codebook_to_long,
    )

    df = spark.createDataFrame(
        [("Q1", "x")], "ITEM_NAME string, AdminYear2023 string"
    )
    with pytest.raises(ValueError, match="no administration-year columns"):
        codebook_to_long(df)
