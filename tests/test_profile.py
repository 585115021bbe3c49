"""Column profiler: exact stats against hand-checkable frames and the
one-pass plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.profile import (
    profile_columns,
)


def test_profile_exact_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b"), (None, None)],
        "x long, s string",
    )
    got = {r["column_name"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert got["x"]["n_rows"] == 5
    assert got["x"]["n_nulls"] == 2
    assert got["x"]["n_distinct"] == 3
    assert got["s"]["n_nulls"] == 2
    assert got["s"]["n_distinct"] == 2
    assert all(r["approx_distinct_ok"] for r in got.values())


def test_profile_all_null_column_vacuously_certified(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    row = profile_columns(df, ["x"]).collect()[0]
    assert row["n_nulls"] == 2
    assert row["n_distinct"] == 0
    assert row["approx_distinct_ok"] is True


def test_profile_is_one_scan(spark, sf_dir):
    from common_survey_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    prof = profile_columns(ev, ["event_id", "user_id", "event_type"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2, plan
