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


def _tall(df):
    return {r["column_name"]: r.asDict() for r in df.collect()}


def test_merged_state_equals_full_recompute(spark, sf_dir):
    """VERDICT r7 item 5: fold 3 batch states and compare against the
    one-shot state over the concatenation — exact fields exactly, the
    sketch estimate within its 5% certificate."""
    from common_survey_data_pipeline_spark.operators.profile import (
        merge_profile_states,
        profile_from_state,
        profile_state,
    )
    from common_survey_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    states = [
        profile_state(ev.where(F.col("event_id") % 3 == i), cols)
        for i in range(3)
    ]
    merged = _tall(profile_from_state(merge_profile_states(states), cols))
    full = _tall(profile_from_state(profile_state(ev, cols), cols))
    exact_nd = {
        c: ev.agg(F.count_distinct(F.col(c))).collect()[0][0] for c in cols
    }
    for c in cols:
        for field in ("n_rows", "n_nulls", "min_val", "max_val"):
            assert merged[c][field] == full[c][field], (c, field)
        nd = exact_nd[c]
        assert abs(merged[c]["distinct_est"] - nd) <= 0.05 * nd, (c, nd)


def test_merge_is_order_invariant(spark):
    from common_survey_data_pipeline_spark.operators.profile import (
        merge_profile_states,
        profile_from_state,
        profile_state,
    )

    a = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string")
    b = spark.createDataFrame([(3, "y"), (None, "x")], "id long, s string")
    c = spark.createDataFrame([(None, None)], "id long, s string")
    cols = ["id", "s"]
    sa, sb, sc = (profile_state(d, cols) for d in (a, b, c))
    p1 = _tall(profile_from_state(merge_profile_states([sa, sb, sc]), cols))
    p2 = _tall(profile_from_state(merge_profile_states([sc, sb, sa]), cols))
    assert p1 == p2
    assert p1["id"]["n_rows"] == 5 and p1["id"]["n_nulls"] == 2
    assert p1["id"]["min_val"] == "1" and p1["id"]["max_val"] == "3"
    assert p1["id"]["distinct_est"] == 3
    assert p1["s"]["n_nulls"] == 2 and p1["s"]["distinct_est"] == 2


def test_merge_with_all_null_and_empty_batches(spark):
    from common_survey_data_pipeline_spark.operators.profile import (
        merge_profile_states,
        profile_from_state,
        profile_state,
    )

    full = spark.createDataFrame([(1,), (2,)], "x long")
    nulls = spark.createDataFrame([(None,), (None,)], "x long")
    empty = spark.createDataFrame([], "x long")
    cols = ["x"]
    merged = _tall(
        profile_from_state(
            merge_profile_states(
                [profile_state(d, cols) for d in (full, nulls, empty)]
            ),
            cols,
        )
    )
    assert merged["x"]["n_rows"] == 4
    assert merged["x"]["n_nulls"] == 2
    assert merged["x"]["min_val"] == "1" and merged["x"]["max_val"] == "2"
    assert merged["x"]["distinct_est"] == 2


def test_merge_rejects_empty_state_list(spark):
    import pytest

    from common_survey_data_pipeline_spark.operators.profile import (
        merge_profile_states,
    )

    with pytest.raises(ValueError, match="no states"):
        merge_profile_states([])
