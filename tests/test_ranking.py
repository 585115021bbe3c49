"""Distributed global ranking (operators/ranking.py): SQL-exact ntile /
row_number semantics without a partition-less Window, plus the plan
proof that the registry's ntile query really lost its single-task stage.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)
from common_survey_data_pipeline_spark.plans.asserts import (
    partitionless_windows,
    plan_of,
)
from common_survey_data_pipeline_spark.workload import REGISTRY


def _window_reference(df, order, k):
    """Spark's own single-task ntile as the semantics oracle."""
    w = Window.orderBy(*order)
    return {
        (r["id"], r["b"])
        for r in df.withColumn("b", F.ntile(k).over(w)).select("id", "b").collect()
    }


@pytest.mark.parametrize("n,k", [(17, 4), (16, 4), (3, 5), (1, 2), (100, 7)])
def test_global_ntile_matches_sql_semantics(spark, n, k):
    # ids shuffled via a hash so range partitioning actually reorders
    df = (
        spark.range(n)
        .select(F.col("id"), F.xxhash64("id").alias("key"))
        .repartition(4)
    )
    got = {
        (r["id"], r["bucket"])
        for r in global_ntile(df, [F.col("key"), F.col("id")], k)
        .select("id", "bucket")
        .collect()
    }
    want = _window_reference(df, [F.col("key"), F.col("id")], k)
    assert got == want


def test_global_row_number_matches_window(spark):
    df = spark.range(250).select(
        F.col("id"), (F.col("id") % 13).alias("key")
    ).repartition(5)
    order = [F.col("key").asc(), F.col("id").asc()]
    got = {
        (r["id"], r["rn"])
        for r in global_row_number(df, order).select("id", "rn").collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["id"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w).cast("long"))
        .select("id", "rn")
        .collect()
    }
    assert got == want


def test_global_ntile_empty_input(spark):
    df = spark.range(0).select(F.col("id"))
    assert global_ntile(df, ["id"], 4).count() == 0


def test_registry_ntile_has_no_partitionless_window(spark, sf_dir):
    df = REGISTRY["ntile_spend_quartiles"].fn(spark, sf_dir)
    plan = plan_of(df)
    offenders = partitionless_windows(plan)
    assert offenders == [], f"single-task Window in ntile plan: {offenders}"


def test_partitionless_window_detector(spark):
    df = spark.range(10)
    global_w = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert len(partitionless_windows(plan_of(global_w))) == 1
    part_w = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 2).orderBy("id"))
    )
    assert partitionless_windows(plan_of(part_w)) == []
    # partitioned but UNordered (per-group min over the full partition)
    # prints only two bracket groups — must not be a false positive
    part_unordered = df.withColumn(
        "m", F.min("id").over(Window.partitionBy(F.col("id") % 2))
    )
    assert partitionless_windows(plan_of(part_unordered)) == []


def test_global_cumsum_matches_window(spark):
    from common_survey_data_pipeline_spark.operators.ranking import global_cumsum

    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 17 + 1).alias("v")
    ).repartition(6)
    got = {
        (r["id"], r["cs"])
        for r in global_cumsum(df, ["id"], "v", "cs").select("id", "cs").collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r["id"], r["cs"])
        for r in df.withColumn("cs", F.sum("v").over(w).cast("long"))
        .select("id", "cs")
        .collect()
    }
    assert got == want


def test_global_cumsum_empty_and_single(spark):
    from common_survey_data_pipeline_spark.operators.ranking import global_cumsum

    assert global_cumsum(spark.range(0).select("id"), ["id"], "id").count() == 0
    row = (
        global_cumsum(spark.range(5, 6).select("id"), ["id"], "id", "cs")
        .select("cs")
        .first()
    )
    assert row.cs == 5


def test_doc_pack_has_no_partitionless_window(spark, sf_dir):
    df = REGISTRY["doc_pack_assignment"].fn(spark, sf_dir)
    offenders = partitionless_windows(plan_of(df))
    assert offenders == [], f"single-task Window in pack plan: {offenders}"


def test_global_cumsum_preserves_fractional_types(spark):
    """The running sum keeps sum()'s natural type (regression: a
    blanket long cast floored double/decimal cumsums)."""
    from decimal import Decimal

    from common_survey_data_pipeline_spark.operators.ranking import global_cumsum

    df = spark.range(8).select(
        F.col("id"), F.lit(0.25).alias("v")
    ).repartition(3)
    got = sorted(
        r["cs"] for r in global_cumsum(df, ["id"], "v", "cs").collect()
    )
    assert got == [0.25 * (i + 1) for i in range(8)]

    dec = spark.range(4).select(
        F.col("id"), F.lit("1.10").cast("decimal(12,2)").alias("v")
    ).repartition(2)
    out = global_cumsum(dec, ["id"], "v", "cs")
    assert out.schema["cs"].dataType.typeName() == "decimal"
    assert sorted(r["cs"] for r in out.collect()) == [
        Decimal("1.10"), Decimal("2.20"), Decimal("3.30"), Decimal("4.40")
    ]
