"""Bucketed tables must join and aggregate with NO shuffle Exchange —
the write-once-shuffle-never property the 100 TB design leans on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)
from common_survey_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "b_lineitem", 4, "l_orderkey")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", 4,
        "l_orderkey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li = read_bucketed(spark, "b_lineitem")
    orders = read_bucketed(spark, "b_orders")
    # force the sort-merge path (broadcast would hide the bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    li = read_bucketed(spark, "b_lineitem")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    want = li.join(orders, "l_orderkey").count()
    got = (
        read_bucketed(spark, "b_lineitem")
        .join(read_bucketed(spark, "b_orders"), "l_orderkey")
        .count()
    )
    assert got == want
