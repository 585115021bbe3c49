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


def test_bucketed_band_table_incremental_dedup_no_corpus_exchange(
    spark, sf_dir
):
    """The 100 TB incremental-dedup layout: the corpus LSH band table is
    written ONCE, bucketed on band_key; each incoming batch joins its
    own band keys against it with no Exchange above the corpus scan —
    only the (small) batch side shuffles."""
    from common_survey_data_pipeline_spark.operators.dedup import (
        minhash_band_keys,
    )
    from common_survey_data_pipeline_spark.plans import plan_of, subtree_of

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    write_bucketed(
        minhash_band_keys(corpus, "text", "doc_id"), "b_corpus_bands", 4,
        "band_key",
    )
    try:
        corpus_bands = read_bucketed(spark, "b_corpus_bands").withColumnRenamed(
            "doc_id", "corpus_id"
        )
        batch_bands = minhash_band_keys(batch, "text", "doc_id").withColumnRenamed(
            "doc_id", "batch_id"
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = batch_bands.join(corpus_bands, "band_key").select(
                "batch_id", "corpus_id"
            )
            cand = joined.distinct()
            # assert on the pre-distinct join: the only Exchanges are
            # the batch side's (the distinct's shuffle legitimately
            # sits above the whole join)
            plan = plan_of(joined)
            assert "Bucketed: true" in plan, plan
            # the corpus scan must sit under NO Exchange: every shuffle
            # in the plan belongs to the batch side (or the final dedup)
            for i, line in enumerate(plan.splitlines()):
                if "Exchange" in line:
                    sub = "\n".join(
                        subtree_of("\n".join(plan.splitlines()[i:]), "Exchange")
                    )
                    assert "b_corpus_bands" not in sub, plan
            assert "Exchange" in plan  # the batch side does shuffle
            n = cand.count()
            assert n > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_corpus_bands")
