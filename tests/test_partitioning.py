"""Partition-layout tests: a filter on the partition column must prune
directories at planning time (PartitionFilters), not scan-and-discard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ev_by_type"))
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").parquet(
        path, mode="overwrite"
    )
    return path


def test_partition_filter_prunes(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).where(
        F.col("event_type") == "purchase"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0]


def test_partition_pruned_read_is_correct(spark, sf_dir, partitioned_events):
    got = (
        spark.read.parquet(partitioned_events)
        .where(F.col("event_type") == "purchase")
        .count()
    )
    want = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert got == want


def test_partition_and_pushdown_compose(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).where(
        (F.col("event_type") == "click") & (F.col("value") > 0.5)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # dir-level pruning on the partition col AND row-group pushdown on value
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0]
    assert "value" in plan.split("PushedFilters")[1].split("]")[0]


# ---------------------------------------------------------------------------
# parallelism_floor: leaf-parallelism guard for single-row-group inputs
# ---------------------------------------------------------------------------


def test_parallelism_floor_widens_single_partition_scan(spark, sf_dir):
    from common_survey_data_pipeline_spark.sources.tables import (
        parallelism_floor,
    )

    docs = load_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == 1  # one file, one row group
    floored = parallelism_floor(docs)
    want = spark.sparkContext.defaultParallelism
    assert floored.rdd.getNumPartitions() == want
    # round-robin rebalance, never a keyed shuffle
    plan = floored._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan
    assert "hashpartitioning" not in plan
    # row-preserving
    assert floored.count() == docs.count()


def test_parallelism_floor_is_noop_on_wide_input(spark, sf_dir):
    from common_survey_data_pipeline_spark.sources.tables import (
        parallelism_floor,
    )

    want = spark.sparkContext.defaultParallelism
    wide = load_table(spark, sf_dir, "documents").repartition(want)
    # production shape (scan already >= cores): returns the SAME frame,
    # so the floor can never introduce a shuffle on a real corpus
    assert parallelism_floor(wide) is wide


def test_parallelism_floor_preserves_scan_pushdown(spark, sf_dir):
    from common_survey_data_pipeline_spark.sources.tables import (
        parallelism_floor,
    )

    df = parallelism_floor(load_table(spark, sf_dir, "documents")).where(
        F.col("lang") == "en"
    ).select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst pushes the predicate and the column pruning through the
    # round-robin exchange down to the parquet scan
    assert "lang" in plan.split("PushedFilters")[1].split("]")[0]
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema


def test_parallelism_floor_noops_in_fingerprints_on_wide_input(
    spark, sf_dir, tmp_path
):
    """Integration pin for the floor's scale contract: the SAME registry
    query that carries a round-robin exchange on a single-row-group
    input compiles to a ZERO-exchange plan when the input is already
    wide (multi-file, >= cores) — i.e. on a production-shaped corpus
    the floor provably adds no shuffle."""
    from common_survey_data_pipeline_spark.workload import REGISTRY

    wide_dir = str(tmp_path / "wide_sf")
    want = spark.sparkContext.defaultParallelism
    load_table(spark, sf_dir, "documents").repartition(want).write.parquet(
        f"{wide_dir}/documents.parquet"
    )
    df = REGISTRY["text_fingerprints"].fn(spark, wide_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
