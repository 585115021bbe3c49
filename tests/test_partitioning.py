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
