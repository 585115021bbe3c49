"""Round-trip and layout tests for the ORC source/sink."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.orc import (
    read_orc,
    write_partitioned_orc,
)
from common_survey_data_pipeline_spark.sources.tables import load_table


def test_orc_round_trip_partitioned(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_orc")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned_orc(
        ev, path, partition_by=["event_type"], sort_within_by=["ts"]
    )
    back = read_orc(spark, path)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)
    # values survive: per-type counts identical
    want = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    got = {r["event_type"]: r["n"] for r in back.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got == want
    # hive-style partition directories exist
    assert glob.glob(os.path.join(path, "event_type=*"))


def test_orc_partition_pruning_in_plan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_orc2")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned_orc(ev, path, partition_by=["event_type"])
    one = ev.select("event_type").first()["event_type"]
    q = read_orc(spark, path).where(F.col("event_type") == one)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the scan must carry a partition filter, not read-all-then-filter
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    assert q.count() > 0
