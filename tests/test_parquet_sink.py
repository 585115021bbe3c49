"""Partitioned parquet sink: directory pruning layout, bounded file
sizes, one-file-per-partition routing, and row-group-ordered data."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.parquet_sink import (
    write_partitioned_parquet,
)


def test_partition_directories_and_routing(spark, tmp_path):
    out = str(tmp_path / "t1")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket"),
    )
    write_partitioned_parquet(df, out, partition_by=["bucket"])
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out, "bucket=*"))
    )
    assert dirs == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    # repartition-by-key routing → each partition wrote exactly one file
    for d in dirs:
        files = glob.glob(os.path.join(out, d, "*.parquet"))
        assert len(files) == 1, d
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.where(F.col("bucket") == "2").count() == 250


def test_max_records_splits_files(spark, tmp_path):
    out = str(tmp_path / "t2")
    df = spark.range(900).select(F.col("id"), F.lit("x").alias("k"))
    write_partitioned_parquet(
        df, out, partition_by=["k"], max_records_per_file=250
    )
    files = glob.glob(os.path.join(out, "k=x", "*.parquet"))
    # 900 rows / ≤250 per file → at least 4 files, none above the bound
    assert len(files) >= 4
    assert all(pq.read_metadata(f).num_rows <= 250 for f in files)


def test_sort_within_partitions_orders_row_groups(spark, tmp_path):
    out = str(tmp_path / "t3")
    # reverse the ids so an unsorted write would leave them descending
    df = spark.range(500).select(
        (499 - F.col("id")).alias("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    write_partitioned_parquet(
        df, out, partition_by=["p"], sort_within_by=["id"]
    )
    for f in glob.glob(os.path.join(out, "p=*", "*.parquet")):
        ids = pq.read_table(f, columns=["id"])["id"].to_pylist()
        assert ids == sorted(ids), f


def test_fragmentation_report_empty_table(spark, tmp_path):
    """A schema-only (zero-row) table reports an empty layout instead
    of dying on float(None) (regression)."""
    from common_survey_data_pipeline_spark.sources.parquet_sink import (
        file_fragmentation_report,
    )

    path = str(tmp_path / "empty_tbl")
    spark.createDataFrame([], "id long, v double").write.parquet(path)
    rep = file_fragmentation_report(spark, path)
    assert rep["min_rows"] == 0 and rep["max_rows"] == 0
    assert rep["avg_rows"] == 0.0
