"""Robustness sweep: every registry query runs (and returns a plan-
valid, possibly empty result) against a ZERO-ROW mirror of the schema.

Empty partitions are not an edge case at scale — they are the steady
state (date partitions with no data yet, filters that eliminate whole
tables, first run of an incremental pipeline). An operator that throws
on empty input fails the first production backfill."""

from __future__ import annotations

import pytest

from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.workload import REGISTRY

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    path = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.limit(0).write.parquet(str(path / f"{t}.parquet"))
    return str(path)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    out = REGISTRY[name].fn(spark, empty_sf_dir)
    n = out.count()
    assert n >= 0
    assert len(out.schema.fields) > 0


@pytest.fixture(scope="module")
def nullrow_sf_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 data plus ONE all-null row per table — the corrupt-row
    shape a 100 TB ingest always eventually contains."""
    from pyspark.sql import functions as F

    path = tmp_path_factory.mktemp("sf_nullrow")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        null_row = df.limit(1).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in df.schema.fields]
        )
        df.unionByName(null_row).write.parquet(str(path / f"{t}.parquet"))
    return str(path)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_null_rows(spark, nullrow_sf_dir, name):
    out = REGISTRY[name].fn(spark, nullrow_sf_dir)
    assert out.count() >= 0
