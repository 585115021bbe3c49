"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual workload lives in
``common_survey_data_pipeline_spark/workload.py`` — every operator from
SURVEY.md §2 plus the dedup/similarity/text/multimodal/streaming
extension surface, with each DuckDB oracle defined next to its Spark
plan.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_survey_data_pipeline_spark.workload import REGISTRY, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extension
    surface). Each callable takes (spark, sf_dir) and returns a
    DataFrame; column names/dtypes are aligned with ``oracle_sql``."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (tables pre-registered as
    views). Rows-only entries (no SQL-expressible oracle: sign-LSH and
    IVF — hyperplane/KMeans-centroid literals; approx_count_distinct —
    HLL sketch estimates are implementation-specific) are omitted.
    """
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
