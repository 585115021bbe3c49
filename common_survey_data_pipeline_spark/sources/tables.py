"""Loaders for the driver's synthetic Parquet tables (TESTDATA.md).

Parquet is the engine's native format: columnar, predicate-pushdown- and
column-pruning-friendly, splittable — the right substrate for 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to always broadcast in star joins
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; normalizes TIMESTAMP(NANOS) columns.

    The ``events`` table is written with nanosecond parquet timestamps,
    which Spark refuses to read as timestamps; we read them as raw
    nanos (legacy conf) and truncate to microseconds — the same
    truncation DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TPCH_TABLES
) -> None:
    """Register every table as a temp view so the whole engine surface
    is reachable from ``spark.sql(...)`` — the DataFrame operators and
    the SQL API compile to the same Catalyst plans."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
