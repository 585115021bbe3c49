"""Bucketed-table IO: pre-shuffled, co-located storage for repeated
joins/aggregations on the same key.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem⋈orders,
or event-stream⋈entity-history) is the shuffle of both sides. Bucketing
pays that shuffle ONCE at write time: both tables hash-partitioned into
the same number of buckets on the join key, so every subsequent join or
groupBy on that key runs with NO Exchange — each task reads matching
bucket files from both sides. This is Spark's native equivalent of the
co-located/clustered table layouts in warehouse engines.

Rules enforced here:
* both sides bucketed by the SAME key set and bucket count;
* buckets sorted by the key so the join is a zip-merge, not a hash build;
* bucket count chosen for target-scale task size (``buckets ≈
  table_bytes / 256 MiB`` at the large end), NOT for the test laptop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    *keys: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted managed table."""
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)
