"""JSON-Lines source/sink — the lingua franca of LLM training corpora.

Spark's json reader is line-splittable: a 100 TB corpus of .jsonl(.gz →
NOT splittable; prefer zstd/uncompressed or re-shard) files parallelizes
per-line with no coordination. Schema is always passed EXPLICITLY here:
``spark.read.json`` without a schema runs a full inference scan first —
double-reading 100 TB before the real job starts is never acceptable.

Sharded writing targets a fixed number of rows per output shard so that
downstream loaders (which typically stream whole shards) see uniform
units of work, independent of upstream partitioning skew.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    ``mode`` follows Spark's json reader: PERMISSIVE (salvage bad lines
    into ``corrupt_col``), DROPMALFORMED, or FAILFAST. For web-scraped
    corpora PERMISSIVE + a corrupt-record audit count is the right
    default — silently dropping malformed lines hides extraction bugs.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if mode == "PERMISSIVE" and corrupt_col and corrupt_col not in schema.names:
        schema = schema.add(corrupt_col, "string")
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col or "_corrupt_record")
        .json(path)
    )


def corrupt_line_count(
    spark: SparkSession, path: str, schema: StructType | str
) -> int:
    """Audit count of lines that do not parse as JSON objects.

    Deliberately NOT a filter on the PERMISSIVE reader's
    ``_corrupt_record`` — Spark forbids queries that reference only the
    corrupt column on a raw json scan (its fix, ``.cache()``, is a
    non-starter at corpus scale). A text scan + ``from_json`` with its
    own corrupt-record slot is one pass, no cache, and parse-equivalent
    to the reader's salvage behavior.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if "_corrupt" not in schema.names:
        schema = schema.add("_corrupt", "string")
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            "value", schema, {"columnNameOfCorruptRecord": "_corrupt"}
        ).alias("p")
    )
    return parsed.where(F.col("p._corrupt").isNotNull()).count()


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    total_rows: int | None = None,
) -> int:
    """Write ``df`` as JSON-Lines in ~fixed-size shards; returns the
    shard count.

    Uses a round-robin ``repartition(n)`` (AQE coalescing is disabled
    for the write by the explicit numPartitions) so every shard holds
    ~``rows_per_shard`` rows regardless of how skewed the input
    partitioning was. ``total_rows`` skips the extra count scan when the
    caller already knows it.
    """
    n = total_rows if total_rows is not None else df.count()
    shards = max(1, math.ceil(n / rows_per_shard))
    df.repartition(shards).write.mode("overwrite").json(path)
    return shards
