"""Scale-aware partitioned Parquet sink for corpus/fact tables.

The three decisions that matter when writing 100 TB:

1. **Partition columns** — low-cardinality routing keys (lang, source,
   date) become directory levels, so downstream readers prune whole
   subtrees (`WHERE lang = 'en'` never lists other languages' files).
   Never partition by a high-cardinality key: one directory per value
   murders the metastore and the file system.
2. **File sizing** — `maxRecordsPerFile` bounds the big side;
   `repartition(cols)` before the write puts each output partition's
   rows in the same task so a partition writes few large files instead
   of #tasks × #partitions shards (the classic small-files explosion).
3. **Row ordering** — `sortWithinPartitions` on the query keys gives
   parquet row-group min/max statistics real selectivity, which is what
   makes predicate pushdown skip row groups at read time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def _write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_by: Sequence[str],
    sort_within_by: Sequence[str],
    max_records_per_file: int,
    compression: str,
) -> None:
    """Shared layout kernel for the partitioned columnar writers
    (parquet here, ORC in ``sources/orc.py``) — ONE implementation of
    the repartition/sort/size-bound contract so the two formats cannot
    drift."""
    out = df
    if partition_by:
        out = out.repartition(*partition_by)
    if sort_within_by:
        # partition columns lead the sort: the dynamic-partition writer
        # requires rows ordered by partition value and would otherwise
        # re-sort (unstably), destroying the data ordering we just paid
        # for
        out = out.sortWithinPartitions(*partition_by, *sort_within_by)
    writer = (
        out.write.mode("overwrite")
        .format(fmt)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_within_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    compression: str = "zstd",
) -> None:
    """Write ``df`` as a partitioned, sorted, size-bounded parquet table.

    ``repartition(partition_by)`` routes every output-partition's rows to
    one task (no small-files explosion); ``sortWithinPartitions`` orders
    rows inside each file for row-group stats; ``maxRecordsPerFile``
    splits oversized partitions into bounded files. zstd: best
    size/speed trade for cold corpus storage, splittable in parquet.
    """
    _write_partitioned(
        df, path, "parquet", partition_by, sort_within_by,
        max_records_per_file, compression,
    )


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_by: Sequence[str],
    num_files: int | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Globally-sorted parquet export WITHOUT a single-task sort:
    ``repartitionByRange`` samples the sort keys and range-partitions
    rows across ``num_files`` tasks (each gets a contiguous key range),
    then each task sorts only its own partition. File N's key range ends
    before file N+1's begins, so a reader merging files in name order
    sees global order, and every file's row-group min/max stats are
    tight, non-overlapping ranges — maximum pushdown selectivity for
    range predicates on the sort key.

    This is the scalable form of ``ORDER BY`` + write: the classic
    ``df.orderBy(...).write`` collapses to one partition-less sort whose
    final merge bottlenecks on a single machine's spill throughput;
    range partitioning keeps every stage at width ``num_files``."""
    if num_files:
        out = df.repartitionByRange(num_files, *sort_by)
    else:
        out = df.repartitionByRange(*sort_by)
    (
        out.sortWithinPartitions(*sort_by)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def file_fragmentation_report(spark, path: str) -> dict:
    """Fragmentation stats of a parquet table: file count and
    rows-per-file min/avg/max, computed from ``input_file_name()`` in
    one scan — the signal that decides whether `compact_parquet` is
    worth running. (Byte sizes would come from the storage listing; row
    counts are the engine-side proxy that needs no FS round-trip.)"""
    from pyspark.sql import functions as F

    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .count()
    )
    row = per_file.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.min("count").alias("min_rows"),
        F.avg("count").alias("avg_rows"),
        F.max("count").alias("max_rows"),
    ).collect()[0]
    # zero-row table: the aggregates are NULL, not 0 — report an empty
    # layout instead of dying on float(None)
    return {
        "n_files": row["n_files"],
        "min_rows": row["min_rows"] if row["min_rows"] is not None else 0,
        "avg_rows": float(row["avg_rows"]) if row["avg_rows"] is not None else 0.0,
        "max_rows": row["max_rows"] if row["max_rows"] is not None else 0,
    }


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_rows_per_file: int = 1_000_000,
    sort_within_by: Sequence[str] = (),
    compression: str = "zstd",
) -> int:
    """Small-files compaction (the nightly table-maintenance job):
    rewrite a fragmented parquet directory into ``ceil(rows/target)``
    right-sized files, optionally re-sorting within files to restore
    row-group statistics. Returns the output file count.

    The repartition is a single full shuffle of the table — the price
    of compaction — so at 100 TB this runs per PARTITION of a
    date-partitioned table (compact yesterday's directory, not the
    whole corpus), which keeps each run's shuffle bounded by one
    partition's size."""
    df = spark.read.parquet(src)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        # explicit codec: maintenance must not silently re-encode a
        # zstd table to the session default (snappy); zstd matches the
        # partitioned writers' cold-storage default
        .option("compression", compression)
        .parquet(dst)
    )
    return n_files
