"""ORC source/sink — the same partitioned/sorted/size-bounded layout
contract as ``parquet_sink.write_partitioned_parquet``, for deployments
whose lakehouse standard is ORC rather than parquet. ORC carries the
same row-group min/max statistics, so the sort-within-partition layout
buys identical data skipping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_within_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    compression: str = "zstd",
) -> None:
    """Write ``df`` as a partitioned, sorted, size-bounded ORC table
    (see ``write_partitioned_parquet`` for the layout rationale; both
    delegate to the same layout kernel)."""
    from common_survey_data_pipeline_spark.sources.parquet_sink import (
        _write_partitioned,
    )

    _write_partitioned(
        df, path, "orc", partition_by, sort_within_by,
        max_records_per_file, compression,
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC table; partition-directory columns come back as
    regular columns and partition-value predicates prune directories
    exactly as with parquet."""
    return spark.read.orc(path)
