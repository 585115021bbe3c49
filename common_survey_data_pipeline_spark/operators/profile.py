"""Column profiling — the ANALYZE-TABLE operator a pipeline runs
before trusting a new source: per column, null counts, exact distinct
cardinality, and a self-certified approximate-distinct sketch.

Scale shape: ONE aggregation pass produces every column's statistics
as a single wide row (map-side combinable; the exact count-distincts
expand the scan by #profiled-columns — at true 100 TB profile width is
the dial, or drop exactness and keep only the HLL sketch, which is one
pass with constant state). The wide row then unpivots to one row per
column via ``stack`` — a 1-row driver-free reshape.

The approx-distinct CERTIFICATE follows the repo's sketch-contract
pattern (``quantile_error_certificate``): each engine certifies its
OWN single-pass HLL against its own exact count (relative error ≤ 5%),
so a sketch regression breaks the value hash while cross-engine HLL
implementation differences (different registers) never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols``: one row per column —
    ``(column_name, n_rows, n_nulls, n_distinct, approx_distinct_ok)``.

    ``n_distinct`` counts distinct non-null values (SQL semantics);
    ``approx_distinct_ok`` certifies this engine's HLL
    (``approx_count_distinct``, rsd 2.5%) within 5% relative error of
    the exact count (vacuously true for an all-null column).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.approx_count_distinct(F.col(c), 0.025).alias(f"__ad_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __ad_{c}" for c in cols
    )
    tall = wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, approx_nd)",
    )
    return tall.select(
        "column_name",
        F.col("__n").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.when(F.col("n_distinct") == 0, F.lit(True))
        .otherwise(
            (
                F.abs(F.col("approx_nd") - F.col("n_distinct"))
                / F.col("n_distinct")
            )
            <= 0.05
        )
        .alias("approx_distinct_ok"),
    )
