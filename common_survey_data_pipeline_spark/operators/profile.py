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


# ---------------------------------------------------------------------------
# Mergeable incremental profiling (VERDICT r7 item 5): the profiler's
# counterpart of the band-table lifecycle — per-batch state folds into
# a running profile instead of recomputing the concatenated corpus.
# ---------------------------------------------------------------------------


def profile_state(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row WIDE mergeable profile state for ``cols``: total row
    count, and per column null count, typed min/max extremes, and a
    Datasketches HLL sketch (``hll_sketch_agg``, lgConfigK=12 ≈ 1.6%
    rsd) over the column's injective string cast (timestamps/doubles
    round-trip distinct-cardinality-preserving; HLL input types are
    limited, the cast is the portability shim).

    Every field is an algebraic merge monoid — counts add, extremes
    min/max, sketches ``hll_union_agg`` — so N batch states fold into
    the exact profile of the concatenation (sketch within its own
    certificate): :func:`merge_profile_states`. The state row is what
    an ingest pipeline PERSISTS next to the band table; each appended
    batch costs one O(batch) pass, never a corpus recompute.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.min(F.col(c)).alias(f"__min_{c}"),
            F.max(F.col(c)).alias(f"__max_{c}"),
            F.hll_sketch_agg(F.col(c).cast("string"), F.lit(12)).alias(
                f"__hll_{c}"
            ),
        ]
    return df.agg(*aggs)


def merge_profile_states(states: list[DataFrame]) -> DataFrame:
    """Fold N wide state rows (same schema) into one: counts sum,
    extremes min/max, sketches union — associative and commutative, so
    ingest order never matters and a tree-merge works at any fan-in."""
    if not states:
        raise ValueError("merge_profile_states: no states to merge")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    aggs = []
    for f in u.schema.fields:
        n = f.name
        if n == "__n" or n.startswith("__nulls_"):
            aggs.append(F.sum(n).alias(n))
        elif n.startswith("__min_"):
            aggs.append(F.min(n).alias(n))
        elif n.startswith("__max_"):
            aggs.append(F.max(n).alias(n))
        elif n.startswith("__hll_"):
            aggs.append(F.hll_union_agg(F.col(n), F.lit(True)).alias(n))
        else:
            raise ValueError(f"unexpected profile-state field {n!r}")
    return u.agg(*aggs)


def profile_from_state(state: DataFrame, cols: list[str]) -> DataFrame:
    """Render a (possibly merged) wide state as the tall profile:
    ``(column_name, n_rows, n_nulls, min_val, max_val, distinct_est)``
    — extremes cast to string for the uniform tall shape, the distinct
    estimate read from the HLL sketch (0 for all-null columns, whose
    sketch is empty)."""
    est = state.select(
        "*",
        *[
            F.coalesce(
                F.hll_sketch_estimate(F.col(f"__hll_{c}")), F.lit(0)
            ).alias(f"__est_{c}")
            for c in cols
        ],
    )
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, CAST(__min_{c} AS STRING), "
        f"CAST(__max_{c} AS STRING), __est_{c}"
        for c in cols
    )
    tall = est.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, min_val, max_val, distinct_est)",
    )
    return tall.select(
        "column_name",
        F.col("__n").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        "min_val",
        "max_val",
        F.col("distinct_est").cast("long").alias("distinct_est"),
    )
