"""Time-series repair operators.

LOCF (last observation carried forward) generalizes the reference's
null-fill step (``replace_na`` at /root/reference/varinfo-update.R:98)
from a constant fill to a temporal fill: a missing reading takes the
most recent valid one within its key's history. One partitioned window,
no self-join — at scale the window partitions by the series key, so the
fill is a single shuffle on that key and state never leaves a
partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def locf_fill(
    df: DataFrame,
    value: Column | str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_name: str = "value_filled",
) -> DataFrame:
    """Append ``out_name``: ``value`` where non-null, else the most
    recent non-null ``value`` within the same partition (ordered by
    ``order_cols``); null while no observation has been seen yet.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    col = F.col(value) if isinstance(value, str) else value
    return df.withColumn(out_name, F.last(col, ignorenulls=True).over(w))


def scd2_compress(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse each key's
    event sequence into attribute versions with validity intervals.

    Consecutive rows with the same ``attr_col`` value are compressed to
    one version; each version carries ``valid_from`` (its first
    timestamp), ``valid_to`` (the next version's start, NULL while
    current), and a 1-based ``version`` number. ``tiebreak_col`` makes
    the ordering total when timestamps collide.

    Two windows over the SAME (key, ts, tiebreak) partitioning — Spark
    plans them into a single shuffle + sort, so the whole history build
    is one pass per key. State is bounded by a key's own history length,
    never corpus size, so the operator survives 100 TB as long as no
    single key holds an unbounded fraction of the data (the same
    contract as any per-key window).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(attr_col).over(w)
    # null-safe change test: `attr != prev` is NULL (not true) when
    # either side is NULL, which would drop transitions TO a NULL value
    # and emit duplicate versions for consecutive NULLs; the explicit
    # first-row test (row_number, not `prev IS NULL`) keeps a history
    # that STARTS with a NULL attribute
    changes = (
        df.select(
            key_col,
            attr_col,
            ts_col,
            tiebreak_col,
            prev.alias("_prev"),
            F.row_number().over(w).alias("_rn"),
        )
        .where(
            (F.col("_rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("_prev"))
        )
        .drop("_prev", "_rn")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        key_col,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )
