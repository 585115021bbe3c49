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
