"""Coalescing left equi-join (SURVEY.md §2.3 J3).

Generic re-expression of the reference's ``coalesce_left_join``
(``/root/reference/varinfo-update.R:67-90``): left join, then for every
column name present in BOTH inputs emit ``coalesce(x.col, y.col)`` —
x's value wins when non-null — with a final projection of
``union(x.columns, y.columns)`` in x-then-y order.

This is the engine's incremental-merge primitive: "new administration
arrives → upsert into the cumulative codebook" is exactly a coalescing
left join keyed on the variable name, and generalizes to any
slowly-growing wide dimension at scale (the join is a plain equi join —
broadcastable when the delta is small, shuffle-hash otherwise; Catalyst
picks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coalesce_left_join(
    x: DataFrame,
    y: DataFrame,
    left_on: str,
    right_on: str | None = None,
    how: str = "left",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join ``x`` with ``y`` on ``x[left_on] == y[right_on]`` and merge
    same-named columns with x-wins coalesce.

    ``right_on`` defaults to ``left_on``. Both key columns are kept in
    the output when their names differ (dplyr ``keep=TRUE`` parity with
    the reference call at varinfo-update.R:121-126).
    """
    if right_on is None:
        right_on = left_on
    xa = x.alias("__x")
    ya = y.alias("__y")
    if broadcast_right:
        ya = F.broadcast(ya)
    joined = xa.join(ya, F.col(f"__x.`{left_on}`") == F.col(f"__y.`{right_on}`"), how)

    x_cols = list(x.columns)
    y_cols = list(y.columns)
    both = set(x_cols) & set(y_cols)
    # output projection: union(names(x), names(y)) in x-then-y order
    out = []
    for c in x_cols:
        if c in both:
            out.append(F.coalesce(F.col(f"__x.`{c}`"), F.col(f"__y.`{c}`")).alias(c))
        else:
            out.append(F.col(f"__x.`{c}`").alias(c))
    for c in y_cols:
        if c not in both:
            out.append(F.col(f"__y.`{c}`").alias(c))
    return joined.select(*out)
