"""Distributed 2-D skyline (Pareto frontier): the non-dominated set
under (minimize x, maximize y).

Scale shape — the classic two-phase distributed skyline:

1. **Local frontier** per partition (Arrow ``mapInPandas``, narrow):
   each partition reduces to its own Pareto frontier with a vectorized
   sort + cumulative-max sweep. A point dominated inside a partition is
   dominated globally, so this never discards a global-frontier point;
   it shrinks N rows to O(frontier) per partition before anything
   moves.
2. **Global sweep** over the unioned local frontiers (one shuffle of
   the tiny candidate set to a single task, same sweep). The global
   input is Σ local-frontier sizes — for realistic value distributions
   orders of magnitude below N; a skew-proof variant adds more merge
   levels (tree reduction), not a different algorithm.

Dominance is the standard strict-Pareto rule: A dominates B iff
A.x ≤ B.x AND A.y ≥ B.y AND (A.x < B.x OR A.y > B.y). Exact duplicates
of a frontier point do NOT dominate each other — all copies stay, which
the sweep honors by operating on DISTINCT (x, y) pairs and re-joining.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def _frontier_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact Pareto frontier of DISTINCT (x, y) pairs: per-x max y
    (same x, larger y dominates), then a strict cumulative-max sweep
    over ascending x (lower x with y ≥ current dominates)."""
    if pdf.empty:
        return pdf
    xc, yc = pdf.columns[0], pdf.columns[1]
    per_x = pdf.groupby(xc, as_index=False)[yc].max().sort_values(xc)
    cummax_prev = per_x[yc].cummax().shift(1)
    keep = cummax_prev.isna() | (per_x[yc] > cummax_prev)
    return per_x[keep.values]


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier (minimize ``x_col``,
    maximize ``y_col``). Null coordinates are excluded (incomparable).

    Returns the INPUT rows (all columns), every copy of each frontier
    point included.
    """
    pairs = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(F.col(x_col).alias("__sky_x"), F.col(y_col).alias("__sky_y"))
        .distinct()
    )

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = []
        for pdf in batches:
            acc.append(pdf)
        if acc:
            out = _frontier_pairs(pd.concat(acc, ignore_index=True))
            if not out.empty:
                yield out

    schema = pairs.schema
    local_frontier = pairs.mapInPandas(local, schema=schema)
    # global sweep: one task over the tiny candidate union
    global_frontier = local_frontier.repartition(1).mapInPandas(
        local, schema=schema
    )
    return df.join(
        F.broadcast(global_frontier),
        (F.col(x_col) == F.col("__sky_x")) & (F.col(y_col) == F.col("__sky_y")),
    ).drop("__sky_x", "__sky_y")
