"""Mergeable-sketch operators: frequent-item (heavy hitter) detection
via per-partition Misra–Gries candidate summaries plus an exact
verification pass.

Scale rationale (the whole point of this module): exact token counts
over a 100 TB corpus shuffle |vocabulary| keys — fine for aggregate
stats, but when the question is only "which tokens exceed an x = 1/k
frequency fraction?" the full-vocab shuffle is waste. The classic
streaming answer (Misra & Gries 1982; Agarwal et al., "Mergeable
Summaries", PODS 2012) bounds the candidate set at k counters per
partition with the guarantee that EVERY item of global frequency
> N/(k+1) survives in the union of per-partition summaries. We then
run an EXACT count restricted to that candidate set (a broadcast
semi-join — the candidate set is O(k · partitions) tokens, i.e. KB),
so the final answer is exact, deterministic, and oracle-checkable with
plain GROUP BY / HAVING SQL, while the shuffle only ever carries
candidate tokens.

Two Arrow-batched stages, no row-at-a-time Python:

1. ``mapInPandas`` summary build — per Arrow batch, ``value_counts``
   (C-speed) then a batch-granularity Misra–Gries merge: add the batch
   counts, and when the summary exceeds k entries subtract the (k+1)-th
   largest weight from everything and drop the non-positive (the
   standard mergeable-summaries reduction, vectorized with numpy).
2. Exact verify — explode tokens, broadcast-join the candidate set,
   one grouped count over candidates only, filter by the frequency
   threshold computed from a 1-row total (no full-vocab state
   anywhere).

The per-partition guarantee composes under union by an averaging
argument: if an item's global count f > N/(k+1) = Σ n_p/(k+1), then in
at least one partition f_p > n_p/(k+1), so that partition's summary
retains it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["misra_gries_candidates", "heavy_hitter_tokens"]


def _mg_reduce(counts: "pd.Series", k: int) -> "pd.Series":
    """Misra–Gries reduction of a (token → weight) series to ≤ k
    entries: subtract the (k+1)-th largest weight from all, keep the
    strictly-positive survivors. Vectorized; O(u log u) in the number
    of unique tokens currently tracked."""
    if len(counts) <= k:
        return counts
    # (k+1)-th largest value — everything must shrink by at least this
    # much for the summary to fit in k counters
    kth = counts.nlargest(k + 1).iloc[k]
    reduced = counts - kth
    return reduced[reduced > 0]


def misra_gries_candidates(
    tokens_df: DataFrame, token_col: str = "token", k: int = 200
) -> DataFrame:
    """Per-partition Misra–Gries summaries of a one-column token frame.

    Returns ``(token, weight)`` rows — at most ``k`` per input
    partition — such that any token with global frequency
    > N/(k+1) appears in at least one partition's summary. ``weight``
    is the MG lower bound (true partition count minus at most
    n_partition/(k+1)); it is NOT the exact count — callers needing
    exactness join back to the data (see :func:`heavy_hitter_tokens`).
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            batch_counts = pdf[token_col].value_counts()
            summary = (
                batch_counts
                if summary.empty
                else summary.add(batch_counts, fill_value=0).astype("int64")
            )
            summary = _mg_reduce(summary, k)
        if summary.empty:
            return
        yield pd.DataFrame(
            {token_col: summary.index.astype(str), "weight": summary.values}
        )

    return tokens_df.mapInPandas(mg, schema=f"{token_col} string, weight long")


def heavy_hitter_tokens(
    tokens_df: DataFrame,
    total_tokens: DataFrame,
    token_col: str = "token",
    k: int = 200,
) -> DataFrame:
    """Exact set of tokens whose global count exceeds N/k, found without
    a full-vocabulary shuffle.

    ``tokens_df``: one-column frame of tokens (pre-exploded).
    ``total_tokens``: a 1-row DataFrame with column ``total`` = N
    (computed by the caller, usually a cheap sum of per-doc token
    counts — no explode needed).

    Plan: MG summaries (narrow, k counters/partition) → distinct
    candidate tokens (O(k·P) rows, broadcast) → semi-join + grouped
    count over candidates only → threshold filter against the
    broadcast 1-row total. Output: ``(token, cnt)``, exact, identical
    to ``GROUP BY token HAVING cnt * k > N``.
    """
    candidates = (
        misra_gries_candidates(tokens_df, token_col=token_col, k=k)
        .select(token_col)
        .distinct()
    )
    exact = (
        tokens_df.join(F.broadcast(candidates), token_col)
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.crossJoin(F.broadcast(total_tokens)).where(
        F.col("cnt") * k > F.col("total")
    ).select(token_col, "cnt")
