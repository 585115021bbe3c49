"""Join-quality conditional aggregates (SURVEY.md §2.4 A1, §2.11 L1).

The reference logs exact/fuzzy/unmatched match counts after each join
pass (``/root/reference/varinfo-update.R:110-118,128-136``). Here the
counts are ONE aggregation (map-side partial + a tiny shuffle), returned
as a dict for the pipeline's logging."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _count_if(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def fuzzy_match_stats(
    fuzzy_joined: DataFrame,
    total_rows: int,
    matched_col: str,
    distance_col: str = "string_distance",
) -> dict[str, int]:
    """exact / fuzzy / unmatched counts out of ``total_rows`` new
    variables (varinfo-update.R:110-113 semantics: a match counts only
    when the matched variable-name column is non-null)."""
    matched = F.col(f"`{matched_col}`").isNotNull()
    dist = F.col(f"`{distance_col}`")
    row = fuzzy_joined.agg(
        _count_if((dist == 0) & matched).alias("exact"),
        _count_if(dist.isNotNull() & (dist > 0) & matched).alias("fuzzy"),
    ).collect()[0]
    exact = int(row["exact"] or 0)
    fuzzy = int(row["fuzzy"] or 0)
    return {
        "total": total_rows,
        "exact": exact,
        "fuzzy": fuzzy,
        "unmatched": total_rows - exact - fuzzy,
    }


def total_match_stats(
    joined: DataFrame, total_rows: int, matched_col: str, prior_unmatched: int
) -> dict[str, int]:
    """Post-coalescing-join totals (varinfo-update.R:128-136)."""
    n_matched = joined.where(F.col(f"`{matched_col}`").isNotNull()).count()
    unmatched = total_rows - n_matched
    return {
        "total": total_rows,
        "total_matched": n_matched,
        "additional_matches": prior_unmatched - unmatched,
        "still_unmatched": unmatched,
    }
