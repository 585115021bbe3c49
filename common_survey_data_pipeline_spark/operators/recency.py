"""Recency ranking over dynamic SurveyAdmin* column families.

Re-expresses ``sort_varinfo`` (``/root/reference/varinfo-update.R:
157-223``) as pure columnar Spark — no rowwise loop, no UDF:

1. discover ``^SurveyAdmin`` columns and order them by the integer formed
   by concatenating every digit run in the name (``"SurveyAdminTerm25-2"``
   → 252, ``"SurveyAdminYear2023"`` → 2023; varinfo-update.R:164-170),
2. pull the single distinct non-null/non-empty value of each column in
   ONE aggregation pass (reference does a per-column loop; :172-185),
3. build a value→rank map (rank 1 = most recent; first occurrence wins on
   duplicate values, matching R named-vector lookup; :187),
4. per row, ``most_recent`` = the value whose rank is smallest among the
   row's non-null SurveyAdmin values that appear in the rank map — a
   ``least()`` over map lookups instead of the reference's rowwise R loop
   (:193-211),
5. ``priority`` = -1 for administrative/metadata items else the rank
   (:213-216; R's ``x %in% set`` is FALSE for NA, and Spark's
   ``when(NULL-cond)`` also falls through to ``otherwise`` — same rows
   take the else branch, no translation shim needed),
6. global sort by (priority ASC NULLS LAST, row_id) — R ``arrange`` puts
   NA last; Spark's default is nulls-first, so ``asc_nulls_last`` is
   load-bearing (SURVEY.md §2.6 O1).

Scale note: step 2 is a full-table aggregate but over a handful of
near-constant columns — partial aggregation makes the shuffle a few
bytes per partition. The final global sort is the only range shuffle,
and it is required by the output contract.
"""

from __future__ import annotations

import re
import warnings
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADMIN_ITEM_TYPES = ("administrative", "metadata")


def recency_digit_key(col_name: str) -> int | None:
    """Digit-concat ordering key of a SurveyAdmin column name
    (varinfo-update.R:166-168): 'SurveyAdminTerm25-2' → 252."""
    digits = "".join(re.findall(r"\d+", col_name))
    return int(digits) if digits else None


def discover_recency_columns(columns: Sequence[str]) -> list[str]:
    """All ``SurveyAdmin*`` columns, newest digit-key first (stable for
    equal keys, matching R ``order(..., decreasing=TRUE)``)."""
    cols = [c for c in columns if c.startswith("SurveyAdmin")]
    keyed = [(recency_digit_key(c), i, c) for i, c in enumerate(cols)]
    # R order(decreasing=TRUE) puts NA keys last; emulate with -inf
    keyed.sort(key=lambda t: (-(t[0] if t[0] is not None else float("-inf")), t[1]))
    return [c for _, _, c in keyed]


def extract_recency_values(df: DataFrame, recency_cols: Sequence[str]) -> list[str | None]:
    """Single distinct non-null/non-empty value per recency column, in
    one aggregation pass (SURVEY.md §2.4 A2). Warns and takes the
    smallest value if a column holds >1 distinct value (the reference
    takes the first in file order — nondeterministic under Spark, so the
    engine's deterministic choice is documented here)."""
    if not recency_cols:
        return []
    aggs = [
        F.array_sort(
            F.collect_set(F.when(F.col(f"`{c}`") != "", F.col(f"`{c}`")))
        ).alias(c)
        for c in recency_cols
    ]
    row = df.agg(*aggs).collect()[0]
    values: list[str | None] = []
    for c in recency_cols:
        vals = row[c]
        if not vals:
            values.append(None)
        else:
            if len(vals) > 1:
                warnings.warn(
                    f"Column {c} has >1 distinct non-NA values; using {vals[0]!r}"
                )
            values.append(vals[0])
    return values


def build_recency_rank(recency_values: Sequence[str | None]) -> dict[str, int]:
    """value → 1-based rank (1 = most recent); first occurrence wins on
    duplicates, as with R named-vector lookup (varinfo-update.R:187)."""
    rank: dict[str, int] = {}
    for i, v in enumerate(recency_values, start=1):
        if v is not None and v not in rank:
            rank[v] = i
    return rank


def with_most_recent(
    df: DataFrame,
    recency_cols: Sequence[str],
    recency_rank: dict[str, int],
    out_col: str = "most_recent",
) -> DataFrame:
    """Columnar most-recent-administration per row: min-rank lookup over
    the row's SurveyAdmin values (varinfo-update.R:193-211)."""
    if not recency_cols or not recency_rank:
        return df.withColumn(out_col, F.lit(None).cast("string"))
    rank_map = F.create_map(
        *[F.lit(x) for kv in recency_rank.items() for x in kv]
    )
    inverse_map = F.create_map(
        *[F.lit(x) for v, r in recency_rank.items() for x in (r, v)]
    )
    # rank of each column's value; NULL when value is NULL/''/unknown
    ranks = [rank_map[F.col(f"`{c}`")] for c in recency_cols]
    best = F.least(*ranks) if len(ranks) > 1 else ranks[0]
    return df.withColumn(out_col, inverse_map[best])


def with_priority(
    df: DataFrame,
    recency_rank: dict[str, int],
    item_type_col: str = "ITEM_TYPE",
    most_recent_col: str = "most_recent",
    out_col: str = "priority",
) -> DataFrame:
    """-1 for administrative/metadata items, else rank of most_recent
    (varinfo-update.R:213-216)."""
    if recency_rank:
        rank_map = F.create_map(*[F.lit(x) for kv in recency_rank.items() for x in kv])
        fallback = rank_map[F.col(f"`{most_recent_col}`")]
    else:
        fallback = F.lit(None)
    return df.withColumn(
        out_col,
        F.when(F.col(f"`{item_type_col}`").isin(*ADMIN_ITEM_TYPES), F.lit(-1))
        .otherwise(fallback)
        .cast("int"),
    )


def sort_varinfo(
    df: DataFrame,
    survey_admin_cols_in_recency_order: Sequence[str] | None = None,
    row_order_col: str | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Full sort_varinfo: returns (sorted codebook, recency rank map).

    ``row_order_col``: optional existing column providing the original
    row order; when None a row_id is derived from physical order (fine
    for metadata-scale codebooks; see ``with_row_id``).
    """
    from common_survey_data_pipeline_spark.operators.fuzzy_join import with_row_id

    if survey_admin_cols_in_recency_order is not None:
        recency_cols = list(survey_admin_cols_in_recency_order)
    else:
        recency_cols = discover_recency_columns(df.columns)
    values = extract_recency_values(df, recency_cols)
    rank = build_recency_rank(values)

    if row_order_col is None:
        df = with_row_id(df, "__csdp_row_id")
        row_order_col_actual = "__csdp_row_id"
    else:
        row_order_col_actual = row_order_col
    out = with_most_recent(df, recency_cols, rank)
    out = with_priority(out, rank)
    out = out.orderBy(F.col("priority").asc_nulls_last(), F.col(row_order_col_actual))
    drop = ["priority"] + (["__csdp_row_id"] if row_order_col is None else [])
    return out.drop(*drop), rank
