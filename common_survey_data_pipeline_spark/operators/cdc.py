"""Change-data-capture operators: MERGE-style upsert and snapshot
diffing — the table-maintenance primitives behind incrementally
maintained lakehouse tables (Delta/Iceberg MERGE INTO re-expressed as
plain DataFrame algebra).

Both are single-shuffle key joins: at 100 TB the change batch is
typically ≪ the base snapshot, so AQE broadcasts it; when both sides
are large the join co-partitions on the key (store the base bucketed by
the key to skip even that shuffle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """MERGE INTO semantics (matched → replace, unmatched → insert):
    every key in ``updates`` takes its updates row; base rows whose key
    has no update pass through. Schemas must match by name.

    ``updates ∪ (base ⟕̸ updates)`` — one left-anti join on the key plus
    a union: cheaper than the full-outer-join formulation because no
    per-column coalesce runs over the (dominant) untouched base rows.
    """
    untouched = base.join(updates, on=list(key_cols), how="left_anti")
    return untouched.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff between two snapshot versions: one row per
    changed key with ``op`` ∈ {'I' (inserted), 'D' (deleted),
    'U' (updated — any ``compare_cols`` value differs, null-safe)}.
    Unchanged keys produce no output.

    One full-outer join on the key; the change test is a null-safe
    column comparison, so NULL→value and value→NULL transitions count
    as updates.
    """
    keys = list(key_cols)
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    joined = o.join(n, on=keys, how="full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(*keys, "op")
    )
