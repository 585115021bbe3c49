"""Distributed global ranking — row_number / ntile without the
single-task Window.

A partition-less ``Window.orderBy(...)`` moves EVERY row through one
task ("No Partition Defined for Window operation" — the classic Spark
scale-killer). But a global rank over a total order does not need a
global sort in one place:

1. ``repartitionByRange`` on the sort keys — Spark samples the keys and
   range-partitions, so partition *i* holds a contiguous key range and
   all partitions sort in parallel.
2. ``row_number`` within each range partition (Window PARTITIONED by
   ``spark_partition_id()`` — bounded state per task).
3. One tiny driver-side pass collects the per-partition row counts
   (#partitions rows, not data rows) and turns them into cumulative
   offsets, joined back as a literal map.
4. global row number = local row number + offset[partition].

``ntile(k)`` then needs no second pass: with N total rows, SQL ntile
gives the first ``N mod k`` buckets ``ceil(N/k)`` rows and the rest
``floor(N/k)`` — a closed-form function of the global row number, so
the bucket is a column expression. Semantics are identical to
``ntile(k) OVER (ORDER BY ...)`` for any total order (ties across a
non-total order would be partition-placement-dependent — callers must
pass a tie-broken key list, same contract as the oracle SQL).

Cost at 100 TB: one range-exchange shuffle (same as any global sort),
one #partitions-row collect, zero single-task stages.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__csdp_pid"
_LRN = "__csdp_lrn"
_GRN = "__csdp_grn"


def _ranked(
    df: DataFrame,
    order_by: Sequence[Column | str],
    name: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Shared kernel: returns (df + global row number column, total rows)
    with ONE range shuffle and one #partitions-row collect."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order)
    else:
        ranged = df.repartitionByRange(*order)
    local = ranged.withColumn(_PID, F.spark_partition_id()).withColumn(
        _LRN,
        F.row_number().over(Window.partitionBy(_PID).orderBy(*order)),
    )
    # Cache: the per-partition counts AND the ranked rows come from the
    # same shuffle output; without it the range exchange runs twice.
    local = local.localCheckpoint(eager=False)
    counts = {
        r[_PID]: r["cnt"]
        for r in local.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    if offsets:
        offset_map = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        glob = F.col(_LRN) + F.element_at(offset_map, F.col(_PID))
    else:  # empty input
        glob = F.col(_LRN)
    out = local.withColumn(name, glob.cast("long")).drop(_PID, _LRN)
    return out, sum(counts.values())


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column | str],
    name: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """1-based global row number over ``order_by`` (must be a total
    order for determinism), computed with range partitioning + local
    ranks + cumulative offsets instead of a partition-less Window."""
    out, _ = _ranked(df, order_by, name, num_partitions)
    return out


def ntile_bucket(rn: Column, total_rows: int, k: int) -> Column:
    """SQL ``ntile(k)`` bucket as a closed-form expression of the global
    1-based row number ``rn`` over ``total_rows`` rows: the first
    ``total_rows mod k`` buckets take ``ceil(N/k)`` rows, the rest
    ``floor(N/k)``."""
    q, r = divmod(total_rows, k)
    cut = r * (q + 1)  # last row belonging to a "big" bucket
    big = ((rn - 1) / (q + 1)).cast("long") + 1
    # q can be 0 when N < k (every row its own bucket) — the small-bucket
    # branch is then unreachable; guard the divisor anyway.
    small = ((rn - cut - 1) / max(q, 1)).cast("long") + 1 + r
    return F.when(rn <= cut, big).otherwise(small)


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column | str],
    k: int,
    name: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY order_by)`` with no single-task stage.

    Exact SQL semantics (verified against the DuckDB oracle in
    ``workload.py::ntile_spend_quartiles``); requires ``order_by`` to be
    a total order."""
    ranked, total = _ranked(df, order_by, _GRN, num_partitions)
    return ranked.withColumn(
        name, ntile_bucket(F.col(_GRN), total, k).cast("int")
    ).drop(_GRN)


_LCS = "__csdp_lcs"


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[Column | str],
    value_col: str,
    name: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running ``sum(value_col) OVER (ORDER BY order_by ROWS UNBOUNDED
    PRECEDING)`` with no single-task stage — the distributed prefix-sum.

    Same decomposition as ``global_row_number``: range-partition on the
    sort keys, local running sum per range partition, then add the
    cumulative total of all earlier partitions (a #partitions-row
    driver pass). ``order_by`` must be a total order — with ties the
    row-frame running sum is placement-dependent, exactly as in SQL.

    This is the primitive behind token-offset sharding / sequence
    packing: pack_id = floor(tokens_before / budget) turns a corpus into
    contiguous ~budget-token shards in one shuffle.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order)
    else:
        ranged = df.repartitionByRange(*order)
    local = ranged.withColumn(_PID, F.spark_partition_id()).withColumn(
        _LCS,
        F.sum(value_col).over(
            Window.partitionBy(_PID)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # one shuffle feeds both the per-partition totals and the output rows
    local = local.localCheckpoint(eager=False)
    totals = {
        r[_PID]: r["s"]
        for r in local.groupBy(_PID).agg(F.sum(value_col).alias("s")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid] or 0
    if offsets:
        offset_map = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        glob = F.col(_LCS) + F.element_at(offset_map, F.col(_PID))
    else:
        glob = F.col(_LCS)
    # keep sum()'s natural output type (long for integral inputs,
    # decimal for decimal, double for double) — a blanket long cast
    # would silently floor fractional running sums
    out_type = local.schema[_LCS].dataType
    return local.withColumn(name, glob.cast(out_type)).drop(_PID, _LCS)
