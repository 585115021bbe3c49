"""Temporal and skew-aware join operators (engine extension surface).

The reference (`/root/reference/varinfo-update.R`) has only equi / anti /
fuzzy joins (SURVEY.md §2.3); a 100 TB pipeline also needs the temporal
join family. Every operator here is architected around ONE shuffle on
the join key — never a per-row range scan of the other side:

* **as-of join** — the union-then-window formulation: tag both sides,
  union, and carry the most recent right payload forward with
  ``last(ignorenulls)`` over a (key, ts)-sorted window. Cost = one
  shuffle + one sort, identical to a sort-merge join; no N×M candidate
  explosion and no per-key ``collect``. This is how kdb/Flink-style
  as-of semantics map onto Spark's exchange/sort machinery.
* **interval (range) join** — theta→equi rewrite: explode each right
  interval into the fixed-width time buckets it overlaps, equi-join on
  the left row's bucket, then re-check exact containment. Bucket width
  trades replication factor against candidate selectivity; at any
  width the join is a plain hash/sort-merge equi-join AQE can re-plan.
* **salted join** — deterministic skew mitigation: replicate the
  (small) right side ``salt`` ways and scatter left rows across the
  replicas with a hash-derived salt, turning one hot key-partition
  into ``salt`` even ones. Result is exactly the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_ts <= left_ts`` (direction='backward'; 'forward' mirrors to
    the smallest ``right_ts >= left_ts``) within the same key group.

    Left rows with no qualifying right row keep NULL right columns
    (left-outer semantics, like pandas ``merge_asof`` / DuckDB ``ASOF
    LEFT JOIN``).

    If several right rows share the same (key, ts) the one carried is
    the last under a deterministic sort by all right columns — callers
    wanting a specific winner should pre-reduce the right side.

    Scale: one shuffle of both inputs on the key + one in-partition
    sort. No range explosion; skewed keys are still one partition each
    (salt the key upstream if a single key exceeds a partition).
    """
    rk = right_on or on
    rcols = [c for c in right.columns if c != rk]
    out_names = [c + suffix if c in left.columns else c for c in rcols]

    asc = direction == "backward"
    # deterministic winner among equal timestamps: sort right rows so the
    # chosen one is the last seen in scan order
    r_sorted_cols = [F.col(c) for c in rcols]
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(right.select(F.struct(*r_sorted_cols).alias("s")).schema["s"].dataType)
    )
    r = (
        right.select(
            F.col(rk).alias(on),
            F.col(right_ts).alias(left_ts) if right_ts != left_ts else F.col(left_ts),
            F.struct(*r_sorted_cols).alias("__payload"),
        )
        .withColumn("__side", F.lit(0))
    )
    u = l.select(
        *[F.col(c) for c in left.columns], "__side", "__payload"
    ).unionByName(r, allowMissingColumns=True)

    if asc:
        # right rows at the same ts sort BEFORE left rows (<= semantics)
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(left_ts).asc(), F.col("__side").asc(), F.col("__payload").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(left_ts).desc(), F.col("__side").asc(), F.col("__payload").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__match").getField(c).alias(n) for c, n in zip(rcols, out_names)],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    right_on: str | None = None,
    bucket: str = "month",
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals containing them:
    ``right_start <= left_ts < right_end`` (+ optional equi key).

    Theta→equi rewrite (SURVEY.md §4.2 pattern): each right interval is
    exploded into every ``bucket``-width time bucket it overlaps; the
    left side joins on its single bucket, and the exact containment
    predicate filters in the same stage. The shuffle key is
    (bucket [, key]) — a plain equi join at any scale; replication is
    ceil(interval/bucket)+1 rows per right interval.

    ``how`` is limited to join types whose semantics survive the
    rewrite: the LEFT side is never replicated (one bucket per row), so
    inner / left outer / left semi / left anti are exact; a right or
    full outer join would emit each unmatched right interval once PER
    EXPLODED BUCKET instead of once, so those are rejected rather than
    silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"interval_join: how={how!r} unsupported — the bucket "
            "explode replicates right intervals, so right/full outer "
            "would duplicate unmatched right rows per bucket"
        )
    bucket_interval = {"day": "interval 1 day", "month": "interval 1 month",
                       "hour": "interval 1 hour", "week": "interval 1 week"}[bucket]
    trunc = {"day": "DAY", "month": "MONTH", "hour": "HOUR", "week": "WEEK"}[bucket]

    r = right.withColumn(
        "__b",
        F.explode(
            F.expr(
                f"sequence(date_trunc('{trunc}', {right_start}),"
                f" date_trunc('{trunc}', {right_end}), {bucket_interval})"
            )
        ),
    )
    l = left.withColumn("__b", F.expr(f"date_trunc('{trunc}', {left_ts})"))
    cond = (
        (l["__b"] == r["__b"])
        & (l[left_ts] >= r[right_start])
        & (l[left_ts] < r[right_end])
    )
    if on is not None:
        cond = cond & (l[on] == r[right_on or on])
    return l.join(r, cond, how).drop(l["__b"]).drop(r["__b"])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with deterministic salting for skewed left keys.

    The right side is replicated ``salt`` ways; each left row picks one
    replica via a hash of its whole row (xxhash64 of all columns —
    deterministic, no rand()). A hot left key that would land on one
    reducer is spread over ``salt`` reducers. Result set is EXACTLY the
    plain equi join. Use when AQE skew-join can't kick in (e.g. the
    skewed side feeds a window) or replication is cheaper than a
    re-plan. Right side should be the smaller input.

    ``how`` is limited to join types whose semantics survive the
    replication: the LEFT side keeps one salt per row, so inner / left
    outer / left semi / left anti are exact; a right or full outer join
    would emit each unmatched right row once PER REPLICA (``salt``
    copies), so those are rejected rather than silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the right side is "
            f"replicated {salt}x, so right/full outer would emit "
            "unmatched right rows once per replica"
        )
    rk = right_on or left_on
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int"),
    )
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    cond = (l[left_on] == r[rk]) & (l["__salt"] == r["__salt"])
    out = l.join(r, cond, how)
    return out.drop(l["__salt"]).drop(r["__salt"])
