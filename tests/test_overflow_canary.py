"""Canary for the integer-cents money path (workload.py q1/q3).

The fast path sums int64 products bounded by ~1e11 per row, which wraps
past ~9e7 rows per group at extreme scale. The engine contract is that
this NEVER produces a silently wrong total: sessions pin
``spark.sql.ansi.enabled=true`` (session.py), under which Spark's
``sum(long)`` raises ARITHMETIC_OVERFLOW instead of wrapping. These
tests would fail on any engine/config combination that silently wraps —
e.g. if someone turns ANSI off or a future Spark changes the default.
"""

import pytest
from pyspark.sql import functions as F


def test_session_pins_ansi(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_int_cents_sum_overflow_raises(spark):
    # Two rows whose int64 sum exceeds 2^63-1: the documented failure
    # shape (sum of cents*pct*taxpct products). Must raise, never wrap.
    big = (1 << 62) + 7
    df = spark.range(2).select(F.lit(big).cast("long").alias("v"))
    with pytest.raises(Exception) as exc_info:
        df.agg(F.sum("v")).collect()
    msg = str(exc_info.value)
    assert "OVERFLOW" in msg.upper() or "overflow" in msg


def test_int_cents_product_overflow_raises(spark):
    # The per-row product itself can also overflow if inputs exceed the
    # documented 1e11 bound; ANSI makes multiplication loud too.
    df = spark.range(1).select(
        F.lit(1 << 40).cast("long").alias("cents"),
        F.lit(1 << 30).cast("long").alias("pct"),
    )
    with pytest.raises(Exception):
        df.select((F.col("cents") * F.col("pct")).alias("p")).collect()


def test_int_cents_sum_exact_below_bound(spark):
    # At the documented per-row bound (~1.1e11 = max cents*pct*taxpct),
    # 10k rows/group sums exactly — well inside int64 headroom, and the
    # canary distinguishes "loud at the cliff" from "broken before it".
    per_row = 110_000_000_000  # 1.1e11
    n = 10_000
    df = spark.range(n).select(F.lit(per_row).cast("long").alias("v"))
    [row] = df.agg(F.sum("v").alias("s")).collect()
    assert row["s"] == per_row * n
