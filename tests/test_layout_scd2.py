"""Unit tests for operators/layout.py (Z-order) and
operators/timeseries.py::scd2_compress on hand-built data."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.layout import (
    zorder_bucket_stats,
    zorder_key,
)
from common_survey_data_pipeline_spark.operators.timeseries import scd2_compress


def _morton2(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 42)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = (
        df.select("a", "b", zorder_key([F.col("a"), F.col("b")]).alias("z"))
        .orderBy("a", "b")
        .collect()
    )
    for r in got:
        assert r["z"] == _morton2(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_key_rejects_long_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=32)


def test_zorder_bucket_stats_localizes_both_dims(spark):
    # a dense grid: every bucket's per-dim spread must be far below the
    # full domain (the whole point of Z-ordering)
    n = 64
    rows = [(i, j) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    # scale 0..63 into 16-bit space so the top-6-bit buckets are populated
    scaled = df.select(
        (F.col("x") * 1024).alias("x"), (F.col("y") * 1024).alias("y")
    )
    out = zorder_bucket_stats(scaled, ["x", "y"], bits=16, bucket_bits=6).collect()
    assert len(out) == 64
    full = 63 * 1024
    for r in out:
        assert r["n_rows"] == n * n // 64
        # each of the 64 buckets covers a 8x8 sub-grid: spread = 7*1024
        assert r["max_x"] - r["min_x"] <= full // 8
        assert r["max_y"] - r["min_y"] <= full // 8


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_scd2_compress_versions_and_validity(spark):
    rows = [
        # user 1: A A B A  → versions A, B, A
        (1, 10, _ts("2024-01-01 00:00:00"), "A"),
        (2, 10, _ts("2024-01-02 00:00:00"), "A"),
        (3, 10, _ts("2024-01-03 00:00:00"), "B"),
        (4, 10, _ts("2024-01-04 00:00:00"), "A"),
        # user 2: single state → one open-ended version
        (5, 20, _ts("2024-06-01 00:00:00"), "X"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = scd2_compress(df, "user_id", "event_type", "ts", "event_id")
    got = {
        (r["user_id"], r["version"]): r
        for r in out.collect()
    }
    assert len(got) == 4
    v1 = got[(10, 1)]
    assert v1["event_type"] == "A"
    assert v1["valid_from"] == _ts("2024-01-01 00:00:00")
    assert v1["valid_to"] == _ts("2024-01-03 00:00:00")
    v2 = got[(10, 2)]
    assert v2["event_type"] == "B"
    assert v2["valid_to"] == _ts("2024-01-04 00:00:00")
    v3 = got[(10, 3)]
    assert v3["event_type"] == "A"
    assert v3["valid_to"] is None
    assert got[(20, 1)]["valid_to"] is None


def test_scd2_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01"), "A")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    plan = (
        scd2_compress(df, "user_id", "event_type", "ts", "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows share one (user_id) exchange: exactly one shuffle
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_scd2_compress_null_attribute_transitions(spark):
    """Null-safe change detection: transitions TO NULL are versions,
    consecutive NULLs compress to ONE version, and a history may START
    with a NULL attribute (regression: `!=` dropped NULL transitions
    and `prev IS NULL` duplicated consecutive NULLs)."""
    rows = [
        # user 1: A NULL NULL A → versions A, NULL, A
        (1, 10, _ts("2024-01-01 00:00:00"), "A"),
        (2, 10, _ts("2024-01-02 00:00:00"), None),
        (3, 10, _ts("2024-01-03 00:00:00"), None),
        (4, 10, _ts("2024-01-04 00:00:00"), "A"),
        # user 2: starts with NULL → NULL, X
        (5, 20, _ts("2024-06-01 00:00:00"), None),
        (6, 20, _ts("2024-06-02 00:00:00"), "X"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = scd2_compress(df, "user_id", "event_type", "ts", "event_id")
    got = {(r["user_id"], r["version"]): r for r in out.collect()}
    assert len(got) == 5
    assert got[(10, 1)]["event_type"] == "A"
    assert got[(10, 2)]["event_type"] is None
    assert got[(10, 2)]["valid_from"] == _ts("2024-01-02 00:00:00")
    assert got[(10, 2)]["valid_to"] == _ts("2024-01-04 00:00:00")
    assert got[(10, 3)]["event_type"] == "A"
    assert got[(20, 1)]["event_type"] is None
    assert got[(20, 1)]["valid_to"] == _ts("2024-06-02 00:00:00")
    assert got[(20, 2)]["event_type"] == "X"
