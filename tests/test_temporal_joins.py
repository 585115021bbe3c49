"""Unit tests for the temporal/skew join operators
(`operators/temporal_joins.py`): as-of semantics incl. ties and
no-match rows, interval-join equivalence to the naive theta join, and
salted-join equivalence to the plain equi join.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.temporal_joins import (
    asof_join,
    interval_join,
    salted_join,
)
from common_survey_data_pipeline_spark.sources.tables import load_table


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-10"), "e1"), (1, _ts("2024-01-20"), "e2"),
         (2, _ts("2024-01-05"), "e3")],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-08"), 100), (1, _ts("2024-01-15"), 200),
         (2, _ts("2024-01-06"), 300)],
        "k long, ts timestamp, v int",
    )
    out = {
        r["ev"]: r["v"]
        for r in asof_join(left, right, on="k").collect()
    }
    # e1: latest right ts<=01-10 is 01-08 → 100; e2: 01-15 → 200
    assert out == {"e1": 100, "e2": 200, "e3": None}


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-08"), "e")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame([(1, _ts("2024-01-08"), 7)], "k long, ts timestamp, v int")
    [row] = asof_join(left, right, on="k").collect()
    assert row["v"] == 7  # right_ts == left_ts matches (<= semantics)


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-10"), "e")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-05"), 1), (1, _ts("2024-01-12"), 2), (1, _ts("2024-01-20"), 3)],
        "k long, ts timestamp, v int",
    )
    [row] = asof_join(left, right, on="k", direction="forward").collect()
    assert row["v"] == 2  # smallest right ts >= left ts


def test_interval_join_equals_naive_theta(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    promos = (
        orders.select(F.date_trunc("MONTH", "o_orderdate").alias("m"))
        .distinct()
        .select(
            "m",
            (F.col("m") - F.expr("interval 20 days")).alias("start_ts"),
            (F.col("m") + F.expr("interval 40 days")).alias("end_ts"),
        )
    )
    fast = interval_join(orders, promos, "o_orderdate", "start_ts", "end_ts", bucket="month")
    naive = orders.join(
        promos,
        (orders.o_orderdate >= promos.start_ts) & (orders.o_orderdate < promos.end_ts),
    )
    assert fast.count() == naive.count()
    assert (
        fast.groupBy("m").count().exceptAll(naive.groupBy("m").count()).count() == 0
    )


def test_salted_join_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted = salted_join(ev, cust, "user_id", "c_custkey", salt=4).select(
        "event_id", "c_mktsegment"
    )
    plain = ev.join(cust, ev.user_id == cust.c_custkey).select(
        "event_id", "c_mktsegment"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_interval_join_rejects_right_and_full_outer(spark):
    left = spark.createDataFrame([(1,)], "k long").withColumn(
        "ts", F.lit("2024-01-05").cast("timestamp")
    )
    right = spark.createDataFrame([(1,)], "k long").select(
        "k",
        F.lit("2024-01-01").cast("timestamp").alias("s"),
        F.lit("2024-02-01").cast("timestamp").alias("e"),
    )
    # the bucket explode replicates right intervals: right/full outer
    # would emit unmatched right rows once per bucket — must refuse
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="interval_join"):
            interval_join(left, right, "ts", "s", "e", on="k", how=how)


def test_salted_join_rejects_right_and_full_outer(spark):
    left = spark.createDataFrame([(1, "a")], "k long, x string")
    right = spark.createDataFrame([(2, "b")], "k long, y string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", salt=4, how=how)


def test_salted_join_left_outer_exact(spark):
    """Left outer survives salting: unmatched LEFT rows appear exactly
    once (the left side keeps one salt per row)."""
    left = spark.createDataFrame([(1, "a"), (3, "c")], "k long, x string")
    right = spark.createDataFrame([(1, "r1")], "k long, y string")
    got = sorted(
        (r["k"], r["y"]) for r in salted_join(left, right, "k", salt=8, how="left").collect()
    )
    assert got == [(1, "r1"), (3, None)]
