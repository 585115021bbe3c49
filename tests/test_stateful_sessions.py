"""Stateful session aggregation (VERDICT r6 item 3): the
applyInPandasWithState streaming form must emit exactly the batch
twin's sessions under deterministic time-ordered micro-batch replay —
the same harness pattern as threshold_alerts, with a far-future
sentinel event per user to flush the final open sessions."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.streaming.events import (
    run_stream_to_memory,
)
from common_survey_data_pipeline_spark.streaming.stateful import (
    session_stats_stateful,
)


def _with_cents(ev):
    return ev.withColumn(
        "cents", F.expr("CAST(rint(value * 100.0) AS BIGINT)")
    )


def _write_time_ordered_batches(ev, path, n: int = 3) -> None:
    """Oldest-first, distinct-mtime parquet files so the file source
    replays micro-batches in event-time order (the
    test_pydatasource_stateful.py technique)."""
    import time as _time

    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / n
    for i in range(n):
        part = ev.where(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < n - 1 else hi))
            | (F.lit(i == n - 1) & (F.col("ts") == hi))
        )
        part.coalesce(1).write.mode("append").parquet(path)
        _time.sleep(1.1)


def test_batch_sessions_have_sane_shape(spark, sf_dir):
    ev = _with_cents(load_table(spark, sf_dir, "events"))
    rows = session_stats_stateful(ev, "30 minutes").collect()
    assert len(rows) > 0
    n_events = sum(r["n_events"] for r in rows)
    assert n_events == ev.count()  # every event lands in exactly one session
    for r in rows:
        assert r["session_start"] <= r["session_end"]


def test_stream_sessions_equal_batch_twin(spark, sf_dir, tmp_path):
    ev = _with_cents(load_table(spark, sf_dir, "events")).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # sentinel: one far-future zero-value event per user closes every
    # open session, so the stream emits ALL real sessions; the
    # sentinel's own session stays in state and is never emitted
    sentinel = (
        ev.groupBy("user_id")
        .agg((F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts"))
        .withColumn("event_id", F.lit(10**12) + F.col("user_id"))
        .withColumn("event_type", F.lit("__sentinel"))
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit(None).cast("string"))
        .withColumn("cents", F.lit(0).cast("long"))
        .select(*ev.columns)
    )
    path = str(tmp_path / "session_stream")
    _write_time_ordered_batches(ev.unionByName(sentinel), path, n=4)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    try:
        run_stream_to_memory(
            session_stats_stateful(stream, "30 minutes"), "t_sessions"
        )
        got_rows = spark.sql("SELECT * FROM t_sessions").collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    got = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"], r["total_cents"])
        for r in got_rows
    }
    want_rows = (
        session_stats_stateful(ev, "30 minutes")
        .select(
            "user_id",
            F.unix_micros(F.col("session_start").cast("timestamp")).alias("s"),
            F.unix_micros(F.col("session_end").cast("timestamp")).alias("e"),
            "n_events",
            "total_cents",
        )
        .collect()
    )
    want = {
        (r["user_id"], r["s"], r["e"], r["n_events"], r["total_cents"])
        for r in want_rows
    }
    assert got == want
    assert len(want) > 0


def test_gap_boundary_is_inclusive(spark):
    """An exactly-30-minute gap STARTS a new session (>= convention,
    shared with events_sessions_30m) in both forms' shared batch path."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1, 100),
        (1, base + dt.timedelta(minutes=30), 2, 100),  # exactly the gap
        (1, base + dt.timedelta(minutes=59, seconds=59), 3, 100),  # inside
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, cents long"
    )
    got = sorted(
        (r["n_events"], r["total_cents"])
        for r in session_stats_stateful(ev, "30 minutes").collect()
    )
    assert got == [(1, 100), (2, 200)]
