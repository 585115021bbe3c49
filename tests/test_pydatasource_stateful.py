"""Spark 4 extension APIs: Python Data Source connector and
transformWithState stateful streaming operator."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.pydatasource import (
    SyntheticCorpusDataSource,
)
from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.streaming.events import (
    run_stream_to_memory,
)
from common_survey_data_pipeline_spark.streaming.stateful import (
    threshold_alerts,
)


def _write_time_ordered_batches(ev, path, n: int = 3) -> None:
    """Split ``ev`` into ``n`` time-disjoint parquet files written
    oldest-first with distinct mtimes, so the file stream source
    replays them in event-time order (ties in a single multi-file
    commit replay arbitrarily — see test_streaming.py's
    ordered_stream_dir, the same technique)."""
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


@pytest.fixture(scope="module")
def corpus_source(spark):
    spark.dataSource.register(SyntheticCorpusDataSource)
    return spark


def _read(spark, **opts):
    r = spark.read.format("synthetic_corpus")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_pydatasource_partitioned_read(corpus_source, spark):
    df = _read(spark, n_docs=1000, n_partitions=16, seed=7)
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 16
    assert df.columns == ["doc_id", "text", "n_words"]
    # ids complete, no partition overlap
    assert df.select("doc_id").distinct().count() == 1000
    # n_words column agrees with the text
    bad = df.where(
        F.size(F.split("text", " ")) != F.col("n_words")
    ).count()
    assert bad == 0


def test_pydatasource_deterministic_across_partitionings(corpus_source, spark):
    a = {r["doc_id"]: r["text"] for r in _read(spark, n_docs=200, n_partitions=4).collect()}
    b = {r["doc_id"]: r["text"] for r in _read(spark, n_docs=200, n_partitions=13).collect()}
    assert a == b
    c = {r["doc_id"]: r["text"] for r in _read(spark, n_docs=200, n_partitions=4, seed=99).collect()}
    assert a != c  # the seed is live


def test_pydatasource_feeds_engine_operators(corpus_source, spark):
    from common_survey_data_pipeline_spark.operators.dedup import (
        exact_dedup_groups,
    )

    df = _read(spark, n_docs=500, n_partitions=8)
    groups = exact_dedup_groups(df, "text", "doc_id")
    assert 0 < groups.count() <= 500


def test_threshold_alerts_batch_model(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    alerts = threshold_alerts(ev, threshold=100.0)
    rows = alerts.collect()
    assert len(rows) > 0
    # alert_no per user is 1..k dense
    per_user: dict[int, list[int]] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["alert_no"])
    for nos in per_user.values():
        assert sorted(nos) == list(range(1, len(nos) + 1))
    # total at k-th alert >= k * threshold
    for r in rows:
        assert r["total_at_alert"] >= 100.0 * r["alert_no"] - 1e-9


def test_threshold_alerts_stream_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    path = str(tmp_path / "alert_stream")
    # 3 time-disjoint micro-batch files written OLDEST-FIRST with
    # distinct mtimes — the file source orders ties arbitrarily, so a
    # single multi-file commit does NOT replay in event-time order
    # (same technique as test_streaming.py::ordered_stream_dir)
    _write_time_ordered_batches(ev, path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    try:
        run_stream_to_memory(
            threshold_alerts(stream, threshold=100.0), "t_alerts"
        )
        got_rows = spark.sql("SELECT * FROM t_alerts").collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    # the operator sorts each micro-batch by (ts, event_id) before
    # folding, so with time-disjoint micro-batches the FULL rows —
    # including per-alert totals — are deterministic and must equal the
    # batch twin's exactly (pre-sort, totals depended on shuffle order)
    got = {
        (r["user_id"], r["alert_no"], round(r["total_at_alert"], 6))
        for r in got_rows
    }
    want_rows = threshold_alerts(ev, threshold=100.0).collect()
    want = {
        (r["user_id"], r["alert_no"], round(r["total_at_alert"], 6))
        for r in want_rows
    }
    assert got == want
    assert len(want) > 0


def test_threshold_alerts_stream_equals_batch_with_negative_values(
    spark, tmp_path
):
    """End-to-end monotone-counter equivalence: a per-user total that
    dips below a threshold and re-crosses it emits NO duplicate alert
    in EITHER form (the batch twin's running-max filter mirrors the
    streaming emitted counter)."""
    import datetime

    rows = [
        (i, uid, datetime.datetime(2024, 1, 1, 0, i, 0), v)
        for uid, vals in {
            10: [150.0, -100.0, 50.0, 120.0],   # dip + re-cross
            20: [90.0, -50.0, 260.0, -300.0, 10.0],  # multi-level jump
        }.items()
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    path = str(tmp_path / "neg_alert_stream")
    _write_time_ordered_batches(ev, path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    try:
        run_stream_to_memory(
            threshold_alerts(stream, threshold=100.0), "t_neg_alerts"
        )
        got_rows = spark.sql("SELECT * FROM t_neg_alerts").collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    key = lambda r: (r["user_id"], r["alert_no"], round(r["total_at_alert"], 6))
    got = sorted(key(r) for r in got_rows)
    want = sorted(
        key(r) for r in threshold_alerts(ev, threshold=100.0).collect()
    )
    assert got == want
    # and no alert level is ever emitted twice per user
    assert len({(u, a) for u, a, _ in got}) == len(got)


def test_threshold_alerts_batch_monotone_on_recrossings(spark):
    """The batch twin mirrors the streaming form's MONOTONE emitted
    counter: a running total that dips below a threshold and re-crosses
    it (negative values) never re-emits an alert level (regression:
    the per-row level-crossing form emitted duplicate alert_no rows)."""
    import datetime

    rows = [
        (1, 10, datetime.datetime(2024, 1, 1, 0, 0, 0), 150.0),
        (2, 10, datetime.datetime(2024, 1, 1, 0, 1, 0), -100.0),
        (3, 10, datetime.datetime(2024, 1, 1, 0, 2, 0), 50.0),
        (4, 10, datetime.datetime(2024, 1, 1, 0, 3, 0), 120.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = sorted(
        (r["alert_no"], r["total_at_alert"])
        for r in threshold_alerts(df, threshold=100.0).collect()
    )
    # crossings: 150 (level 1), dip to 50, re-cross at 100 (NOT re-
    # emitted), then 220 (level 2)
    assert got == [(1, 150.0), (2, 220.0)]
