"""Structured Streaming tests: the operators in `streaming/events.py`
run as REAL streams (file source, micro-batches via maxFilesPerTrigger,
memory sink) and agree with their batch forms on the same data.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.streaming.events import (
    attribution_join,
    dedup_events,
    running_user_totals,
    run_stream_to_memory,
    tumbling_counts,
    windowed_unique_users,
)


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    """events (sf0.001) split into 3 parquet files — 3 micro-batches."""
    path = str(tmp_path_factory.mktemp("evstream"))
    ev = load_table(spark, sf_dir, "events")
    # watermarks require TIMESTAMP (with local tz); the parquet testdata
    # may surface ts as TIMESTAMP_NTZ depending on how it was written
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    ev.repartition(3).write.mode("overwrite").parquet(path)
    yield path, ev.schema
    shutil.rmtree(path, ignore_errors=True)


def _read_stream(spark, path, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_streaming_tumbling_equals_batch(spark, sf_dir, event_stream_dir):
    path, schema = event_stream_dir
    stream = _read_stream(spark, path, schema)
    run_stream_to_memory(
        tumbling_counts(stream, "1 hour"), "t_tumbling", output_mode="complete"
    )
    got = spark.sql(
        "SELECT * FROM t_tumbling ORDER BY window_start, event_type"
    ).collect()
    want = (
        tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_streaming_unique_users_equals_batch(spark, sf_dir, event_stream_dir):
    """HLL++ register-merge is order-independent, so the micro-batch-
    merged streaming estimates must be BIT-identical to the one-shot
    batch run over the same rows — not merely within tolerance."""
    path, schema = event_stream_dir
    stream = _read_stream(spark, path, schema)
    run_stream_to_memory(
        windowed_unique_users(stream, "1 hour"),
        "t_uniq",
        output_mode="complete",
    )
    got = spark.sql(
        "SELECT * FROM t_uniq ORDER BY window_start, event_type"
    ).collect()
    want = (
        windowed_unique_users(load_table(spark, sf_dir, "events"), "1 hour")
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert got == want
    assert len(got) > 0
    # and the sketch is actually close: within 5% of exact per window
    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            "event_type",
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    }
    for r in got:
        e = exact[(r["window_start"], r["event_type"])]
        assert abs(r["approx_users"] / e - 1) < 0.05


def test_streaming_dedup_within_watermark(spark, event_stream_dir):
    path, schema = event_stream_dir
    # watermark must exceed the data's full time span for exactly-one-
    # row-per-key semantics (state never expires during the replay)
    stream = _read_stream(spark, path, schema).withWatermark("ts", "3650 days")
    run_stream_to_memory(
        dedup_events(stream, keys=("user_id", "event_type")), "t_dedup"
    )
    got = spark.sql("SELECT user_id, event_type FROM t_dedup")
    # one row per (user, type); every key present in the source appears
    assert got.count() == got.distinct().count()
    src_keys = (
        spark.read.schema(schema).parquet(path)
        .select("user_id", "event_type").distinct().count()
    )
    assert got.distinct().count() == src_keys


def test_stateful_running_totals(spark, sf_dir, event_stream_dir):
    path, schema = event_stream_dir
    stream = _read_stream(spark, path, schema)
    run_stream_to_memory(
        running_user_totals(stream), "t_totals", output_mode="update"
    )
    # update mode emits one row per user per micro-batch it appears in;
    # the LAST row per user is the cumulative total == batch groupBy
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
        for r in running_user_totals(ev).collect()
    }
    rows = spark.sql("SELECT * FROM t_totals").collect()
    last: dict[int, tuple] = {}
    for r in rows:  # memory sink appends in batch order
        last[r["user_id"]] = (r["n_events"], round(r["sum_value"], 4))
    assert last == want


def test_stream_stream_attribution_join(spark, sf_dir, event_stream_dir):
    """attribution_join runs as a REAL stream-stream inner join (both
    sides watermarked, time-bound condition) and emits exactly the
    batch operator's pairs once all micro-batches replay."""
    path, schema = event_stream_dir
    p_stream = _read_stream(spark, path, schema).where(
        F.col("event_type") == "purchase"
    )
    c_stream = _read_stream(spark, path, schema).where(
        F.col("event_type") == "click"
    )
    # watermark beyond the data span: no pair is dropped during replay
    run_stream_to_memory(
        attribution_join(p_stream, c_stream, "1 hour", watermark="3650 days"),
        "t_attr",
    )
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT purchase_id, click_id FROM t_attr").collect()
    }
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in attribution_join(
            ev.where(F.col("event_type") == "purchase"),
            ev.where(F.col("event_type") == "click"),
            "1 hour",
        ).collect()
    }
    assert got == want
    assert len(want) > 0


@pytest.fixture(scope="module")
def ordered_stream_dir(spark, sf_dir, tmp_path_factory):
    """events split into 3 TIME-ORDERED micro-batch files (disjoint ts
    ranges, written oldest-first so the file source replays them in
    event-time order) — required by watermark-driven tests: an
    interleaved replay would late-drop most rows under a tight
    watermark, an all-at-once replay would never advance it."""
    import time as _time

    path = str(tmp_path_factory.mktemp("evstream_ord"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    for i in range(3):
        part = ev.where(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < 2 else hi))
            | (F.lit(i == 2) & (F.col("ts") == hi))
        )
        part.coalesce(1).write.mode("append").parquet(path)
        _time.sleep(1.1)  # distinct mtimes → deterministic replay order
    yield path, ev.schema
    shutil.rmtree(path, ignore_errors=True)


def test_stream_stream_attribution_left_outer(spark, sf_dir, ordered_stream_dir):
    """The left_outer stream-stream variant emits zero-click purchases
    with NULL click columns once the watermark closes their window —
    same pair set AND same NULL-preserved rows as the batch form."""
    path, schema = ordered_stream_dir
    p_stream = _read_stream(spark, path, schema).where(
        F.col("event_type") == "purchase"
    )
    c_stream = _read_stream(spark, path, schema).where(
        F.col("event_type") == "click"
    )
    # outer results for a window flush only when the watermark PASSES
    # the window's end: a tight watermark on replayed historical data
    # closes every window by end-of-replay except the very tail
    run_stream_to_memory(
        attribution_join(
            p_stream, c_stream, "1 hour", watermark="2 hours",
            how="left_outer",
        ),
        "t_attr_lo",
    )
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql(
            "SELECT purchase_id, click_id FROM t_attr_lo"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = attribution_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        "1 hour",
        how="left_outer",
    ).collect()
    batch_pairs = {(r["purchase_id"], r["click_id"]) for r in batch}
    matched = {(p, c) for p, c in batch_pairs if c is not None}
    # matched pairs always emit; NULL rows emit only for windows the
    # final watermark already closed (exact eviction timing depends on
    # micro-batch boundaries, so the NULL set is a strict subset)
    assert matched <= got <= batch_pairs
    assert any(c is None for _, c in got), "no NULL-click purchases emitted"


def test_stream_static_enrichment_join(spark, sf_dir, event_stream_dir):
    """Stream-static join: a streaming fact side joins a static
    broadcast dim (customer) per micro-batch — the standard streaming
    enrichment pattern; the dim is re-broadcast per batch, no state."""
    path, schema = event_stream_dir
    stream = _read_stream(spark, path, schema)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(F.broadcast(dim), "user_id", "left").groupBy(
        "c_mktsegment"
    ).count()
    run_stream_to_memory(enriched, "t_enrich", output_mode="complete")
    got = {
        r["c_mktsegment"]: r["count"]
        for r in spark.sql("SELECT * FROM t_enrich").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["c_mktsegment"]: r["count"]
        for r in ev.join(dim, "user_id", "left")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    }
    assert got == want and sum(got.values()) == ev.count()


def test_incremental_codebook_merge(spark, tmp_path):
    """Per-year survey updates stream into a year-partitioned codebook;
    a re-delivered year overwrites only its own partition."""
    from common_survey_data_pipeline_spark.streaming.events import (
        incremental_codebook_merge,
    )

    schema = "ITEM_NAME string, year string, admin_value string, question_text string"
    landing = str(tmp_path / "landing")
    state = str(tmp_path / "codebook")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [("Q1", "2023", "2023", "How satisfied?"), ("Q2", "2023", "2023", "Age?")],
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(landing)
    stream = spark.readStream.schema(batch1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(landing)
    incremental_codebook_merge(spark, stream, state, ckpt)

    def read_state():
        # partition-value inference types `year=2023` as int; normalize
        return spark.read.parquet(state).withColumn(
            "year", F.col("year").cast("string")
        )

    got = {(r["ITEM_NAME"], r["year"]) for r in read_state().collect()}
    assert got == {("Q1", "2023"), ("Q2", "2023")}

    # new year lands + corrected re-delivery of 2023 (only Q1 kept)
    batch2 = spark.createDataFrame(
        [("Q1", "2024", "2024", "How satisfied are you?"),
         ("Q1", "2023", "2023", "How satisfied? (rev)")],
        schema,
    )
    batch2.coalesce(1).write.mode("append").parquet(landing)
    incremental_codebook_merge(spark, stream, state, ckpt)
    rows = read_state().collect()
    got = {(r["ITEM_NAME"], r["year"]): r["question_text"] for r in rows}
    # 2023 partition replaced wholesale by the corrected delivery;
    # 2024 appended; nothing else
    assert got == {
        ("Q1", "2023"): "How satisfied? (rev)",
        ("Q1", "2024"): "How satisfied are you?",
    }


def test_sliding_counts_stream(spark, event_stream_dir):
    from common_survey_data_pipeline_spark.streaming.events import sliding_counts

    path, schema = event_stream_dir
    stream = _read_stream(spark, path, schema)
    run_stream_to_memory(
        sliding_counts(stream, "2 hours", "1 hour"), "t_sliding", output_mode="complete"
    )
    got = spark.sql("SELECT sum(n_events) AS s FROM t_sliding").first()["s"]
    n_src = spark.read.schema(schema).parquet(path).count()
    assert got == 2 * n_src  # every event lands in exactly 2 sliding windows


def test_streaming_mg_candidates_guarantee(spark, tmp_path):
    """The per-bucket MG union guarantee must hold after the stream is
    fully consumed: every token whose in-bucket count exceeds
    n_bucket/(k+1) appears in that bucket's FINAL summary generation,
    and no summary ever exceeds k entries."""
    from common_survey_data_pipeline_spark.streaming.stateful import (
        streaming_mg_candidates,
    )

    # skewed tokens split over 3 parquet files = 3 micro-batches
    words = [f"t{i}" for i in range(1, 30) for _ in range(i * i)]
    path = str(tmp_path / "tokstream")
    tok_df = spark.createDataFrame([(w,) for w in words], "token string")
    tok_df.repartition(3).write.mode("overwrite").parquet(path)

    k, n_buckets = 12, 4
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    run_stream_to_memory(
        streaming_mg_candidates(stream, k=k, n_buckets=n_buckets),
        "t_mg",
        output_mode="append",
    )
    rows = spark.sql("SELECT * FROM t_mg").collect()
    assert rows
    # keep only each bucket's final generation
    final = {}
    for r in rows:
        cur = final.setdefault(r["bucket"], (r["update_no"], set()))
        if r["update_no"] > cur[0]:
            final[r["bucket"]] = (r["update_no"], {r["token"]})
        elif r["update_no"] == cur[0]:
            cur[1].add(r["token"])
    # bounded state: final summaries have at most k entries
    for bucket, (_, toks) in final.items():
        assert len(toks) <= k
    # union guarantee vs exact per-bucket counts (same hash, batch side)
    exact = (
        streaming_mg_candidates(tok_df, k=10**9, n_buckets=n_buckets)
        .collect()
    )  # capacity >> vocab → exact per-bucket counts via the same path
    bucket_totals = {}
    for r in exact:
        bucket_totals[r["bucket"]] = bucket_totals.get(r["bucket"], 0) + r["weight"]
    for r in exact:
        if r["weight"] > bucket_totals[r["bucket"]] / (k + 1):
            assert r["token"] in final[r["bucket"]][1], (
                f"guarantee violated: {r['token']} "
                f"({r['weight']}/{bucket_totals[r['bucket']]}) missing"
            )
    # batch twin obeys the same contract
    batch = streaming_mg_candidates(tok_df, k=k, n_buckets=n_buckets).collect()
    per_bucket = {}
    for r in batch:
        per_bucket.setdefault(r["bucket"], set()).add(r["token"])
        assert r["update_no"] == 1
    for r in exact:
        if r["weight"] > bucket_totals[r["bucket"]] / (k + 1):
            assert r["token"] in per_bucket[r["bucket"]]


def test_streaming_ewma_equals_batch(spark, sf_dir, ordered_stream_dir):
    """The ring-buffer streaming EWMA agrees with the batch window form
    on a time-ordered replay (same closed-form arithmetic; Python vs
    JVM pow may differ by an ulp, hence the 1e-9 tolerance)."""
    from common_survey_data_pipeline_spark.streaming.stateful import (
        ewma_stream,
    )
    from common_survey_data_pipeline_spark.workload import REGISTRY

    path, schema = ordered_stream_dir
    stream = _read_stream(spark, path, schema).where(
        F.col("event_type") == "purchase"
    )
    run_stream_to_memory(ewma_stream(stream), "ewma_sink")
    got = spark.table("ewma_sink")
    want = REGISTRY["ewma_user_value"].fn(spark, sf_dir)
    g = {r["event_id"]: r["ewma"] for r in got.collect()}
    w = {r["event_id"]: r["ewma"] for r in want.collect()}
    assert set(g) == set(w)
    assert all(abs(g[k] - w[k]) < 1e-9 + 1e-6 for k in w)  # batch rounds to 6


def test_streaming_ewma_window_one_is_identity(spark, ordered_stream_dir):
    """window=1 = 'frame is the current row only': every emitted EWMA
    equals the row's own value and state stays empty (the keep=0 ring
    slice must be [], not the whole history)."""
    from common_survey_data_pipeline_spark.streaming.stateful import (
        ewma_stream,
    )

    path, schema = ordered_stream_dir
    stream = _read_stream(spark, path, schema).where(
        F.col("event_type") == "purchase"
    )
    run_stream_to_memory(ewma_stream(stream, window=1), "ewma1_sink")
    got = {r["event_id"]: r["ewma"] for r in spark.table("ewma1_sink").collect()}
    want = {
        r["event_id"]: r["value"]
        for r in spark.read.parquet(path)
        .where(F.col("event_type") == "purchase")
        .collect()
    }
    assert got == pytest.approx(want)


def test_streaming_ewma_flags_late_rows_and_keeps_state_clean(
    spark, tmp_path
):
    """ADVICE r3: a micro-batch that replays at-or-behind the key's
    last folded (ts, event_id) breaks the batch-identity contract.
    The late row must surface as ewma = NaN (visible breach, not a
    silently wrong fold) and must NOT perturb the state used by
    subsequent in-order rows."""
    import math
    import time as _time

    from common_survey_data_pipeline_spark.streaming.stateful import (
        ewma_stream,
    )

    from datetime import datetime as _dt

    path = str(tmp_path / "late_ev")
    schema = "user_id long, event_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [
            (1, 101, _dt(2024, 1, 1, 10, 0), 10.0),
            (1, 102, _dt(2024, 1, 1, 11, 0), 20.0),
        ],
        schema,
    )
    # 103 replays BEHIND 102 (10:30 < 11:00) → late; 104 is in-order
    b2 = spark.createDataFrame(
        [
            (1, 103, _dt(2024, 1, 1, 10, 30), 999.0),
            (1, 104, _dt(2024, 1, 1, 12, 0), 30.0),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(path)
    _time.sleep(1.1)  # distinct mtimes → deterministic replay order
    b2.coalesce(1).write.mode("append").parquet(path)

    stream = _read_stream(spark, path, b1.schema)
    run_stream_to_memory(ewma_stream(stream, alpha=0.5), "t_ewma_late")
    got = {
        r["event_id"]: r["ewma"] for r in spark.table("t_ewma_late").collect()
    }
    assert set(got) == {101, 102, 103, 104}
    # the worker emits NaN; Arrow maps it to NULL in the double column —
    # either way the breach is visible, never a silently wrong number
    assert got[103] is None or math.isnan(got[103])
    # 104's EWMA is computed over [10, 20, 30] — exactly as if the late
    # 999 never arrived: (10*.25 + 20*.5 + 30*1) / (0.25+0.5+1)
    want_104 = (10 * 0.25 + 20 * 0.5 + 30 * 1.0) / 1.75
    assert abs(got[104] - want_104) < 1e-12
    assert abs(got[101] - 10.0) < 1e-12
    assert abs(got[102] - (10 * 0.5 + 20) / 1.5) < 1e-12


def test_streaming_mg_state_survives_restart(spark, tmp_path):
    """VERDICT r3 item 8: kill-and-resume recovery. Run the Misra-Gries
    tracker over burst 1 with a checkpoint, STOP the query, deliver
    burst 2, and restart from the same checkpoint. If the keyed state
    survives, the resumed run continues the per-bucket generation
    counter (update_no = 2) and burst-1 counts accumulate; if state
    were dropped on resume, update_no would restart at 1 and the token
    weight would only reflect burst 2."""
    from common_survey_data_pipeline_spark.streaming.stateful import (
        streaming_mg_candidates,
    )

    src = str(tmp_path / "mg_src")
    ckpt = str(tmp_path / "mg_ckpt")
    sink = str(tmp_path / "mg_sink")
    # single-token stream → one bucket → deterministic accumulation;
    # k=8 >> vocab so MG never decrements and counts stay exact
    burst1 = spark.createDataFrame([("alpha",)] * 50, "token string")
    burst1.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        # parquet sink: fault-tolerant (memory sink refuses checkpoint
        # recovery), so the restart resumes offsets AND keyed state
        stream = (
            spark.readStream.schema("token string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_mg_candidates(stream, k=8, n_buckets=2)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        if q.isActive:
            q.stop()

    run_once()
    first = {
        r["token"]: (r["update_no"], r["weight"])
        for r in spark.read.parquet(sink).collect()
    }
    assert first == {"alpha": (1, 50)}

    burst2 = spark.createDataFrame(
        [("alpha",)] * 30 + [("beta",)] * 10, "token string"
    )
    burst2.coalesce(1).write.mode("append").parquet(src)

    run_once()  # RESUME from the same checkpoint (a kill + new process)
    rows = spark.read.parquet(sink).collect()
    latest: dict[str, tuple] = {}
    for r in rows:
        cur = latest.get(r["token"])
        if cur is None or r["update_no"] > cur[0]:
            latest[r["token"]] = (r["update_no"], r["weight"])
    assert latest["alpha"] == (2, 80), latest  # 50 carried over + 30 new
    assert latest["beta"][1] == 10


def test_dedup_events_custom_tiebreak_and_no_event_id(spark):
    """The batch tiebreak column is parameterized (regression: a
    hardcoded event_id tiebreak broke frames without that column)."""
    df = spark.createDataFrame(
        [(1, "a", 100, "x"), (1, "a", 100, "y"), (1, "b", 50, "z")],
        "user_id long, event_type string, seen_at long, payload string",
    )
    out = dedup_events(
        df, keys=("user_id", "event_type"), ts_col="seen_at",
        tiebreak_col="payload",
    )
    got = {(r["event_type"], r["payload"]) for r in out.collect()}
    assert got == {("a", "x"), ("b", "z")}
    # and ts-only ordering (tiebreak_col=None) must not reference event_id
    assert dedup_events(
        df, keys=("user_id", "event_type"), ts_col="seen_at", tiebreak_col=None
    ).count() == 2


def test_dedup_events_streaming_without_watermark_is_loud(spark, event_stream_dir):
    """An unbounded streaming dedup is refused (state would leak
    forever); an upstream withWatermark satisfies the guard."""
    path, schema = event_stream_dir
    stream = _read_stream(spark, path, schema)
    with pytest.raises(ValueError, match="watermark"):
        dedup_events(stream, keys=("user_id", "event_type"))
    # argument form and upstream form both pass the guard
    dedup_events(stream, keys=("user_id",), watermark="1 hour")
    dedup_events(stream.withWatermark("ts", "1 hour"), keys=("user_id",))


def test_late_data_accounting_replay_invariants(spark):
    """Batch watermark replay: totals partition exactly into on-time +
    late; only jittered-arrival rows can be late; no jitter -> no late
    rows (monotonic arrivals never regress the shard watermark)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from common_survey_data_pipeline_spark.streaming.events import (
        late_data_accounting,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=10 * i), 100.0) for i in range(64)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    )
    # monotonic arrival == event time order: nothing can be late
    out = late_data_accounting(ev, "30 minutes").collect()
    assert sum(r["n_late_dropped"] for r in out) == 0
    assert sum(r["n_events"] for r in out) == 64
    # delay event 8 by 16 arrival slots (=160 min event-time gap on its
    # shard-free ordering) -> beyond a 30-min watermark, dropped
    jit = ev.withColumn(
        "arr",
        F.col("event_id")
        + F.when(F.col("event_id") == 8, F.lit(16)).otherwise(F.lit(0)),
    )
    out2 = late_data_accounting(
        jit, "30 minutes", shards=1, arrival_col="arr"
    ).collect()
    assert sum(r["n_late_dropped"] for r in out2) == 1
    assert sum(r["n_on_time"] for r in out2) == 63
    assert all(
        r["n_events"] == r["n_late_dropped"] + r["n_on_time"] for r in out2
    )
