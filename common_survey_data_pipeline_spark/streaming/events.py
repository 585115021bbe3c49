"""Event-stream operators: windowed aggregation, sessionization,
watermarked dedup.

Each operator is a pure DataFrame transform that works identically on a
batch DataFrame and a Structured Streaming DataFrame (``readStream``) —
the Spark-native way to express the reference's incremental "new
administration arrives → merge" lifecycle (SURVEY.md §2.10) and the
scale-out story for the ``events`` table.

Batch mode doubles as the oracle-checkable form: tumbling windows are
``time_bucket`` in ANSI SQL; session windows are the classic
gaps-and-islands construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Per-window, per-group count + value sum. Streaming-safe (append
    mode once a watermark is set upstream).

    Output: (window_start, window_end, *group_cols, n_events, sum_value).
    """
    win = F.window(F.col(ts_col), window)
    return (
        events.groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide
    overlapping windows)."""
    win = F.window(F.col(ts_col), window, slide)
    return (
        events.groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session windows with an inactivity gap: a session ends
    when no event arrives for ``gap``.

    Uses ``F.session_window`` (stateful streaming operator; in batch it
    compiles to a merge-based aggregation). Output: (user_id,
    session_start, n_events, first_ts, last_ts) — note session_window's
    *end* extends gap past the last event, so the oracle-stable columns
    are the start and the event timestamps, which we expose.
    """
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(sw.alias("s"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str | None = None,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """First event per key. Batch: min-ts row per key, with
    ``tiebreak_col`` making equal-timestamp picks deterministic (pass
    ``None`` for frames without such a column — ties then follow the
    scan order, same as SQL's underspecified ``row_number`` on a
    non-total sort). Streaming: requires a ``watermark`` (here, or
    already set upstream via ``withWatermark``) so
    ``dropDuplicatesWithinWatermark`` state stays bounded — an
    unbounded streaming dedup is refused rather than silently leaking
    state forever."""
    if events.isStreaming:
        out = events
        if watermark:
            out = out.withWatermark(ts_col, watermark)
        elif not any(f.metadata.get("spark.watermarkDelayMs") is not None
                     for f in out.schema.fields):
            raise ValueError(
                "dedup_events on a stream needs a watermark (argument "
                "or upstream withWatermark): without one, "
                "dropDuplicatesWithinWatermark cannot bound its state"
            )
        return out.dropDuplicatesWithinWatermark(list(keys))
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def windowed_unique_users(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
    rsd: float = 0.01,
) -> DataFrame:
    """Distinct users per window via the HyperLogLog++ sketch — the
    cardinality aggregate that works IDENTICALLY in batch and
    streaming, because HLL register-merge is order-independent: the
    streaming job folds each micro-batch into per-window sketch state
    and the final estimate is bit-identical to a one-shot batch run
    over the same rows (asserted in ``tests/test_streaming.py``).

    Exact ``count(DISTINCT)`` is structurally impossible in streaming
    (it would need the full per-window user set as state) and
    structurally wasteful at 100 TB batch (per-window-per-user state
    explosion); the sketch is a few KB per open window regardless of
    cardinality. Output: (window_start, window_end, *group_cols,
    approx_users).
    """
    out = events
    if events.isStreaming and watermark:
        out = out.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window)
    return (
        out.groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
        .agg(F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "approx_users",
        )
    )


def running_user_totals(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Custom stateful streaming operator: per-user running event count
    and value sum maintained in keyed state across micro-batches
    (``applyInPandasWithState`` — Arrow-batched, grouped state; the
    PySpark-native replacement for a hand-rolled stateful process
    function). Each micro-batch emits the updated cumulative row per
    user seen in that batch.

    In batch mode falls back to a plain groupBy (same output contract:
    one final row per user).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )

    def update(key, pdf_iter, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Marketing-attribution join: every (purchase, prior click) pair
    where the click is by the same user within ``window`` before the
    purchase (``p_ts - window <= c_ts < p_ts``). Returns
    ``(purchase_id, user_id, p_ts, click_id, c_ts)``; with
    ``how='left_outer'`` zero-click purchases survive with NULL click
    columns (so a downstream ``count(click_id)`` gives per-purchase
    click counts in ONE join + ONE aggregation — no join-back).

    Streaming inputs become a real STREAM-STREAM inner join: both sides
    get a watermark and the join condition carries the explicit time
    bound, so Spark can expire click state older than
    ``watermark + window`` — bounded state at any input rate.

    Batch inputs take the identical plan minus watermarks: one shuffle
    of both sides on ``user_id`` (the equi key), range predicate applied
    in the same stage — per-user state is bounded by that user's
    activity, never corpus-wide, so the join survives 100 TB of events
    as long as single users stay human-scale (salt bots upstream via
    ``temporal_joins.salted_join``).
    """
    p = purchases
    c = clicks
    if p.isStreaming:
        p = p.withWatermark(ts_col, watermark)
    if c.isStreaming:
        c = c.withWatermark(ts_col, watermark)
    p = p.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col(ts_col).alias("p_ts"),
    )
    c = c.select(
        F.col("user_id").alias("__c_user"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("c_ts"),
    )
    cond = (
        (p["user_id"] == c["__c_user"])
        & (c["c_ts"] >= p["p_ts"] - F.expr(f"INTERVAL {window}"))
        & (c["c_ts"] < p["p_ts"])
    )
    return p.join(c, cond, how).select(
        "purchase_id", "user_id", "p_ts", "click_id", "c_ts"
    )


def join_state_accounting(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    window: str = "1 hour",
    delay: str = "30 minutes",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    shards: int = 8,
    arrival_col: str | None = None,
) -> DataFrame:
    """Batch REPLAY of stream-stream join STATE semantics — the
    watermark-cost accounting for the ``attribution_join`` shape: per
    event-time hour of the right stream, how many (left, right) join
    pairs the unbounded batch join finds, and how many of those a
    watermarked streaming join would have MISSED because the right row
    arrived after the left row's state was already evicted.

    Deterministic loss rule (the principal streaming loss mode, pinned
    the same way ``late_data_accounting`` pins drop semantics): the
    left row ``l`` leaves join state once the watermark passes
    ``l.ts + window`` (the join-condition upper bound); a batch pair
    (l, r) is LOST iff the right shard's running watermark at r's
    arrival — ``max(event time over strictly earlier arrivals on
    r's shard) − delay`` — already exceeds ``l.ts + window``. Arrival
    order uses the shared jittered-ingest model (``seq % shards``
    shards, same jitter as ``late_data_accounting``) so every metric
    is an exact integer, hash-stable by construction.

    Scale shape: one shard-keyed running-max window over the RIGHT
    stream (per-shard state = one timestamp), one user-keyed equi-join
    with the time-range predicate applied in-stage (the
    ``attribution_join`` plan — per-user fanout, never corpus-wide),
    one hour-keyed aggregation with map-side partials.
    """
    arrival = arrival_col or seq_col
    left = events.where(F.col("event_type") == left_type).select(
        F.col("user_id").alias("__l_user"),
        F.col(ts_col).alias("l_ts"),
    )
    r_base = events.where(F.col("event_type") == right_type)
    shard = (F.col(seq_col) % shards).alias("__shard")
    w = (
        Window.partitionBy("__shard")
        .orderBy(arrival, seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r_cols = [
        F.col("user_id"), F.col(ts_col).alias("r_ts"), shard, F.col(seq_col)
    ]
    if arrival_col:
        r_cols.append(F.col(arrival_col))
    right = r_base.select(*r_cols).withColumn(
        "__wm", F.max("r_ts").over(w) - F.expr(f"INTERVAL {delay}")
    )
    cond = (
        (right["user_id"] == left["__l_user"])
        & (left["l_ts"] <= right["r_ts"])
        & (left["l_ts"] >= right["r_ts"] - F.expr(f"INTERVAL {window}"))
    )
    pairs = right.join(left, cond, "inner").withColumn(
        "__lost",
        F.col("__wm").isNotNull()
        & (F.col("__wm") > F.col("l_ts") + F.expr(f"INTERVAL {window}")),
    )
    return (
        pairs.groupBy(
            F.date_trunc("hour", F.col("r_ts")).alias("window_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs_batch"),
            F.sum(F.col("__lost").cast("long")).alias("n_pairs_lost"),
            F.sum((~F.col("__lost")).cast("long")).alias("n_pairs_streamed"),
        )
    )


def stream_from_parquet(
    spark: SparkSession,
    path: str,
    schema,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """File-based streaming source over a parquet directory with a
    watermark — micro-batch ingestion of event files as they land."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .withWatermark(ts_col, watermark)
    )


def incremental_codebook_merge(
    spark,
    long_updates: DataFrame,
    state_path: str,
    checkpoint_path: str,
    timeout_s: int = 120,
) -> None:
    """The reference's 'new administration arrives → merge into the
    cumulative codebook' lifecycle (SURVEY.md §2.10) as a real
    Structured Streaming job: per-year update files stream in (LONG
    form: item core + year + admin_value + question_text) and each
    micro-batch merges into a year-partitioned parquet codebook via
    ``foreachBatch`` with dynamic partition overwrite. The merge unit
    is the YEAR, not the row: each delivery must be a full-year
    snapshot (exactly what a survey administration export is) — a
    re-delivered year replaces that year's partition wholesale, so
    items absent from the re-delivery are dropped for that year;
    untouched years are kept intact. This is deliberately NOT a
    row-level upsert (tested in ``tests/test_streaming.py``) — a
    partial-year correction file would lose the year's other items.

    This is the Spark-native version of "re-run the script when a new
    export lands": the landing directory is the trigger, the merge is
    the micro-batch, and the cumulative wide view is
    ``codebook_to_wide(spark.read.parquet(state_path))`` on demand.
    """

    def merge(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        old_conf = sp.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            batch.write.mode("overwrite").partitionBy("year").parquet(state_path)
        finally:
            sp.conf.set("spark.sql.sources.partitionOverwriteMode", old_conf)

    q = (
        long_updates.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()


def run_stream_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "append", timeout_s: int = 60
) -> None:
    """Drive a streaming DataFrame into an in-memory sink until idle —
    the test harness for streaming operators."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()


def late_data_accounting(
    events: DataFrame,
    delay: str = "30 minutes",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    shards: int = 8,
    arrival_col: str | None = None,
) -> DataFrame:
    """Batch REPLAY of watermark late-data semantics: per tumbling hour
    of EVENT time, how many rows a watermarked streaming aggregation
    would have accepted vs dropped as too late.

    The replay pins the semantics exactly (Structured Streaming's own
    drop count depends on nondeterministic micro-batch boundaries, so
    parity needs a deterministic definition): rows arrive in
    ``arrival_col`` order (default ``seq_col``) on ``shards`` ingest
    shards (``seq % shards`` —
    the per-Kafka-partition arrival model); each shard maintains its
    running watermark ``max(event time over STRICTLY EARLIER arrivals)
    − delay``; a row is late-dropped iff its event time is below its
    shard's watermark at arrival. This is the upper-bound accounting a
    pipeline operator actually wants ("what would a 30-minute
    watermark cost me in dropped rows, per hour?") and every metric is
    an exact integer — hash-stable by construction.

    Scale shape: ONE shard-keyed running-max window (per-shard state =
    one timestamp; arrival order within a shard is how the data
    already lands at ingest), then one hour-keyed aggregation with
    map-side partials. No global-order window anywhere.
    """
    arrival = arrival_col or seq_col
    shard = (F.col(seq_col) % shards).alias("__shard")
    w = (
        Window.partitionBy("__shard")
        .orderBy(arrival, seq_col)  # seq tiebreak keeps replay total
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm_src = F.max(ts_col).over(w)
    late = wm_src.isNotNull() & (
        F.col(ts_col) < wm_src - F.expr(f"INTERVAL {delay}")
    )
    cols = [F.col(ts_col), F.col(seq_col), shard]
    if arrival_col:
        cols.append(F.col(arrival_col))
    flagged = events.select(*cols).withColumn("__late", late)
    return (
        flagged.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("window_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("__late").cast("long")).alias("n_late_dropped"),
            F.sum((~F.col("__late")).cast("long")).alias("n_on_time"),
        )
    )
