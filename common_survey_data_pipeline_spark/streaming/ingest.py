"""Streaming corpus ingestion: JSONL documents land in a directory,
each micro-batch is scrubbed (PII), scored (quality), filtered, and
appended to a partitioned parquet table.

This is the continuous twin of the batch curation path
(``operators/curation.py`` / ``text_pii_redact`` / ``curate_corpus``):
the transform is a pure DataFrame function, so the SAME code runs over a
batch frame (oracle-checkable) and a ``readStream`` frame (incremental).
Stateless map/filter stages only — no watermark needed, append mode,
unbounded-state-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from common_survey_data_pipeline_spark.functions import text as T

#: the corpus wire schema (JSONL); mirrors the documents table
DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING"


def curate_batch(docs: DataFrame, min_quality: float = 0.3) -> DataFrame:
    """Scrub + score + filter one frame of raw documents.

    Works identically on batch and streaming inputs (stateless rows):
    redacts PII spans, attaches the deterministic quality score and
    token count, and keeps docs at or above ``min_quality``.
    """
    c = F.col("text")
    return (
        docs.where(c.isNotNull())
        .select(
            "doc_id",
            T.redact_pii(c).alias("text"),
            "lang",
            "source",
            F.round(T.quality_score(c), 4).alias("quality"),
            T.token_count(c).cast("long").alias("n_tokens"),
        )
        .where(F.col("quality") >= min_quality)
    )


def stream_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: StructType | str = DOC_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based streaming source over a JSONL drop directory."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def run_ingest_with_dedup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    corpus: DataFrame,
    min_quality: float = 0.3,
    threshold: float = 0.5,
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    partition_by: str = "lang",
):
    """Ingestion with ONLINE near-dup rejection: each micro-batch is
    curated, then checked against the accepted corpus with the same
    banded MinHash-LSH as the batch path
    (``operators/dedup.py::minhash_incremental_pairs``); near-duplicates
    of corpus documents are dropped before the append.

    The corpus shingle/band tables are computed ONCE and cached — per
    batch only the (small) batch side is hashed and banded, so each
    trigger costs O(batch) regardless of corpus size. At 100 TB persist
    the corpus band table bucketed on ``band_key`` instead of caching.
    ``foreachBatch`` (not a stream-stream join) because the corpus side
    is static and the anti-join output is per-batch-complete.
    """
    from common_survey_data_pipeline_spark.functions.text import (
        jaccard,
        word_shingles,
    )
    from common_survey_data_pipeline_spark.operators.dedup import _band_keys

    def _shingled(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("doc_id").alias("__id"),
            word_shingles(F.col("text"), shingle_words).alias("__shingles"),
        ).where(F.size("__shingles") > 0)

    sh_c = _shingled(corpus).cache()
    bands_c = (
        _band_keys(sh_c, "__id", "__shingles", num_hashes, bands)
        .withColumnRenamed("__id", "corpus_id")
        .cache()
    )
    bands_c.count()  # materialize both caches before the stream starts

    def _process(batch: DataFrame, _batch_id: int) -> None:
        curated = curate_batch(batch, min_quality)
        sh_b = _shingled(curated)
        bands_b = _band_keys(sh_b, "__id", "__shingles", num_hashes, bands)
        cand = (
            bands_b.join(bands_c, "band_key")
            .select(F.col("__id").alias("batch_id"), "corpus_id")
            .distinct()
        )
        dup_ids = (
            cand.join(
                sh_b.select(
                    F.col("__id").alias("batch_id"),
                    F.col("__shingles").alias("__sh_a"),
                ),
                "batch_id",
            )
            .join(
                sh_c.select(
                    F.col("__id").alias("corpus_id"),
                    F.col("__shingles").alias("__sh_b"),
                ),
                "corpus_id",
            )
            .where(
                F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6)
                >= threshold
            )
            .select(F.col("batch_id").alias("doc_id"))
            .distinct()
        )
        keep = curated.join(dup_ids, "doc_id", "left_anti")
        (
            keep.write.mode("append")
            .partitionBy(partition_by)
            .parquet(out_dir)
        )

    return (
        stream_jsonl_docs(spark, in_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_ingest_to_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.3,
    partition_by: str = "lang",
):
    """Wire source → curation → partitioned parquet sink; returns the
    StreamingQuery (caller awaits/stops it).

    Append output mode: every row is emitted exactly once when its file
    is processed (checkpointed source offsets make redelivery safe
    across restarts). Partitioning by ``lang`` keeps downstream
    language-filtered reads prunable, matching the batch sink policy
    (``sources/parquet_sink.py``).
    """
    curated = curate_batch(stream_jsonl_docs(spark, in_dir), min_quality)
    return (
        curated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(partition_by)
        .start()
    )


def run_ingest_vs_band_table(
    spark: SparkSession,
    in_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    band_table: str,
    corpus_dir: str,
    threshold: float = 0.5,
    plan_sink: list | None = None,
    profile_dir: str | None = None,
    profile_cols: list[str] | None = None,
):
    """Streaming ingest wired to the PERSISTED dedup index (VERDICT r7
    item 4) — where the band-table lifecycle
    (``operators/dedup.py::write_band_table`` / ``append_band_table``)
    and real structured streaming finally meet. Per micro-batch, inside
    ``foreachBatch``:

    1. emit the batch's near-dup pairs against everything ingested so
       far via ``incremental_pairs_vs_band_table`` — candidate
       generation reads the STORED bucketed band table, so the corpus
       side joins with NO Exchange (the bucket spec carries the
       partitioning through every append);
    2. append the emitted pairs to ``pairs_dir`` (the dedup service's
       output log);
    3. append the batch's band keys to the index through the table's
       own stored LSH parameters (``append_band_table`` — O(batch));
    4. append the batch's documents to ``corpus_dir`` (the verify-side
       corpus the NEXT batches' exact-Jaccard check reads).

    The cumulative pair log therefore equals the batch replay: every
    (later-batch doc, earlier-batch-or-seed doc) pair at exact Jaccard
    ≥ ``threshold`` that the banding candidates — pytest-locked
    batch/stream parity in ``tests/test_streaming_ingest.py``, oracled
    as the registry query ``stream_dedup_ingest``. Within-batch pairs
    are intentionally out of scope (a micro-batch dedups against the
    PAST; its internal dups are the batch path's job) — the test
    corpus plants none.

    ``foreachBatch`` (not a stream-stream join) because the index side
    is a growing TABLE, not a stream, and each batch's output is
    complete on its own. ``plan_sink``, when given, receives the pairs
    plan text per batch so tests can hold the no-corpus-Exchange lock
    INSIDE the running stream. At 100 TB this is the whole dedup
    service: band table + corpus dir are the only state, both
    append-only, compaction amortized (``compact_band_table``).

    ``profile_dir``, when given, makes the service ALSO maintain the
    running data profile: each micro-batch's mergeable state row
    (``operators/profile.py::profile_state`` — counts, typed extremes,
    HLL sketches over ``profile_cols``, default the DOC_SCHEMA
    columns) folds into the persisted state with
    ``merge_profile_states`` — O(batch) per trigger, and at any moment
    ``profile_from_state`` over the stored row IS the profile of
    everything ingested (pytest-locked ≡ a one-shot full recompute).

    Delivery semantics: ``foreachBatch`` side effects are AT-LEAST-ONCE
    on crash-retry — a failure between any of the four writes and the
    checkpoint commit replays the batch (duplicated pair-log rows and a
    double-folded profile batch; band-table re-appends dedup at query
    time through the candidate ``distinct``). Production hardening is
    the standard idempotent-sink recipe: stamp rows with ``batch_id``
    and drop already-seen ids on replay. The batch-replay registry
    query (``stream_dedup_ingest``) and the parity test cover the
    no-crash path.
    """
    from common_survey_data_pipeline_spark.operators.dedup import (
        append_band_table,
        incremental_pairs_vs_band_table,
    )
    from common_survey_data_pipeline_spark.operators.profile import (
        merge_profile_states,
        profile_state,
    )

    if profile_cols is None:
        profile_cols = ["doc_id", "text", "lang", "source"]

    def _process(batch: DataFrame, _batch_id: int) -> None:
        # the source frame is consumed several times below (pairs,
        # band append, corpus append) — pin it once, O(batch)
        batch = batch.localCheckpoint(eager=True)
        corpus = spark.read.parquet(corpus_dir)
        pairs = incremental_pairs_vs_band_table(
            spark, band_table, corpus, batch, "text", "doc_id",
            threshold=threshold,
        )
        if plan_sink is not None:
            plan_sink.append(
                pairs._jdf.queryExecution().executedPlan().toString()
            )
        pairs.write.mode("append").parquet(pairs_dir)
        append_band_table(spark, batch, band_table)
        batch.write.mode("append").parquet(corpus_dir)
        if profile_dir is not None:
            import os

            states = [profile_state(batch, profile_cols)]
            if os.path.isdir(profile_dir):
                states.append(spark.read.parquet(profile_dir))
            # one merged wide row; materialize BEFORE overwriting the
            # same path the previous state was just read from
            merged = merge_profile_states(states).localCheckpoint(
                eager=True
            )
            merged.write.mode("overwrite").parquet(profile_dir)
        # the incremental operator caches two O(batch) intermediates
        # per call; a long-lived stream must not accumulate them
        spark.catalog.clearCache()

    return (
        stream_jsonl_docs(spark, in_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
