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
