"""End-to-end corpus ETL: raw text files → quality filter → exact +
near dedup → token accounting → partitioned parquet — the full
training-data pipeline composed from the engine's operators, with row
accounting asserted at every stage."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions.text import (
    bpe_ish_token_count,
    quality_score,
)
from common_survey_data_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_dedup_pairs,
)
from common_survey_data_pipeline_spark.sources.parquet_sink import (
    write_partitioned_parquet,
)
from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.sources.textfile import (
    read_text_corpus,
    write_text_corpus,
)


def test_corpus_etl_end_to_end(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    raw_dir = str(tmp_path / "raw_txt")
    # duplicate a slice of the corpus to give dedup real work
    write_text_corpus(
        docs.unionByName(docs.where(F.col("doc_id") % 7 == 0)),
        "text",
        raw_dir,
        shards=4,
    )

    # 1. ingest: content-addressed ids make identical lines in the SAME
    #    file one (doc_id, text) value — distinct() collapses those rows;
    #    cross-file copies keep distinct ids and survive to dedup
    corpus = read_text_corpus(spark, raw_dir).select("doc_id", "text").distinct()

    # 2. quality gate
    scored = corpus.withColumn("quality", quality_score(F.col("text")))
    kept = scored.where(F.col("quality") >= 0.3)
    assert 0 < kept.count() < corpus.count() or kept.count() == corpus.count()

    # 3. exact dedup: one survivor per identical text
    groups = exact_dedup_groups(kept, "text", "doc_id")
    survivors = kept.join(
        groups.select(F.col("keeper_id").alias("doc_id")).distinct(), "doc_id"
    )
    n_unique_texts = kept.select("text").distinct().count()
    assert survivors.count() == n_unique_texts

    # 4. near-dup pair mining over the survivors (no exact dups remain,
    #    so every reported pair is a genuine near-match)
    pairs = minhash_dedup_pairs(survivors, "text", "doc_id", threshold=0.7)
    pair_ids = {r["id_a"] for r in pairs.collect()}

    # 5. token accounting + partitioned publish
    final = survivors.where(~F.col("doc_id").isin(pair_ids)).select(
        "doc_id",
        "text",
        "quality",
        bpe_ish_token_count(F.col("text")).alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(4)).alias("shard"),  # ids are signed
    )
    out_dir = str(tmp_path / "published")
    write_partitioned_parquet(
        final, out_dir, partition_by=("shard",), sort_within_by=("doc_id",)
    )
    back = spark.read.parquet(out_dir)
    assert back.count() == final.count() > 0
    assert len(glob.glob(out_dir + "/shard=*")) == 4
    # accounting: published tokens equal the pre-publish aggregate
    assert (
        back.agg(F.sum("n_tokens")).collect()[0][0]
        == final.agg(F.sum("n_tokens")).collect()[0][0]
    )


def test_parquet_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Schema evolution: v2 files add a column; mergeSchema unifies and
    back-fills nulls for v1 rows — the append-only corpus upgrade path."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "evolving")
    docs.select("doc_id", "text").write.parquet(path + "/batch=1")
    docs.select(
        "doc_id", "text", F.lit("v2").alias("pipeline_version")
    ).write.parquet(path + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "pipeline_version", "batch"}
    assert merged.count() == 2 * docs.count()
    assert (
        merged.where(F.col("pipeline_version").isNull()).count() == docs.count()
    )


def test_quality_score_stays_in_unit_range(spark):
    """Documented range is [0, 1]: pure punctuation soup used to reach
    -0.25 (regression: clamp at 0)."""
    df = spark.createDataFrame(
        [("!!! ???",), ("the of and a in to is was it for on",), ("",)],
        "text string",
    )
    scores = [
        r["q"] for r in df.select(quality_score(F.col("text")).alias("q")).collect()
    ]
    assert all(s is not None and 0.0 <= s <= 1.0 for s in scores), scores
    assert scores[0] == 0.0  # punctuation soup bottoms out at the clamp
