"""Tests for the LM-corpus planning queries (round 7 cont.):
perplexity buckets, temperature mix weights, vocab coverage, sequence
lengths, stratified sampling, skew diagnosis, and line-level
keep-first dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.dedup import (
    line_dedup_keep_first,
)
from common_survey_data_pipeline_spark.workload import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# line_dedup_keep_first
# ---------------------------------------------------------------------------


def test_line_dedup_keep_first_hand_case(spark):
    """Three 2-token units: 'a b' appears in doc 1 (idx 0), doc 1
    (idx 2) and doc 2 — only the doc-1/idx-0 copy survives; doc 3 is
    ALL boilerplate and comes back empty."""
    df = spark.createDataFrame(
        [
            (1, "a b c d a b"),   # units: 'a b', 'c d', 'a b'(dup)
            (2, "a b e f"),       # units: 'a b'(dup), 'e f'
            (3, "c d"),           # unit:  'c d'(dup)
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup_keep_first(df, "text", "doc_id", unit_tokens=2)
        .collect()
    }
    assert out[1]["cleaned_text"] == "a b c d"
    assert (out[1]["n_units"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["cleaned_text"] == "e f"
    assert out[3]["cleaned_text"] == ""
    assert (out[3]["n_units"], out[3]["n_kept"]) == (1, 0)


def test_line_dedup_totals_conserved(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = line_dedup_keep_first(docs, "text", "doc_id", unit_tokens=12)
    assert out.count() == docs.count()
    bad = out.where(F.col("n_kept") > F.col("n_units")).count()
    assert bad == 0
    # total kept units == number of distinct unit texts in the corpus
    tot_kept = out.agg(F.sum("n_kept")).first()[0]
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    distinct_units = (
        docs.select(toks.alias("t"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        (F.ceil(F.size("t") / 12) - 1).cast("int"),
                    ),
                    lambda i: F.array_join(F.slice(F.col("t"), i * 12 + 1, 12), " "),
                )
            ).alias("unit")
        )
        .distinct()
        .count()
    )
    assert tot_kept == distinct_units


# ---------------------------------------------------------------------------
# stratified_sample_exact
# ---------------------------------------------------------------------------


def test_stratified_sample_exact_quota_and_determinism(spark):
    fn = REGISTRY["stratified_sample_exact"].fn
    out = fn(spark, SF_DIR)
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    strata = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in strata.items():
        assert sizes.get(lang, 0) == min(20, n)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# skew_key_stats
# ---------------------------------------------------------------------------


def test_skew_key_stats_shape_and_algebra(spark):
    row = REGISTRY["skew_key_stats"].fn(spark, SF_DIR).first()
    assert row["n_rows"] > 0 and row["n_keys"] > 0
    assert row["p50_key_rows"] <= row["p99_key_rows"] <= row["max_key_rows"]
    expect = row["max_key_rows"] * row["n_keys"] / row["n_rows"]
    assert math.isclose(row["skew_ratio"], round(expect, 6), abs_tol=1e-9)


# ---------------------------------------------------------------------------
# mix_temperature_weights
# ---------------------------------------------------------------------------


def test_mix_weights_normalize_and_upsample_tail(spark):
    rows = REGISTRY["mix_temperature_weights"].fn(spark, SF_DIR).collect()
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    total = sum(r["n_tokens"] for r in rows)
    # temperature < 1 upsamples below-average domains, downsamples the head
    for r in rows:
        share = r["n_tokens"] / total
        if share < 1.0 / len(rows):
            assert r["mix_weight"] > share
        # epochs = weight / natural share
        assert math.isclose(
            r["epochs_at_budget"], round(r["mix_weight"] / share, 6),
            rel_tol=1e-3,
        )


# ---------------------------------------------------------------------------
# vocab_coverage_curve / seqlen_truncation_stats
# ---------------------------------------------------------------------------


def test_vocab_coverage_monotone_and_bounded(spark):
    rows = sorted(
        REGISTRY["vocab_coverage_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["vocab_size"],
    )
    cov = [r["coverage"] for r in rows]
    assert cov == sorted(cov)
    assert all(0.0 < c <= 1.0 for c in cov)
    # once k >= |vocab| coverage is exactly 1
    full = [r for r in rows if r["words_in_vocab"] < r["vocab_size"]]
    assert all(r["coverage"] == 1.0 for r in full)
    assert all(r["covered_tokens"] <= r["total_tokens"] for r in rows)


def test_seqlen_truncation_monotone(spark):
    rows = REGISTRY["seqlen_truncation_stats"].fn(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert r["lost_at_ctx32"] >= r["lost_at_ctx64"] >= r["lost_at_ctx128"]
        assert r["lost_at_ctx32"] <= r["n_tokens"]


# ---------------------------------------------------------------------------
# lm_perplexity_buckets
# ---------------------------------------------------------------------------


def test_perplexity_buckets_partition_and_order(spark):
    rows = sorted(
        REGISTRY["lm_perplexity_buckets"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == [1, 2, 3]
    # tertiles cover (almost) equal doc counts of the scorable corpus
    ns = [r["n_docs"] for r in rows]
    assert max(ns) - min(ns) <= 1
    # bucket 1 = most fluent: its WORST doc is at least as fluent as
    # bucket 2's best, etc. (desc ntile order)
    assert rows[0]["min_avg_logprob"] >= rows[1]["max_avg_logprob"] - 1e-9
    assert rows[1]["min_avg_logprob"] >= rows[2]["max_avg_logprob"] - 1e-9


@pytest.mark.parametrize(
    "name",
    ["lm_perplexity_buckets", "mix_temperature_weights",
     "vocab_coverage_curve", "seqlen_truncation_stats",
     "line_dedup_keep_first", "stratified_sample_exact",
     "skew_key_stats"],
)
def test_planning_queries_deterministic(spark, name):
    fn = REGISTRY[name].fn
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# batch 3: entropy, packing efficiency, split matrix, drift
# ---------------------------------------------------------------------------


def test_entropy_bounds(spark):
    row = REGISTRY["ngram_entropy_diversity"].fn(spark, SF_DIR).first()
    assert 0.0 < row["unigram_entropy_bits"] <= math.log2(row["unigram_types"]) + 1e-6
    assert 0.0 < row["bigram_entropy_bits"] <= math.log2(row["bigram_types"]) + 1e-6
    # conditioning can't hurt: joint (bigram) entropy >= marginal
    assert row["bigram_entropy_bits"] >= row["unigram_entropy_bits"] - 1e-6
    assert 0.0 < row["type_token_ratio"] <= 1.0


def test_pack_efficiency_conservation(spark):
    rows = REGISTRY["pack_efficiency"].fn(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                              lambda t: t != "")))
    ).first()[0]
    assert sum(r["pack_tokens"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == docs.count()
    ids = sorted(r["pack_id"] for r in rows)
    assert ids == list(range(len(ids)))  # contiguous shards
    for r in rows:
        assert 0 <= r["n_straddlers"] <= r["n_docs"]
        # at most one doc can overflow a given pack's boundary
        assert r["n_straddlers"] <= 1
        assert r["overflow_tokens"] >= r["n_straddlers"]


def test_split_matrix_bounds(spark):
    rows = REGISTRY["split_contamination_matrix"].fn(spark, SF_DIR).collect()
    diag = {r["split_a"]: r["shared_grams"] for r in rows
            if r["split_a"] == r["split_b"]}
    assert set(diag) == {"train", "val", "test"}
    for r in rows:
        if r["split_a"] != r["split_b"]:
            assert r["shared_grams"] <= min(diag[r["split_a"]],
                                            diag[r["split_b"]])
            assert r["shared_grams"] > 0  # zero cells are absent rows


def test_embedding_drift_shape(spark):
    rows = REGISTRY["embedding_drift_stats"].fn(spark, SF_DIR).collect()
    assert len(rows) == 64
    assert all(r["n_ref"] + r["n_cand"] == 500 for r in rows)
    assert all(r["mean_shift"] >= 0.0 for r in rows)
    # parity split of one distribution: means must be close, not equal
    assert max(r["mean_shift"] for r in rows) < 0.2


@pytest.mark.parametrize(
    "name",
    ["ngram_entropy_diversity", "pack_efficiency",
     "split_contamination_matrix", "embedding_drift_stats"],
)
def test_batch3_deterministic(spark, name):
    fn = REGISTRY[name].fn
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b


def test_quality_calibration_deciles(spark):
    rows = sorted(
        REGISTRY["quality_score_calibration"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n_docs"] for r in rows) == 500
    # decile 1 = best scores; logit ranges must be non-increasing and
    # keep-rate monotone non-increasing down the deciles
    for a, b in zip(rows, rows[1:]):
        assert a["min_logit_micro"] >= b["max_logit_micro"]
        assert a["keep_rate"] >= b["keep_rate"]
    # threshold semantics: a decile fully above 0 keeps everything
    for r in rows:
        if r["min_logit_micro"] > 0:
            assert r["keep_rate"] == 1.0
        if r["max_logit_micro"] <= 0:
            assert r["keep_rate"] == 0.0


def test_minhash_certificate_matches_pair_set(spark):
    """The certificate's pair set and exact Jaccard values equal
    dedup_minhash's, and every pair certifies within tolerance."""
    rows = REGISTRY["dedup_minhash_certificate"].fn(spark, SF_DIR).collect()
    assert rows and all(r["within_tolerance"] for r in rows)
    base = {(r["id_a"], r["id_b"], r["jaccard_sim"])
            for r in REGISTRY["dedup_minhash"].fn(spark, SF_DIR).collect()}
    assert {(r["id_a"], r["id_b"], r["jaccard_sim"]) for r in rows} == base


def test_join_state_accounting_invariants(spark):
    """Conservation + limit behavior of the stream-stream join state
    replay: batch = lost + streamed per hour; an unbounded watermark
    delay loses nothing; a zero delay loses at least as much."""
    from common_survey_data_pipeline_spark.streaming.events import (
        join_state_accounting,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "arr",
        F.col("event_id")
        + F.when(F.col("event_id") % 13 == 0, 997)
        .when(F.col("event_id") % 5 == 0, 7)
        .otherwise(0),
    )
    rows = REGISTRY["events_join_state_accounting"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(
        r["n_pairs_batch"] == r["n_pairs_lost"] + r["n_pairs_streamed"]
        for r in rows
    )
    total_batch = sum(r["n_pairs_batch"] for r in rows)
    lost_30m = sum(r["n_pairs_lost"] for r in rows)
    assert 0 < lost_30m < total_batch  # the jitter model loses SOME pairs
    huge = join_state_accounting(ev, delay="100 days", arrival_col="arr")
    assert huge.agg(F.sum("n_pairs_lost")).first()[0] == 0
    zero = join_state_accounting(ev, delay="0 minutes", arrival_col="arr")
    assert zero.agg(F.sum("n_pairs_lost")).first()[0] >= lost_30m
    # the batch pair count is watermark-independent
    assert huge.agg(F.sum("n_pairs_batch")).first()[0] == total_batch


def test_language_confusion_conserves_and_is_closed(spark):
    """Every document lands in exactly one cell; predictions stay in
    the model's label space (the 4 stopword languages + unknown — 'zh'
    has no model so it can never be predicted). The synthetic corpus's
    lang LABELS are metadata uncorrelated with the word-soup text, so
    the matrix's off-diagonal mass is expected here — which is exactly
    what this eval op exists to surface before trusting a filter."""
    rows = REGISTRY["doc_language_confusion"].fn(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    assert not any(r["pred_lang"] == "zh" for r in rows)
    assert {r["pred_lang"] for r in rows} <= {"en", "de", "es", "fr",
                                              "unknown"}
    assert {r["true_lang"] for r in rows} == {"en", "de", "es", "fr", "zh"}
    # matches the standalone per-doc prediction query cell-for-cell
    from pyspark.sql import functions as F2
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    per_doc = REGISTRY["text_lang_id"].fn(spark, SF_DIR)
    cells = {
        (r["lang"], r["pred_lang"]): r["n"]
        for r in per_doc.join(docs, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F2.count(F2.lit(1)).alias("n"))
        .collect()
    }
    assert {(r["true_lang"], r["pred_lang"]): r["n_docs"]
            for r in rows} == cells


def test_winnowing_containment_finds_neardups_and_bounds(spark):
    rows = REGISTRY["winnowing_containment"].fn(spark, SF_DIR).collect()
    assert rows  # the synthetic mutated-copy pairs share most fingerprints
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.5 <= r["containment"] <= 1.0
        assert r["shared_fps"] > 0
    # containment generalizes symmetric near-dup: every exact-Jaccard
    # near-dup pair (>= 0.8) must also be containment-detected
    strong = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["dedup_ngram_exact"].fn(spark, SF_DIR).collect()
        if r["jaccard_sim"] >= 0.8
    }
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert strong <= got
