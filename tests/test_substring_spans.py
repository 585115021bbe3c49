"""Variable-k and near-verbatim substring spans (VERDICT r6 item 4):
the k-monotonicity subset property, verbatim ⊆ normalized containment,
and the near-verbatim semantics on hand-built cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.dedup import (
    substring_dup_spans,
)
from common_survey_data_pipeline_spark.sources.tables import load_table


def _covered(rows) -> set[tuple[int, int]]:
    """(doc_id, token_pos) pairs covered by a span report."""
    out: set[tuple[int, int]] = set()
    for r in rows:
        for p in range(r["span_start"], r["span_end"] + 1):
            out.add((r["doc_id"], p))
    return out


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_larger_k_covers_subset_of_tokens(spark, docs):
    """Every token inside a duplicate 12-gram window is inside a
    duplicate 6-gram window: coverage(k=12) ⊆ coverage(k=6)."""
    cov6 = _covered(substring_dup_spans(docs, k=6).collect())
    cov12 = _covered(substring_dup_spans(docs, k=12).collect())
    assert cov12, "k=12 found nothing — fixture too weak to test subset"
    assert cov12 <= cov6
    assert cov12 != cov6  # k really bites: some short dups drop out


def test_verbatim_coverage_subset_of_normalized(spark, docs):
    """Normalization only merges gram classes, so every verbatim dup
    window is also a normalized dup window."""
    cov_v = _covered(substring_dup_spans(docs, k=6).collect())
    cov_n = _covered(
        substring_dup_spans(docs, k=6, normalize=True).collect()
    )
    assert cov_v <= cov_n


def test_normalized_spans_catch_case_and_punct_edits(spark):
    """A passage re-pasted with different casing and punctuation is
    invisible to the verbatim profile and caught by the normalized one."""
    passage = "the quick brown fox jumps over the lazy dog again"
    edited = "The, quick BROWN fox jumps over the lazy dog; again"
    rows = [
        (1, f"unique lead-in alpha {passage} unique tail one"),
        (2, f"different opener beta {edited} other ending two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    verbatim = substring_dup_spans(df, k=6).collect()
    assert verbatim == []
    norm = substring_dup_spans(df, k=6, normalize=True).collect()
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in norm
    )
    # passage = 10 tokens at positions 4-13 in both docs
    assert got == [(1, 4, 13), (2, 4, 13)]


def test_span_arithmetic_invariants(spark, docs):
    for r in substring_dup_spans(docs, k=12).collect():
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
        assert r["span_tokens"] == r["n_dup_grams"] + 11
        assert r["span_tokens"] >= 12


def test_decontaminate_spans_surgical_vs_drop(spark):
    """The span cut removes exactly the covered tokens; the rest of
    the document survives (unlike the drop-the-document policy)."""
    from common_survey_data_pipeline_spark.operators.decontam import (
        decontaminate_spans,
        ngram_decontaminate,
    )

    bench = "the quick brown fox jumps"
    train_rows = [
        (1, f"alpha beta {bench} gamma delta epsilon"),
        (2, "totally unrelated text with no overlap at all"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    eval_set = spark.createDataFrame(
        [(100, bench)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_spans(train, eval_set, n=4).collect()
    }
    # doc 1: bench is 5 tokens at positions 3-7; 4-gram windows at 3,4
    # cover positions 3-7 — exactly the benchmark text is cut
    assert out[1]["n_removed"] == 5
    assert out[1]["cleaned_text"] == "alpha beta gamma delta epsilon"
    # doc 2 untouched
    assert out[2]["n_removed"] == 0
    assert out[2]["cleaned_text"] == train_rows[1][1]
    # the drop policy would have discarded doc 1 wholesale
    dropped = {
        r["doc_id"]
        for r in ngram_decontaminate(train, eval_set, n=4).collect()
    }
    assert dropped == {1}
