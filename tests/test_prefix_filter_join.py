"""prefix_filter_jaccard_pairs must equal the exact all-pairs join on
every input — the prefix filter is a lossless candidate pruning, not an
approximation."""

import pytest

from common_survey_data_pipeline_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)


def _docs(spark, texts, partitions=3):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(partitions)


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], r["jaccard_sim"]) for r in df.collect()
    )


BASE = "the quick brown fox jumps over the lazy dog near the old river bank"


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_equals_all_pairs(spark, threshold):
    texts = [
        BASE,
        BASE + " today",                      # very near dup
        BASE.replace("quick", "slow"),        # near dup
        "completely different words entirely here with nothing shared",
        "another unrelated document about distributed query engines",
        BASE.replace("fox", "cat").replace("dog", "bird"),
        " ".join(BASE.split()[:8]),           # prefix subset
    ]
    df = _docs(spark, texts)
    got = _pairs(prefix_filter_jaccard_pairs(df, "text", "doc_id", threshold))
    want = _pairs(ngram_jaccard_pairs(df, "text", "doc_id", threshold))
    assert got == want
    if threshold <= 0.5:
        assert got  # non-trivial at the lower thresholds


def test_identical_docs_and_empty(spark):
    df = _docs(spark, [BASE, BASE, ""])
    got = _pairs(prefix_filter_jaccard_pairs(df, "text", "doc_id", 0.5))
    assert got == [(0, 1, 1.0)]
    empty = _docs(spark, [])
    assert prefix_filter_jaccard_pairs(empty, "text", "doc_id").collect() == []


def test_sf_documents_match(spark, sf_dir):
    from common_survey_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = _pairs(prefix_filter_jaccard_pairs(docs, "text", "doc_id", 0.5))
    want = _pairs(ngram_jaccard_pairs(docs, "text", "doc_id", 0.5))
    assert got == want and got
