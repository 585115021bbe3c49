"""Unit tests for operators/decontam.py on hand-built documents where
the expected values are computable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.decontam import (
    boilerplate_spans,
    ngram_decontaminate,
    repetition_metrics,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_decontaminate_flags_only_overlapping(spark):
    train = _docs(
        spark,
        [
            (1, "a b c d e f"),      # shares 4-gram "a b c d" with eval
            (2, "x y z w q"),        # no overlap
            (3, "c d e f g"),        # shares "c d e f"
        ],
    )
    eval_set = _docs(spark, [(100, "a b c d e f g")])
    out = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in ngram_decontaminate(train, eval_set, n=4).collect()
    }
    # doc 1: grams {abcd, bcde, cdef} all in eval → 3; doc 3: {cdef, defg} → 2
    assert out == {1: 3, 3: 2}


def test_ngram_decontaminate_short_docs_produce_no_grams(spark):
    train = _docs(spark, [(1, "a b c")])  # < 4 tokens → no 4-grams
    eval_set = _docs(spark, [(100, "a b c d")])
    assert ngram_decontaminate(train, eval_set, n=4).count() == 0


def test_repetition_metrics_values(spark):
    docs = _docs(
        spark,
        [
            # "a b" occurs 3x (tokens: a b a b a b) → top2_cnt=3,
            # top2_frac = 2*3/6 = 1.0; 3-grams: aba x2, bab x2 →
            # dup3_extra = 2 → dup3_frac = 3*2/6 = 1.0
            (1, "a b a b a b"),
            # all distinct: top2_cnt=1, top2_frac=2/5=0.4, dup3_frac=0
            (2, "v w x y z"),
            # single token: no 2-grams → top2_cnt=0
            (3, "solo"),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert rows[1]["top2_cnt"] == 3
    assert rows[1]["top2_frac"] == 1.0
    assert rows[1]["dup3_frac"] == 1.0
    assert rows[2]["top2_frac"] == 0.4
    assert rows[2]["dup3_frac"] == 0.0
    assert rows[3]["top2_cnt"] == 0
    assert rows[3]["top2_frac"] == 0.0


def test_boilerplate_spans_cross_doc_counts(spark):
    shared = "the quick brown fox jumps"
    docs = _docs(
        spark,
        [
            (1, shared + " alpha beta"),
            (2, shared + " gamma delta"),
            (3, "totally different text here now"),
            # repeating the span within ONE doc must not inflate n_docs
            (4, shared + " " + shared),
        ],
    )
    out = {r["gram"]: r for r in boilerplate_spans(docs, n=5, min_docs=2).collect()}
    assert shared in out
    assert out[shared]["n_docs"] == 3
    assert out[shared]["first_doc"] == 1
    # spans unique to one doc are excluded
    assert all(r["n_docs"] >= 2 for r in out.values())
