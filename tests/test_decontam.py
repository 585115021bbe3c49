"""Unit tests for operators/decontam.py on hand-built documents where
the expected values are computable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.decontam import (
    boilerplate_spans,
    crossdoc_duplication,
    ngram_decontaminate,
    repetition_metrics,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_crossdoc_duplication_shares(spark):
    # doc 1 and 2 share the 2-gram "a b"; doc 3 shares nothing
    docs = _docs(
        spark,
        [(1, "a b c"), (2, "a b d"), (3, "x y z")],
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared"], r["dup_share"])
        for r in crossdoc_duplication(docs, n=2).collect()
    }
    assert got == {
        1: (2, 1, 0.5),  # grams {a b, b c}; "a b" shared
        2: (2, 1, 0.5),
        3: (2, 0, 0.0),
    }


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


# --- property tests vs a Python reference model ---------------------------

from hypothesis import given, settings, strategies as st

_tok = st.sampled_from(["alpha", "beta", "gamma", "delta"])
_text = st.lists(_tok, min_size=0, max_size=12).map(" ".join)


def _grams(text, n):
    toks = text.split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@given(trains=st.lists(_text, min_size=1, max_size=6),
       evals=st.lists(_text, min_size=1, max_size=3))
@settings(max_examples=10, deadline=None)
def test_decontaminate_matches_model(spark, trains, evals):
    train_df = spark.createDataFrame(list(enumerate(trains)), "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(evals)], "doc_id long, text string"
    )
    eval_vocab = {g for t in evals for g in _grams(t, 4)}
    want = {}
    for i, t in enumerate(trains):
        hits = {g for g in _grams(t, 4)} & eval_vocab
        if hits:
            want[i] = len(hits)
    got = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in ngram_decontaminate(train_df, eval_df, n=4).collect()
    }
    assert got == want


@given(texts=st.lists(_text, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_repetition_metrics_match_model(spark, texts):
    from collections import Counter

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert i not in got
            continue
        c2 = Counter(_grams(t, 2))
        c3 = Counter(_grams(t, 3))
        top2 = max(c2.values(), default=0)
        dup3 = sum(v - 1 for v in c3.values())
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["top2_cnt"] == top2
        assert abs(r["top2_frac"] - round(2.0 * top2 / len(toks), 6)) < 1e-9
        assert abs(r["dup3_frac"] - round(3.0 * dup3 / len(toks), 6)) < 1e-9
