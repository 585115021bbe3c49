"""BPE tokenizer training + encode (``operators/bpe.py``).

The property anchor is an INDEPENDENT pure-Python reference
implementation (tuple sequences + explicit greedy leftmost merge loop —
no string-replace trick), so the Spark side's ``"|a||b|" → "|ab|"``
delimited-string representation is verified against first-principles
BPE semantics, not against itself. Plan shape: encode must be a
shuffle-free narrow map (the whole point of folding merges into one
expression).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.bpe import (
    bpe_encode,
    bpe_encoded_token_freqs,
    bpe_merges_df,
    bpe_train,
)
from common_survey_data_pipeline_spark.plans import plan_of


def ref_bpe(word_freqs: dict[str, int], k: int):
    """First-principles BPE trainer: overlapping pair counts
    (zip(sym, sym[1:])), argmax with (count desc, w1, w2) tie-break,
    greedy leftmost non-overlapping application."""
    vocab = {tuple(w): n for w, n in word_freqs.items()}
    merges = []
    for step in range(1, k + 1):
        pc: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, cnt))
        new: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + n
        vocab = new
    return merges, vocab


def ref_encode_word(word: str, merges) -> list[str]:
    sym = list(word)
    for _, a, b, _ in merges:
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _word_freqs(texts) -> dict[str, int]:
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    return wf


# Pathological corpus: overlapping runs (greedy "aaa" → [aa, a]),
# adjacent repeats of the merged pair ("abab"), single chars, words
# that become fully merged, and count ties forcing the lexicographic
# tie-break.
ADVERSARIAL = [
    "aaaa aaa aa a abab ab",
    "abab abab baba bb aa aaaa",
    "ba ab aab bba abba baab",
    "a b aa bb aaa bbb",
]


def test_train_matches_reference_on_adversarial_corpus(spark):
    merges = bpe_train(_docs(spark, ADVERSARIAL), k=8)
    expected, _ = ref_bpe(_word_freqs(ADVERSARIAL), 8)
    assert merges == expected


def test_train_matches_reference_on_random_corpus(spark):
    rng = random.Random(42)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 12))
        )
        for _ in range(25)
    ]
    merges = bpe_train(_docs(spark, texts), k=10)
    expected, _ = ref_bpe(_word_freqs(texts), 10)
    assert merges == expected


def test_train_stops_early_when_fully_merged(spark):
    # single 2-char word: exactly one merge possible, then no pairs
    merges = bpe_train(_docs(spark, ["ab ab ab"]), k=50)
    assert merges == [(1, "a", "b", 3)]


def test_encoded_token_freqs_match_reference(spark):
    docs = _docs(spark, ADVERSARIAL)
    merges = bpe_train(docs, k=8)
    got = {
        r["token"]: r["n"]
        for r in bpe_encoded_token_freqs(docs, merges).collect()
    }
    expected: dict[str, int] = {}
    for w, n in _word_freqs(ADVERSARIAL).items():
        for t in ref_encode_word(w, merges):
            expected[t] = expected.get(t, 0) + n
    assert got == expected


def test_encode_per_doc_preserves_word_boundaries(spark):
    docs = _docs(spark, ADVERSARIAL)
    merges = bpe_train(docs, k=8)
    rows = bpe_encode(docs, merges).orderBy("doc_id").collect()
    for row, text in zip(rows, ADVERSARIAL):
        expected = [
            t for w in text.split() for t in ref_encode_word(w, merges)
        ]
        assert row["bpe_tokens"] == expected
        # concatenation invariant: encoding never alters characters
        assert "".join(row["bpe_tokens"]) == text.replace(" ", "")


def test_encode_is_shuffle_free_narrow_map(spark):
    docs = _docs(spark, ADVERSARIAL)
    merges = bpe_train(docs, k=4)
    plan = plan_of(bpe_encode(docs, merges))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merges_df_schema_and_order(spark):
    df = bpe_merges_df(spark, _docs(spark, ADVERSARIAL), k=5)
    assert [f.name for f in df.schema.fields] == ["step", "w1", "w2", "n"]
    rows = df.orderBy("step").collect()
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]


def test_delimiter_words_are_dropped_not_corrupting(spark):
    # a token containing the delimiter cannot be represented; the
    # contract drops it from training and encoding rather than
    # corrupting the pair table
    texts = ["ab a|b ab", "ab ab"]
    merges = bpe_train(_docs(spark, texts), k=2)
    expected, _ = ref_bpe({"ab": 4}, 2)
    assert merges == expected
    enc = bpe_encode(_docs(spark, ["ab a|b"]), merges).first()["bpe_tokens"]
    assert enc == ["ab"]


def test_train_rejects_bad_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        bpe_train(_docs(spark, ["ab"]), k=0)


def test_tokenizer_persistence_roundtrip(spark):
    import shutil
    from urllib.parse import urlparse

    from common_survey_data_pipeline_spark.operators.bpe import (
        read_tokenizer,
        write_tokenizer,
    )

    t = "bpe_tokenizer_test"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    try:
        docs = _docs(spark, ADVERSARIAL)
        merges = bpe_train(docs, k=6)
        write_tokenizer(spark, merges, t)
        assert read_tokenizer(spark, t) == merges
        # encoding from the stored artifact == encoding from fresh merges
        a = {
            (r["token"], r["n"])
            for r in bpe_encoded_token_freqs(
                docs, read_tokenizer(spark, t)
            ).collect()
        }
        b = {
            (r["token"], r["n"])
            for r in bpe_encoded_token_freqs(docs, merges).collect()
        }
        assert a == b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_tokenizer_truncated_artifact_raises(spark):
    import shutil
    from urllib.parse import urlparse

    from common_survey_data_pipeline_spark.operators.bpe import (
        read_tokenizer,
        write_tokenizer,
    )

    t = "bpe_tokenizer_trunc_test"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    try:
        merges = bpe_train(_docs(spark, ADVERSARIAL), k=5)
        write_tokenizer(spark, merges, t)
        # simulate a truncated artifact: rows drop, the k property
        # stays (managed parquet tables don't support DELETE —
        # overwrite the rows, then restore the stored property)
        kept = spark.createDataFrame(merges[:3], "step int, w1 string, w2 string, n bigint")
        kept.write.mode("overwrite").saveAsTable(t)
        spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ('bpe.k'='5')")
        with pytest.raises(ValueError, match="truncated"):
            read_tokenizer(spark, t)
        # non-contiguous steps also fail loudly
        holey = spark.createDataFrame(
            [merges[0], merges[2]], "step int, w1 string, w2 string, n bigint"
        )
        holey.write.mode("overwrite").saveAsTable(t)
        spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ('bpe.k'='2')")
        with pytest.raises(ValueError, match="non-contiguous"):
            read_tokenizer(spark, t)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_oracle_degenerate_corpus_parity(spark, tmp_path):
    """ADVICE r8: when the vocabulary exhausts adjacent pairs before
    K merges, ``bpe_train`` breaks early while the DuckDB oracle's
    per-step scalar subqueries go empty — the COALESCE(chr(1)) guard
    must keep the two engines hash-identical on such corpora."""
    import duckdb

    from common_survey_data_pipeline_spark.workload import REGISTRY
    from tests.oracle_harness import compare

    # 'ab ab ba' exhausts after 2 merges; K in the registry is 32
    docs = spark.createDataFrame(
        [(0, "ab ab ba ab", "en", "s", 11), (1, "ba ab ba", "en", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in ("bpe_train_merges", "bpe_encode_tokens", "bpe_token_ids",
                 "bpe_encode_persisted", "bpe_train_to_vocab"):
        spec = REGISTRY[name]
        res = compare(spec.fn(spark, sf_dir), con, spec.oracle)
        assert res["match"], (name, res["detail"])


def test_delta_equals_recount_on_adversarial_corpus(spark):
    """VERDICT r8 item 3: the delta-maintained pair table must produce
    the EXACT merge list of the full recount loop — overlapping runs,
    repeat-adjacent merged pairs, ties, and early exhaustion included."""
    for k in (1, 3, 8, 32):
        delta = bpe_train(_docs(spark, ADVERSARIAL), k=k, strategy="delta")
        recount = bpe_train(
            _docs(spark, ADVERSARIAL), k=k, strategy="recount"
        )
        assert delta == recount, (k, delta, recount)


def test_driver_equals_recount_on_adversarial_corpus(spark):
    """Round-10 driver regime (bounded-vocab local loop — the `auto`
    choice below DELTA_MIN_VOCAB) must produce the EXACT merge list of
    the distributed recount loop: overlapping runs, repeat-adjacent
    merged pairs, lexicographic ties, and early exhaustion included."""
    for k in (1, 3, 8, 32):
        drv = bpe_train(_docs(spark, ADVERSARIAL), k=k, strategy="driver")
        recount = bpe_train(
            _docs(spark, ADVERSARIAL), k=k, strategy="recount"
        )
        assert drv == recount, (k, drv, recount)


def test_driver_equals_recount_on_random_corpora(spark):
    rng = random.Random(23)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(8)
        ]
        drv = bpe_train(_docs(spark, texts), k=10, strategy="driver")
        recount = bpe_train(_docs(spark, texts), k=10, strategy="recount")
        assert drv == recount, (trial, texts, drv, recount)


def test_train_to_vocab_driver_equals_recount(spark):
    from common_survey_data_pipeline_spark.operators.bpe import (
        bpe_train_to_vocab,
    )

    rng = random.Random(29)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(8)
        ]
        kwargs = dict(vocab_size=9, min_freq=2)
        drv = bpe_train_to_vocab(
            _docs(spark, texts), strategy="driver", **kwargs
        )
        recount = bpe_train_to_vocab(
            _docs(spark, texts), strategy="recount", **kwargs
        )
        assert drv == recount, (trial, texts, drv, recount)


def test_delta_equals_recount_on_random_corpora(spark):
    rng = random.Random(7)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(8)
        ]
        delta = bpe_train(_docs(spark, texts), k=10, strategy="delta")
        recount = bpe_train(_docs(spark, texts), k=10, strategy="recount")
        assert delta == recount, (trial, texts, delta, recount)


def test_train_to_vocab_target_and_prefix(spark):
    """VERDICT r9 item 5: bpe_train_to_vocab stops when |alphabet| +
    |distinct merge outputs| reaches the target; the merge list is a
    prefix of the k-mode list (selection logic untouched)."""
    from common_survey_data_pipeline_spark.operators.bpe import (
        bpe_train_to_vocab,
    )

    docs = _docs(spark, ADVERSARIAL)
    alpha = len({c for t in ADVERSARIAL for w in t.split() for c in w})
    target = alpha + 4
    got = bpe_train_to_vocab(docs, vocab_size=target)
    outputs = {w1 + w2 for _, w1, w2, _ in got}
    assert alpha + len(outputs) >= target
    # stop-AFTER-reaching: without the last merge the target is unmet
    prior = {w1 + w2 for _, w1, w2, _ in got[:-1]}
    assert alpha + len(prior) < target
    assert got == bpe_train(docs, k=len(got))  # prefix of k-mode


def test_train_to_vocab_delta_equals_recount(spark):
    from common_survey_data_pipeline_spark.operators.bpe import (
        bpe_train_to_vocab,
    )

    rng = random.Random(11)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(8)
        ]
        kwargs = dict(vocab_size=9, min_freq=2)
        delta = bpe_train_to_vocab(
            _docs(spark, texts), strategy="delta", **kwargs
        )
        recount = bpe_train_to_vocab(
            _docs(spark, texts), strategy="recount", **kwargs
        )
        assert delta == recount, (trial, texts, delta, recount)


def test_train_to_vocab_min_freq_floor_and_edge_cases(spark):
    from common_survey_data_pipeline_spark.operators.bpe import (
        bpe_train_to_vocab,
    )

    docs = _docs(spark, ADVERSARIAL)
    # a floor above every pair count records nothing
    assert bpe_train_to_vocab(docs, vocab_size=100, min_freq=10**9) == []
    # the floor truncates the merge list exactly where counts drop
    full = bpe_train_to_vocab(docs, vocab_size=100)
    floor = 1 + min(n for _, _, _, n in full)
    floored = bpe_train_to_vocab(docs, vocab_size=100, min_freq=floor)
    assert floored == [m for m in full[: len(floored)]]
    assert all(n >= floor for _, _, _, n in floored)
    assert len(floored) < len(full)
    # alphabet already >= target: zero merges
    assert bpe_train_to_vocab(docs, vocab_size=1) == []
    with pytest.raises(ValueError, match="vocab_size"):
        bpe_train_to_vocab(docs, vocab_size=0)
    with pytest.raises(ValueError, match="min_freq"):
        bpe_train_to_vocab(docs, vocab_size=10, min_freq=0)
    with pytest.raises(ValueError, match="strategy"):
        bpe_train_to_vocab(docs, vocab_size=10, strategy="nope")
