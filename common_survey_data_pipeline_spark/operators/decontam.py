"""Corpus hygiene operators for pretraining-data pipelines:

- :func:`ngram_decontaminate` — flag training documents that share any
  word n-gram with a held-out evaluation set (the GPT-3 style "13-gram
  overlap" decontamination step, parameterized by n).
- :func:`repetition_metrics` — per-document repetition scores in the
  style of the Gopher quality rules (top-2-gram token fraction,
  duplicate-3-gram token fraction).
- :func:`boilerplate_spans` — word spans shared verbatim across many
  distinct documents (corpus-level boilerplate: headers, license
  blurbs, navigation chrome).
- :func:`crossdoc_duplication` — per-document fraction of its distinct
  word n-grams that also occur in at least one OTHER document (the
  corpus-duplication rate metric of Lee et al., "Deduplicating Training
  Data Makes Language Models Better").

All three are pure DataFrame compositions (explode → equi-join /
group-by) — no UDFs, no all-pairs stage, no driver-side loops — so each
scales as O(corpus tokens) with shuffles keyed on either the n-gram or
the document id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions.text import (
    token_count,
    word_ngrams,
    word_shingles,
)


def _exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, gram) pairs, grams distinct within each document."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Flag every training document sharing ≥1 word n-gram with the
    evaluation set. Returns ``(id_col, n_contaminated_grams)`` — one row
    per contaminated training document; the clean corpus is the anti-join
    of ``train`` against this result.

    100 TB shape: the eval side collapses to its DISTINCT n-gram
    vocabulary (benchmark suites are MBs, corpora are TBs), so the join
    is corpus-grams ⋈ small-vocab — AQE broadcasts the eval vocabulary
    at runtime and the corpus never shuffles on the join; the only
    corpus-wide shuffle is the final per-document group-by. No stage is
    quadratic in either input.
    """
    train_grams = _exploded_shingles(train, text_col, id_col, n)
    eval_vocab = (
        _exploded_shingles(eval_set, text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    hits = train_grams.join(eval_vocab, "gram")
    # grams are distinct per doc, so count(*) = distinct contaminated grams
    return hits.groupBy(id_col).agg(
        F.count("*").alias("n_contaminated_grams")
    )


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition scores (Gopher-style quality filters):

    - ``top2_frac``: fraction of tokens covered by the single most
      frequent 2-gram (``2 * max_count / n_tokens``).
    - ``dup3_frac``: fraction of tokens inside REPEATED 3-gram
      occurrences beyond each 3-gram's first (``3 * Σ max(c-1, 0) /
      n_tokens``).

    Repetitive machine-generated text scores high on both; fluent text
    scores near zero.

    r10 shape (guide §1.2 — the ideal plan first): both metrics are
    PER-DOCUMENT functions of the document's own n-gram multiset, so
    they are computed in ONE narrow projection — zero exchanges, zero
    joins — instead of the previous two explodes + four keyed
    aggregations + two joins:

    - the most frequent 2-gram's count is the longest equal-run of the
      SORTED 2-gram array (one ``aggregate`` pass over the array);
    - repeated-3-gram extras are ``size(g3) − size(array_distinct(g3))``
      (total occurrences minus distinct grams ≡ Σ (count−1)).

    Per-row state is bounded by the document's own length; results are
    bit-identical to the aggregation form (exact integer counts, same
    rounding expression — re-proven against the DuckDB oracle).
    """
    ident = F.col(id_col)
    g2_sorted = F.sort_array(word_ngrams(F.col(text_col), 2))
    top2_cnt = F.aggregate(
        g2_sorted,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    g3 = word_ngrams(F.col(text_col), 3)
    dup3_extra = (F.size(g3) - F.size(F.array_distinct(g3))).cast("long")
    out = docs.select(
        ident,
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        top2_cnt.alias("top2_cnt"),
        dup3_extra.alias("__dup3_extra"),
    ).select(
        ident,
        "n_tokens",
        F.col("top2_cnt"),
        F.round(
            F.lit(2.0) * F.col("top2_cnt") / F.col("n_tokens"), 6
        ).alias("top2_frac"),
        F.round(
            F.lit(3.0) * F.col("__dup3_extra") / F.col("n_tokens"), 6
        ).alias("dup3_frac"),
    )
    return out.where(F.col("n_tokens") > 0)


def boilerplate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Word n-gram spans appearing verbatim in ≥ ``min_docs`` DISTINCT
    documents — the corpus-level boilerplate report (license headers,
    navigation chrome, templated sentences) that drives span-level
    cleaning. Returns ``(gram, n_docs, first_doc)``.

    Spans are deduplicated within each document first, so the group-by
    count IS the distinct-document count — one explode, one shuffle on
    the gram. Heavy boilerplate (the point of the query) creates hot
    gram keys, but they land in a count aggregate with map-side partial
    aggregation, so skew is absorbed before the shuffle.
    """
    grams = _exploded_shingles(docs, text_col, id_col, n)
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("first_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def crossdoc_duplication(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-document cross-corpus duplication rate: of each document's
    DISTINCT word n-grams, the count (``n_shared``) and fraction
    (``dup_share``) that appear verbatim in ≥1 other document. Returns
    ``(id_col, n_grams, n_shared, dup_share)`` for documents with at
    least one n-gram; high ``dup_share`` marks near-copies that survive
    exact dedup (mirror pages, light edits of templated text).

    Shuffles are linear in corpus tokens: the gram document frequency
    is a map-side-partial groupBy count joined back shuffled-hash onto
    the persisted gram stream (r11 de-skew — the previous count Window
    had no partial aggregation and AQE cannot split a window
    partition, so one boilerplate gram serialized its whole row set
    into a single task's sort buffer; now hot grams collapse map-side
    and the probe join is AQE-skew-splittable), then a doc-keyed
    aggregation of the shared flags. The join stays on exact gram
    STRINGS — a hashed key's collisions would wrongly flag unique
    grams as shared, and there is no verify stage here to repair that.
    No pairwise stage — this is the metric-side complement of MinHash
    pair mining (`dedup.py`), usable as a standalone filter. The gram
    stream is persisted for the two passes (LRU-evictable;
    clearCache() after consuming in long-lived sessions).
    """
    grams = _exploded_shingles(docs, text_col, id_col, n).persist()
    gfreq = grams.groupBy("gram").agg(
        (F.count("*") >= 2).cast("long").alias("shared")
    )
    flagged = grams.join(gfreq.hint("shuffle_hash"), "gram").select(
        F.col(id_col), "shared"
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum("shared").alias("n_shared"),
        F.round(F.sum("shared") / F.count("*"), 6).alias("dup_share"),
    )


def decontaminate_spans(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """SURGICAL decontamination: instead of dropping every training
    document that shares an n-gram with the evaluation set
    (:func:`ngram_decontaminate` — the GPT-3 policy, which discards
    whole documents for one quoted benchmark sentence), cut ONLY the
    tokens covered by a shared n-gram window and re-emit the cleaned
    text. Output ``(id_col, n_tokens, n_removed, cleaned_text)`` for
    every training document; uncontaminated docs round-trip with
    ``n_removed = 0``.

    Composition of two existing stages: the positional hashed-gram
    table (``dedup._pos_gram_hashes`` — the substring-dedup candidate
    stage) joined against the eval set's DISTINCT gram vocabulary
    (tiny, AQE-broadcast — the ``ngram_decontaminate`` shape), then the
    shared cut-and-rebuild (``dedup.cut_spans_rebuild``). No stage is
    quadratic in either input; the corpus shuffles doc-keyed only.
    """
    from common_survey_data_pipeline_spark.operators.dedup import (
        _pos_gram_hashes,
        cut_spans_rebuild,
    )

    g = _pos_gram_hashes(train, text_col, id_col, n)
    vocab = (
        _pos_gram_hashes(eval_set, text_col, id_col, n)
        .select("gh")
        .distinct()
    )
    hits = g.join(vocab, "gh").select(id_col, "pos")
    return cut_spans_rebuild(train, hits, text_col, id_col, n)
