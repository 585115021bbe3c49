"""End-to-end corpus curation: the composed LLM-training-data pipeline.

One materialization chaining the engine's text/dedup stages in the
canonical curation order:

1. **score** — quality heuristic + language ID (pure JVM expressions),
2. **filter** — keep quality ≥ threshold in the target language,
3. **exact dedup** — one survivor (min id) per byte-identical text,
4. **near dedup** — MinHash-LSH pairs → connected components → keep
   each cluster's min-id representative.

Shuffle shape: one groupBy for exact dedup, the LSH equi-join pipeline
for near-dup pairs, O(diameter) rounds of label propagation, and
left-anti joins to apply the verdicts — the whole thing is hash-
partitioned by doc id / content hash; nothing is quadratic in corpus
size. This mirrors how production LLM corpora are cleaned (filter
before dedup so the expensive stages see fewer rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions.text import lang_id, quality_score
from common_survey_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    neardup_clusters,
)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    lang: str = "en",
    neardup_threshold: float = 0.5,
) -> DataFrame:
    """Curated corpus: (doc_id, quality DOUBLE) of surviving documents.

    Deterministic keeper policy throughout: the minimum id survives in
    every duplicate group (exact or near), so reruns and engine ports
    agree row-for-row.

    CACHING CONTRACT: the scored-and-filtered corpus is
    ``localCheckpoint(eager=False)``-ed (it feeds the exact-dedup
    group-by, both sides of its semi join, the MinHash shingle build
    and the final anti join — without the cut, the quality/lang-id
    scoring of the FULL corpus re-executes 3+ times), and
    ``minhash_dedup_pairs`` additionally ``.cache()``s its shingle
    table for the clustering phase (see its docstring). Long-lived
    sessions calling this per shard should ``spark.catalog.clearCache()``
    between calls; checkpoint blocks are freed by the ContextCleaner
    once the returned frame is garbage.
    """
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        quality_score(F.col(text_col)).alias("quality"),
        lang_id(F.col(text_col)).alias("__lang"),
    )
    kept = scored.where(
        (F.col("quality") >= min_quality) & (F.col("__lang") == lang)
    ).drop("__lang").localCheckpoint(eager=False)

    # exact dedup: min id per content hash, applied with a semi join —
    # the same operator (and keeper policy) the registry exposes as
    # dedup_exact_groups, not a drifting inline copy
    uniq = exact_dedup(kept, "__text", "doc_id")

    # near dedup among survivors: cluster, drop everything but the
    # cluster representative (cluster_id == min reachable id)
    pairs = minhash_dedup_pairs(
        uniq, "__text", "doc_id", threshold=neardup_threshold
    )
    losers = (
        neardup_clusters(pairs)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    return (
        uniq.join(losers, "doc_id", "left_anti")
        .select("doc_id", "quality")
    )
