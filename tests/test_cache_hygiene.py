"""Cache hygiene for the operators that persist shared subtrees
(VERDICT r10 item 9).

Two contracts are pinned here:

1. :func:`operators.graph.pagerank` (the convergence-loop operator)
   RELEASES what it allocates: its final ranks frame is an eager
   localCheckpoint, so once the loop ends the edge/degree caches are
   unpersisted inside the operator — a long-lived session running many
   pageranks accumulates nothing.

2. Every other caching operator follows the documented
   clearCache-after-consuming contract (their returned frames are lazy,
   so self-unpersisting would force recomputation): after consuming the
   result and calling ``spark.catalog.clearCache()`` — exactly what
   bench.py does between samples — the session's cache manager returns
   to empty, i.e. no operator registers state that a session-level
   clear cannot release. SCALING.md §cache-sites lists every site.
"""

from __future__ import annotations


from common_survey_data_pipeline_spark.operators.dedup import (
    minhash_dedup_pairs,
    prefix_filter_jaccard_pairs,
    substring_dup_spans,
)
from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    qgram_edit_pairs,
)
from common_survey_data_pipeline_spark.operators.graph import pagerank
from common_survey_data_pipeline_spark.workload import REGISTRY


def _cache_mgr_empty(spark) -> bool:
    """True when no DataFrame-level cache (persist/cache) is registered
    — the session-scope state clearCache releases. (localCheckpoint RDD
    blocks are ContextCleaner-managed and not visible here; they are
    released when unreferenced.)"""
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pagerank_operator_releases_its_caches(spark):
    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)],
        "src long, dst long",
    )
    ranks = pagerank(edges, max_iter=3)
    assert ranks.count() == 3
    # the operator unpersisted its edge list and degree table itself —
    # nothing left for the caller to clear
    assert _cache_mgr_empty(spark)


def test_caching_operators_release_under_clear_cache(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark.catalog.clearCache()
    builders = {
        "minhash_dedup_pairs": lambda: minhash_dedup_pairs(
            docs, "text", "doc_id"
        ),
        "prefix_filter_jaccard_pairs": lambda: prefix_filter_jaccard_pairs(
            docs, "text", "doc_id"
        ),
        "substring_dup_spans": lambda: substring_dup_spans(docs),
        "qgram_edit_pairs": lambda: qgram_edit_pairs(
            docs, "text", "doc_id", max_dist=12
        ),
        "winnowing_containment": lambda: REGISTRY[
            "winnowing_containment"
        ].fn(spark, sf_dir),
        "pagerank_parts_2iter": lambda: REGISTRY[
            "pagerank_parts_2iter"
        ].fn(spark, sf_dir),
    }
    for name, build in builders.items():
        build().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        assert _cache_mgr_empty(spark), (
            f"{name}: cached state survived spark.catalog.clearCache() — "
            "the operator registers something outside the session cache "
            "manager, breaking the documented long-lived-session contract"
        )
