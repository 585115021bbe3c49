"""Similarity-search tests: exact brute-force sanity plus recall of the
two approximate paths (sign-LSH, IVF) against the exact top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    signlsh_topk,
)
from common_survey_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"  # 500 vectors — enough for recall stats


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.fixture(scope="module")
def exact(emb, queries):
    return {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }


def test_exact_topk_shape_and_selfsim(spark, emb, queries, exact):
    out = cosine_topk(emb, queries, k=10)
    rows = out.collect()
    assert len(rows) == 100  # 10 queries × k=10
    assert all(1 <= r["rank"] <= 10 for r in rows)
    assert all(-1.0 <= r["cosine_sim"] <= 1.0 for r in rows)
    # self matches are excluded
    assert all(r["query_id"] != r["vec_id"] for r in rows)
    # per-query ranks are dense and unique
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in by_q.values())


def test_matmul_strategy_equals_expr(emb, queries):
    expr = cosine_topk(emb, queries, k=10, strategy="expr").collect()
    mat = cosine_topk(emb, queries, k=10, strategy="matmul").collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, expr)) == sorted(map(tuple, mat))
    assert len(mat) == 100


def test_signlsh_recall(emb, queries, exact):
    got = {
        (r["query_id"], r["vec_id"])
        for r in signlsh_topk(emb, queries, k=10).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall  # 4 tables × 4-bit multiprobe LSH


def test_ivf_recall_rises_with_nprobe(emb, queries, exact):
    # near-uniform synthetic vectors are LSH/IVF's worst case; the
    # contract is the recall/cost dial, not a fixed recall on noise
    def recall(nprobe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(emb, queries, k=10, nlist=16, nprobe=nprobe).collect()
        }
        return len(got & exact) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r8 >= 0.7, (r2, r8)
    assert r8 > r2, (r2, r8)


def test_neardup_lsh_recall_vs_exact(emb):
    from common_survey_data_pipeline_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.45, strategy="exact").collect()
    }
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.45, strategy="lsh").collect()
    }
    assert len(exact_pairs) > 0
    # LSH never produces false positives (exact verification)...
    assert lsh_pairs <= exact_pairs
    # ...and recall stays high even at this weak-similarity threshold
    assert len(lsh_pairs) / len(exact_pairs) >= 0.8


@pytest.mark.parametrize("name", ["similarity_signlsh", "similarity_ivf"])
def test_registry_ann_recall_contract(spark, name):
    """The registry's ANN queries export (query_id, found_k, recall_ok)
    and must report full k found and recall ≥ 0.9 for EVERY query — the
    driver's value-hash pins the same via the oracle."""
    from common_survey_data_pipeline_spark.workload import REGISTRY

    rows = REGISTRY[name].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r["found_k"] == 10 for r in rows), rows
    assert all(r["recall_ok"] for r in rows), rows


def test_ivf_full_probe_is_exact(emb, queries, exact):
    # probing every cell must reproduce the exact result
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=10, nlist=8, nprobe=8).collect()
    }
    assert got == exact
