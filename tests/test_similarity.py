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


def test_matmul_strategy_no_negative_zero(spark):
    """Both strategies canonicalize IEEE −0.0: a tiny negative cosine
    that rounds to zero must PRINT as '0.0' on the matmul path too
    (np.round alone keeps the sign bit), or the representation-hash
    contract diverges between strategies."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1e-9, 1.0])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    for strategy in ("expr", "matmul"):
        rows = cosine_topk(
            corpus, q, k=5, strategy=strategy
        ).collect()
        sims = {r["vec_id"]: r["cosine_sim"] for r in rows}
        assert str(sims[2]) == "0.0", (strategy, sims)


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


@pytest.mark.parametrize(
    "name",
    ["similarity_signlsh", "similarity_ivf", "similarity_pq",
     "similarity_ivfpq"],
)
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


# ---------------------------------------------------------------------------
# Corrupt-input envelope (regressions from the r4 review pass)
# ---------------------------------------------------------------------------


def test_recall_report_covers_totally_missed_queries(spark):
    """A query the ANN index misses ENTIRELY must appear as
    (found_k=0, recall_ok=false), not vanish from the report."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        recall_vs_exact,
    )

    ann = spark.createDataFrame([(1, 100), (1, 101)], "query_id long, vec_id long")
    exact = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 200), (2, 201)], "query_id long, vec_id long"
    )
    got = {r["query_id"]: r for r in recall_vs_exact(ann, exact, k=2).collect()}
    assert got[1]["found_k"] == 2 and got[1]["recall_ok"]
    assert got[2]["found_k"] == 0 and not got[2]["recall_ok"]


def test_signlsh_null_rows_filtered_not_crashing(spark):
    """A NULL embedding as the FIRST corpus row used to crash the dim
    probe; any NULL vector used to hash into bucket 0 as a candidate."""
    corpus = spark.createDataFrame(
        [(99, None), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0]), (7, None)],
        "query_id long, query_vec array<double>",
    )
    out = signlsh_topk(corpus, queries, k=2, n_planes=2, n_tables=4).collect()
    assert {r["query_id"] for r in out} == {1}
    assert all(r["vec_id"] != 99 and r["cosine_sim"] is not None for r in out)


def test_ivf_zero_and_null_vectors_filtered_not_crashing(spark):
    """Zero-magnitude corpus vectors used to kill KMeans.fit with
    NOT_NULL_ASSERT_VIOLATION (unit-normalize yields an all-NULL array)."""
    rows = [(50, [0.0, 0.0]), (51, None)] + [
        (i, [float(i % 7 + 1), float(i % 3)]) for i in range(20)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    out = ivf_topk(corpus, queries, k=3, nlist=2, nprobe=2).collect()
    assert len(out) == 3
    assert all(r["vec_id"] not in (50, 51) for r in out)


def test_cosine_topk_matmul_empty_and_null_envelope(spark):
    """Empty query sets and NULL vectors must behave identically across
    the two strategies (matmul used to crash on both)."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    empty_q = spark.createDataFrame([], "query_id long, query_vec array<double>")
    for strat in ("expr", "matmul"):
        assert cosine_topk(corpus, empty_q, k=5, strategy=strat).count() == 0
    q = spark.createDataFrame(
        [(9, [1.0, 0.0]), (8, None)], "query_id long, query_vec array<double>"
    )
    got = {
        strat: sorted(
            (r["query_id"], r["vec_id"], r["cosine_sim"])
            for r in cosine_topk(corpus, q, k=5, strategy=strat).collect()
        )
        for strat in ("expr", "matmul")
    }
    assert got["expr"] == got["matmul"]
    assert all(qid == 9 and vid != 2 for qid, vid, _ in got["expr"])


def test_cosine_topk_string_ids_round_trip(spark):
    """String/UUID ids must round-trip through BOTH strategies with the
    input types preserved (the matmul kernel used to hard-code BIGINT
    ids — VERDICT r5 watch item 1). Also pins the empty-query early
    return to the derived schema so it unions with live results."""
    corpus = spark.createDataFrame(
        [
            ("doc-a", [1.0, 0.0]),
            ("doc-b", [0.9, 0.1]),
            ("doc-c", [0.0, 1.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("q-1", [1.0, 0.0])], "query_id string, query_vec array<double>"
    )
    results = {}
    for strat in ("expr", "matmul"):
        out = cosine_topk(corpus, q, k=2, strategy=strat)
        assert dict(out.dtypes)["query_id"] == "string"
        assert dict(out.dtypes)["vec_id"] == "string"
        results[strat] = sorted(
            (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
            for r in out.collect()
        )
    assert results["expr"] == results["matmul"]
    assert [r[1] for r in sorted(results["matmul"], key=lambda r: r[3])] == [
        "doc-a",
        "doc-b",
    ]
    # empty query set: derived schema, unions cleanly with live output
    empty_q = spark.createDataFrame(
        [], "query_id string, query_vec array<double>"
    )
    empty = cosine_topk(corpus, empty_q, k=2, strategy="matmul")
    assert dict(empty.dtypes)["vec_id"] == "string"
    assert empty.count() == 0


def test_pq_big_shortlist_contains_exact_topk(emb, queries):
    """With the shortlist as large as the corpus, PQ's exact rerank
    must reproduce the exact top-k (ADC only chooses the shortlist)."""
    from common_survey_data_pipeline_spark.operators.similarity import pq_topk

    n = emb.count()
    got = sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
        for r in pq_topk(emb, queries, k=10, shortlist=n).collect()
    )
    want = sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
        for r in cosine_topk(emb, queries, k=10).collect()
    )
    assert got == want


def test_pq_string_ids_round_trip(spark):
    from common_survey_data_pipeline_spark.operators.similarity import pq_topk

    corpus = spark.createDataFrame(
        [(f"doc-{i}", [float(i % 7), float((i * 3) % 5), 1.0, 0.5])
         for i in range(40)],
        "vec_id string, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("q-1", [1.0, 0.0, 1.0, 0.5])],
        "query_id string, query_vec array<double>",
    )
    out = pq_topk(corpus, q, k=3, m=2, ksub=4, shortlist=10, train_cap=40)
    assert dict(out.dtypes)["query_id"] == "string"
    assert dict(out.dtypes)["vec_id"] == "string"
    rows = out.collect()
    assert len(rows) == 3
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]


def test_pq_deterministic_across_partitionings(emb, queries):
    from common_survey_data_pipeline_spark.operators.similarity import pq_topk

    a = sorted(
        map(tuple, pq_topk(emb.repartition(1), queries, k=10).collect())
    )
    b = sorted(
        map(tuple, pq_topk(emb.repartition(7), queries, k=10).collect())
    )
    assert a == b


def test_ivfpq_full_probe_big_shortlist_is_exact(emb, queries):
    """nprobe=nlist + corpus-sized shortlist degrades IVF-PQ to the
    exact scan: pruning keeps every cell and the rerank sees every
    ADC candidate, so the output must equal cosine_topk exactly."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
    )

    n = emb.count()
    got = sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
        for r in ivfpq_topk(
            emb, queries, k=10, nlist=8, nprobe=8, m=16, ksub=64, shortlist=n
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
        for r in cosine_topk(emb, queries, k=10).collect()
    )
    assert got == want


def test_ivfpq_recall_rises_with_nprobe(emb, queries, exact):
    """Cell pruning is the recall dial: probing more cells can only
    add candidates, so recall must be monotone in nprobe (and near 1.0
    at nprobe=nlist)."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
    )

    def rec(nprobe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivfpq_topk(
                emb, queries, k=10, nlist=16, nprobe=nprobe,
                m=16, ksub=64, shortlist=200,
            ).collect()
        }
        return len(got & exact) / len(exact)

    lo, hi = rec(2), rec(16)
    assert lo <= hi
    assert hi >= 0.95


def test_ivfpq_string_ids_round_trip(spark):
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
    )

    corpus = spark.createDataFrame(
        [(f"doc-{i}", [float(i % 7), float((i * 3) % 5), 1.0, 0.5])
         for i in range(40)],
        "vec_id string, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("q-1", [1.0, 0.0, 1.0, 0.5])],
        "query_id string, query_vec array<double>",
    )
    out = ivfpq_topk(
        corpus, q, k=3, nlist=4, nprobe=4, m=2, ksub=4,
        shortlist=10, train_cap=40,
    )
    assert dict(out.dtypes)["query_id"] == "string"
    assert dict(out.dtypes)["vec_id"] == "string"
    rows = out.collect()
    assert len(rows) == 3
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]


def test_ivfpq_deterministic_across_partitionings(emb, queries):
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
    )

    a = sorted(
        map(tuple, ivfpq_topk(emb.repartition(1), queries, k=10,
                              nprobe=16).collect())
    )
    b = sorted(
        map(tuple, ivfpq_topk(emb.repartition(7), queries, k=10,
                              nprobe=16).collect())
    )
    assert a == b


def test_ivfpq_empty_envelope(spark):
    """Empty corpus and empty query set both return the typed empty
    frame instead of crashing in np.stack (repo-wide empty-input
    contract)."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
    )

    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.5, 0.5])],
        "vec_id string, embedding array<double>",
    )
    empty_c = spark.createDataFrame([], "vec_id string, embedding array<double>")
    q = spark.createDataFrame(
        [("q", [1.0, 0.0])], "query_id string, query_vec array<double>"
    )
    empty_q = spark.createDataFrame(
        [], "query_id string, query_vec array<double>"
    )
    for out in (
        ivfpq_topk(empty_c, q, k=2, nlist=2, nprobe=2, m=1, ksub=2),
        ivfpq_topk(corpus, empty_q, k=2, nlist=2, nprobe=2, m=1, ksub=2),
    ):
        assert out.count() == 0
        assert dict(out.dtypes)["vec_id"] == "string"


def test_pq_empty_corpus_and_bad_m_envelope(spark):
    """pq_topk honors the repo-wide empty-input contract (typed empty
    frame, no driver-side np.stack crash) and both PQ paths reject an
    m that does not divide the embedding dimension instead of
    silently truncating codes."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
    )

    empty_c = spark.createDataFrame([], "vec_id string, embedding array<double>")
    q = spark.createDataFrame(
        [("q", [1.0, 0.0, 0.5, 0.25])],
        "query_id string, query_vec array<double>",
    )
    out = pq_topk(empty_c, q, k=2, m=2, ksub=4)
    assert out.count() == 0
    assert dict(out.dtypes)["vec_id"] == "string"
    corpus = spark.createDataFrame(
        [(f"d{i}", [float(i), 1.0, 0.5, 0.25]) for i in range(10)],
        "vec_id string, embedding array<double>",
    )
    with pytest.raises(ValueError, match="must divide"):
        pq_topk(corpus, q, k=2, m=3, ksub=4).count()
    with pytest.raises(ValueError, match="must divide"):
        ivfpq_topk(corpus, q, k=2, nlist=2, nprobe=2, m=3, ksub=4).count()


def test_pq_train_codebooks_matches_masked_mean_reference():
    """ADVICE r10: the r10 Lloyd rewrite (argmax of x·c − ½||c||² +
    bincount centroid sums) must keep ASSIGNMENT parity with the
    classic argmin-of-d² / masked-mean form it replaced — near-tie
    resolution or compounding float drift would silently shift PQ
    codes and ANN shortlists. Seeded sample → deterministic: this
    pins the parity instead of assuming ulp-robustness."""
    import numpy as np

    from common_survey_data_pipeline_spark.operators.similarity import (
        _pq_train_codebooks,
    )

    def ref_train(sample, m, ksub, seed, iters=12):
        # the pre-r10 expression, verbatim shape: full (n, ksub)
        # squared distances, argmin, per-cluster masked means
        rng = np.random.default_rng(seed)
        n, _d = sample.shape
        dsub = _d // m
        books = np.zeros((m, ksub, dsub), dtype=np.float64)
        for j in range(m):
            x = sample[:, j * dsub : (j + 1) * dsub]
            cents = x[rng.choice(n, size=min(ksub, n), replace=False)].copy()
            if len(cents) < ksub:
                cents = np.tile(cents, (-(-ksub // len(cents)), 1))[:ksub]
            for _ in range(iters):
                d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(2)
                assign = d2.argmin(1)
                for c in range(ksub):
                    mask = assign == c
                    if mask.any():
                        cents[c] = x[mask].mean(0)
            books[j] = cents
        return books

    rng = np.random.default_rng(7)
    for m, ksub, n, d in [(4, 16, 512, 16), (2, 8, 300, 8), (1, 32, 64, 6)]:
        sample = rng.standard_normal((n, d))
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        new = _pq_train_codebooks(sample, m, ksub, seed=43)
        ref = ref_train(sample, m, ksub, seed=43)
        # codebooks agree to float noise...
        assert np.allclose(new, ref, atol=1e-8), (m, ksub)
        # ...and induce IDENTICAL final assignments (the contract the
        # PQ codes and every ANN shortlist actually depend on)
        dsub = d // m
        for j in range(m):
            x = sample[:, j * dsub : (j + 1) * dsub]
            a_new = (
                ((x[:, None, :] - new[j][None, :, :]) ** 2).sum(2).argmin(1)
            )
            a_ref = (
                ((x[:, None, :] - ref[j][None, :, :]) ** 2).sum(2).argmin(1)
            )
            assert (a_new == a_ref).all(), (m, ksub, j)
