"""neardup_clusters (distributed min-label propagation) must equal a
driver-side union-find on the same pair list."""

from __future__ import annotations

import warnings

import pytest

from common_survey_data_pipeline_spark.operators.dedup import neardup_clusters


def _union_find_clusters(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find(spark):
    # two chains, one triangle, one isolated pair — incl. a long chain
    # that needs multiple propagation rounds
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
             (20, 21), (30, 31), (31, 32), (32, 33), (33, 34), (34, 35)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(df).collect()}
    want = _union_find_clusters(pairs)
    assert got == want


def test_clusters_warn_on_max_iter_exhaustion(spark):
    # a 12-node path has diameter 11; min-label propagation moves the
    # min one hop per round, so max_iter=3 CANNOT converge — the
    # operator must say so instead of silently returning split clusters
    pairs = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        neardup_clusters(df, max_iter=3).collect()


def test_clusters_converged_run_emits_no_warning(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_clusters_handle_reversed_edges(spark):
    pairs = [(5, 1), (2, 5), (9, 2)]  # all one cluster, min id = 1
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 5: 1, 9: 1}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_star_cc_equals_label_propagation(spark, seed):
    """large-star/small-star CC gives the identical (node -> min
    reachable id) labeling as the propagation kernel on random graphs."""
    import random

    from common_survey_data_pipeline_spark.operators.dedup import (
        connected_components_star,
        neardup_clusters,
    )

    rng = random.Random(seed)
    n = 30
    edges = list(
        {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(25)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in neardup_clusters(df, max_iter=50).collect()
    }
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components_star(df).collect()
    }
    assert got == want


def test_star_cc_collapses_deep_path_in_log_rounds(spark):
    """A 120-node chain has diameter 119 — label propagation needs ~119
    rounds; the star kernel must finish inside its default 25-round
    budget (actually ~log2(120)) with the whole chain in one cluster."""
    from common_survey_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], ["id_a", "id_b"]
    )
    import warnings as w

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        rows = connected_components_star(df).collect()
    assert not any("still changing" in str(c.message) for c in caught)
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 120
