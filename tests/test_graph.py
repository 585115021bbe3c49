"""Property tests for operators/graph.py::triangle_stats.

The degree-ordered orientation must count exactly the same triangles
as a brute-force enumeration — on graphs engineered to stress the
orientation logic (ties in degree, hubs, disconnected pieces) and on
seeded random graphs.
"""

from itertools import combinations

import pytest

from common_survey_data_pipeline_spark.operators.graph import triangle_stats


def _brute(edges):
    """(n_nodes, n_edges, n_wedges, n_triangles) by enumeration."""
    nodes = sorted({v for e in edges for v in e})
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    tris = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    return len(nodes), len(edges), wedges, tris


def _spark_stats(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a long, b long"
    )
    row = triangle_stats(df).collect()[0]
    return (
        row["n_nodes"],
        row["n_edges"],
        row["n_wedges"],
        row["n_triangles"],
    )


def _rand_graph(seed, n, p):
    """Seeded Erdos-Renyi G(n, p) as a < b edge tuples."""
    import random

    rng = random.Random(seed)
    return [
        (a, b) for a, b in combinations(range(n), 2) if rng.random() < p
    ]


CASES = {
    "triangle": [(1, 2), (2, 3), (1, 3)],
    "k4": [(a, b) for a, b in combinations(range(4), 2)],
    "k5_minus_edge": [
        (a, b) for a, b in combinations(range(5), 2) if (a, b) != (0, 1)
    ],
    # path/star: wedges but zero triangles
    "path": [(i, i + 1) for i in range(6)],
    "star": [(0, i) for i in range(1, 8)],
    # two disconnected triangles sharing no nodes + an isolated edge
    "disconnected": [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
    # bowtie: two triangles sharing one node (degree-tie stress: the
    # shared node has degree 4, all others 2)
    "bowtie": [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)],
    # uniform degree: every node degree 2 (cycle) — orientation must
    # fall back to the id tiebreak everywhere
    "cycle": [(i, (i + 1) % 7 if (i + 1) % 7 > i else i) for i in range(6)]
    + [(0, 6)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_triangles_match_bruteforce_constructed(spark, name):
    edges = sorted({(min(a, b), max(a, b)) for a, b in CASES[name]})
    assert _spark_stats(spark, edges) == _brute(edges)


@pytest.mark.parametrize("seed,n,p", [(7, 12, 0.4), (42, 16, 0.25), (99, 10, 0.7)])
def test_triangles_match_bruteforce_random(spark, seed, n, p):
    edges = _rand_graph(seed, n, p)
    assert _spark_stats(spark, edges) == _brute(edges)


def test_clustering_coefficient_wedge_free(spark):
    # a single edge has no wedges: coefficient must be 0.0, not NULL
    row = triangle_stats(
        spark.createDataFrame([(1, 2)], "a long, b long")
    ).collect()[0]
    assert row["n_wedges"] == 0
    assert row["clustering_coeff"] == 0.0


def test_pagerank_converges_to_power_iteration_model(spark):
    """Iterative PageRank matches a dense NumPy power iteration on a
    small directed graph (every node has out-degree >= 1)."""
    import numpy as np

    from common_survey_data_pipeline_spark.operators.graph import pagerank

    edges = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 0),
        (1, 3), (3, 1), (0, 2),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(df, tol=1e-10, max_iter=100).collect()
    }

    n = 4
    A = np.zeros((n, n))
    for s, d in edges:
        A[d, s] += 1.0
    out_deg = np.array([sum(1 for s, _ in edges if s == i) for i in range(n)])
    A = A / out_deg  # column-stochastic
    r = np.full(n, 1.0 / n)
    for _ in range(200):
        r = (1 - 0.85) / n + 0.85 * (A @ r)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-8


def test_pagerank_warns_on_max_iter_exhaustion(spark):
    import warnings as w

    from common_survey_data_pipeline_spark.operators.graph import pagerank

    # asymmetric graph: the uniform start vector is NOT the fixed point,
    # so one iteration cannot reach tol=1e-30
    df = spark.createDataFrame([(0, 1), (1, 0), (1, 2), (2, 1), (0, 2)], ["src", "dst"])
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        pagerank(df, tol=1e-30, max_iter=1).collect()
    assert any("pagerank" in str(c.message) for c in caught)


def test_pagerank_empty_edges_raises(spark):
    # ADVICE r3: empty input used to hit ZeroDivisionError at the 1/n
    # seed — it must be a clear contract error instead
    import pytest as pt

    from common_survey_data_pipeline_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    with pt.raises(ValueError, match="empty edge list"):
        pagerank(empty)


def test_pagerank_warning_survives_null_delta(spark):
    import warnings as w

    from common_survey_data_pipeline_spark.operators.graph import pagerank

    # pure source→sink bipartite graph: round 1 moves ALL rank mass to
    # sinks 2/3 (which have no out-degree), so the ranks↔new_ranks join
    # is empty and delta is NULL — the exhaustion warning used to
    # TypeError on `{None:.2e}` for exactly this out-of-contract shape
    df = spark.createDataFrame([(0, 2), (1, 3)], ["src", "dst"])
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        pagerank(df, tol=1e-30, max_iter=2).collect()
    msgs = [str(c.message) for c in caught if "pagerank" in str(c.message)]
    assert msgs and "undefined" in msgs[0]


def test_triangle_stats_empty_graph_zeroes(spark):
    """Empty edge list: every stat 0 and clustering_coeff 0.0, never
    NULL (regression: sum() over the empty degree table nulled
    n_wedges and the NULL==0 guard missed)."""
    empty = spark.createDataFrame([], "a long, b long")
    row = triangle_stats(empty).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_wedges"],
            row["n_triangles"]) == (0, 0, 0, 0)
    assert row["clustering_coeff"] == 0.0
