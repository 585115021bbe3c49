"""Graph analytics over edge-list DataFrames.

The graph operators the registry exposes over the co-purchase part
graph (`pagerank_parts_2iter`, `triangle_count_strong_ties`) in a
reusable, table-agnostic form: a graph is just a DataFrame of edges,
and every algorithm below is a composition of equi-joins and
aggregations — no adjacency structures, no driver-side graph object, so
the shapes survive any edge-list size the cluster can shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    df: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    symmetric: bool = False,
) -> DataFrame:
    """Per-basket item co-occurrence pairs: collect_set per basket +
    double explode — ONE basket-keyed shuffle and a narrow explode (the
    equivalent self-join would shuffle both sides); fanout per basket is
    basket-size², bounded by basket size.

    ``symmetric=False`` yields each unordered pair once per basket
    (``a < b``); ``symmetric=True`` yields both directions (``a != b``)
    — the edge-list form pagerank consumes. Output (a, b), one row per
    (basket, pair): aggregate by (a, b) for co-occurrence counts.

    This is THE basket-pair kernel — pagerank, the triangle census and
    association rules all build their edges here, so the semantics (and
    any future hot-basket salting) live in one place instead of three
    drifting copies.
    """
    baskets = df.groupBy(basket_col).agg(
        F.collect_set(item_col).alias("__ps")
    )
    pairs = baskets.select(F.explode("__ps").alias("a"), "__ps").select(
        "a", F.explode("__ps").alias("b")
    )
    cond = (
        F.col("a") != F.col("b") if symmetric else F.col("a") < F.col("b")
    )
    return pairs.where(cond)


def triangle_stats(
    und: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Global triangle census of an UNDIRECTED simple graph given as
    unique ``a < b`` edge rows: one row ``(n_nodes, n_edges, n_wedges,
    n_triangles, clustering_coeff)`` where ``clustering_coeff`` is the
    global (transitivity) coefficient ``3*triangles/wedges`` rounded to
    6, and 0.0 for wedge-free graphs.

    DEGREE-ORDERED orientation — the distributed triangle-counting
    algorithm: every edge is directed from its lower-``(degree, id)``
    endpoint to the higher, which makes the out-degree of any node at
    most ``sqrt(2m)``, so the wedge join generates O(m^1.5) candidate
    paths even with hub nodes, where the naive id-ordered wedge join is
    O(sum deg^2). Both the wedge join and the closing-edge probe are
    plain node-keyed equi-joins; the edge list is lazily checkpointed
    because it feeds the degree table, the orientation join, and the
    probe.
    """
    und = und.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint(eager=False)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    e = und.join(
        deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = (
        e1.join(e2, F.col("e1.u") == F.col("e2.u"))
        .where(
            (F.col("e1.dv") < F.col("e2.dv"))
            | (
                (F.col("e1.dv") == F.col("e2.dv"))
                & (F.col("e1.v") < F.col("e2.v"))
            )
        )
        .select(F.col("e1.v").alias("x"), F.col("e2.v").alias("y"))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    n_tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # coalesce: sum() over an EMPTY degree table (edge-less graph)
        # is NULL, which would null out n_wedges AND the coefficient
        # (NULL == 0 is NULL, so the wedge-free guard would miss)
        F.coalesce(
            F.sum(F.col("d") * (F.col("d") - 1) / 2), F.lit(0.0)
        ).cast("long").alias("n_wedges"),
    )
    return (
        node_stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Iterate-to-convergence PageRank over a directed edge list — the
    driver-loop form of the fixed-2-iteration oracle query
    (``workload.py::pagerank_parts_2iter``), stopping when the L1 rank
    delta falls under ``tol`` (or at ``max_iter``, with a warning —
    same honesty contract as ``dedup.py::neardup_clusters``).

    Output: (node, pagerank DOUBLE). Nodes with no out-edges are not
    rank sources here (the co-purchase graphs this engine builds are
    symmetric, so every node has out-degree ≥ 1); a general dangling-
    mass redistribution would add one 1-row aggregate per round.

    Scale shape per iteration — identical to the oracle query's:
    pre-divide rank by out-degree on the |V|-row node table, ONE
    src-keyed shuffle-hash join onto the |E|-row edge list (hash
    pinned: both sides are data-proportional, so neither an optimizer
    broadcast nor a merge sort of the edges survives 100×), one
    dst-keyed sum with map-side partials. Lineage is cut per round
    with ``localCheckpoint`` — O(rounds) plans would otherwise nest
    exponentially — and the L1 delta is one extra |V|-row aggregate.
    """
    import warnings

    # r10 (guide §2.4): hash-partition the edge list by src ONCE and
    # persist — persist, NOT localCheckpoint, because a checkpoint's
    # LogicalRDD drops outputPartitioning while InMemoryRelation keeps
    # it — so the degree aggregation and EVERY iteration's
    # contribution join reuse the layout; per round only the |V|-row
    # rank table moves, instead of re-exchanging |E| rows every
    # iteration. Partition count is size-derived (scaled_partitions;
    # on derived edge frames it degrades to the cluster-tuned
    # shuffle.partitions cap) because AQE never coalesces a cached
    # plan's output-determining exchange.
    from common_survey_data_pipeline_spark.sources.tables import (
        scaled_partitions,
    )

    n_part = scaled_partitions(edges)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(n_part, "src")
        .persist()
    )
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    n = deg.count()
    if n == 0:
        raise ValueError(
            "pagerank: empty edge list — no nodes to rank (the uniform "
            "1/n seed is undefined)"
        )
    ranks = deg.select("node", F.lit(1.0 / n).alias("r"))
    base = (1.0 - damping) / n
    for i in range(max_iter):
        rd = ranks.join(deg, "node").select(
            F.col("node").alias("src"), (F.col("r") / F.col("d")).alias("c")
        )
        contrib = e.join(rd.hint("shuffle_hash"), "src").select("dst", "c")
        new_ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg((F.lit(base) + F.lit(damping) * F.sum("c")).alias("r"))
            .localCheckpoint()
        )
        delta = (
            ranks.select("node", F.col("r").alias("r0"))
            .join(new_ranks, "node")
            .agg(F.sum(F.abs(F.col("r") - F.col("r0"))).alias("d1"))
            .collect()[0]["d1"]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    else:
        # delta is None when the ranks↔new_ranks join matched no nodes
        # (e.g. a bipartite source→sink graph, outside the symmetric-
        # graph contract) — sum() over zero rows is NULL. Format it
        # lazily so the honesty warning never raises on the exact
        # inputs it exists to flag.
        shown = f"{delta:.2e}" if delta is not None else "undefined (no node kept rank mass in consecutive rounds — input likely violates the symmetric-graph contract)"
        warnings.warn(
            f"pagerank: L1 delta still {shown} after {max_iter} "
            f"iterations (tol={tol:.0e}) — ranks may not have converged",
            RuntimeWarning,
            stacklevel=2,
        )
    # cache hygiene (ADVICE r10): the final ranks frame is an EAGER
    # localCheckpoint from the loop — it no longer references e/deg —
    # so the operator releases what it allocated instead of leaving
    # two cached tables registered until a session-wide clearCache.
    e.unpersist()
    deg.unpersist()
    return ranks.select("node", F.col("r").alias("pagerank"))
