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
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias(
            "n_wedges"
        ),
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
