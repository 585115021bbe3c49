"""Distributed clustering over embedding columns.

The reference (`/root/reference/varinfo-update.R`) has no vector
operators at all; this module is part of the engine's large-scale
training-data extension surface (SURVEY.md §2.10): corpus
diversification / topic balancing runs k-means over document
embeddings, then samples per cluster.

Architecture (the only shape that survives 100 TB):

* centroids live on the DRIVER (k × dim floats — a few MB even at
  k=64k) and are baked into a closed-form ``array`` expression;
* assignment is a NARROW map: per row, argmin over k squared-L2
  distances computed JVM-side with ``zip_with``/``aggregate`` higher-
  order functions — no UDF, no crossJoin row explosion, no shuffle.
  Literal baking is the right call up to a few hundred centroids
  (beyond that the expression tree bloats codegen — switch the same
  argmin to an Arrow ``mapInPandas`` over a numpy centroid matrix in a
  broadcast variable; the shuffle count stays zero either way);
* the update step is one map-side-partial aggregation per iteration
  (sum vector + count per cluster), i.e. Lloyd's algorithm costs
  exactly ``iters`` shuffles of k×dim bytes each.

All element arithmetic is done in DOUBLE with a left-to-right
sequential sum so the oracle (DuckDB ``list_sum(list_transform(...))``)
is bit-identical — ties in the argmin then break identically on the
smallest centroid id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance between two float-array columns, computed in
    double with a sequential (index-order) sum — cross-engine exact."""
    return F.aggregate(
        F.zip_with(
            a.cast("array<double>"),
            b.cast("array<double>"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``cluster_id`` (argmin squared-L2, ties → smallest id) and
    ``sq_dist`` to every row. Narrow map — zero shuffles; the centroid
    list is baked into the plan as literals (the Spark equivalent of a
    broadcast variable for closed-form expressions)."""
    if not centroids:
        raise ValueError("assign_clusters needs at least one centroid")
    vec = F.col(vec_col)
    candidates = F.array(
        *[
            F.struct(
                sq_l2(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias(
                    "sq_dist"
                ),
                F.lit(int(cid)).alias("cluster_id"),
            )
            for cid, cvec in centroids
        ]
    )
    best = F.array_min(candidates)
    return df.withColumn("cluster_id", best["cluster_id"]).withColumn(
        "sq_dist", best["sq_dist"]
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 5,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means: deterministic init (the k rows with the smallest
    ``id_col``), then ``max_iter`` assign/update rounds.

    Per iteration: one narrow assignment pass + ONE aggregation that
    reduces to k rows of (count, sum-vector) via map-side partials —
    the network moves k×dim doubles per partition, never the data.
    Empty clusters keep their previous centroid."""
    centroids = [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in df.orderBy(id_col).limit(k).collect()
    ]
    dim = len(centroids[0][1])
    for _ in range(max_iter):
        assigned = assign_clusters(df, centroids, vec_col)
        rows = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        updated = dict(centroids)
        for r in rows:
            updated[r["cluster_id"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        centroids = sorted(updated.items())
    return centroids
