"""k-means over the embedding column (`operators/clustering.py`):
assignment correctness vs numpy, the zero-shuffle narrow-map plan
contract, and Lloyd-iteration inertia monotonicity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)
from common_survey_data_pipeline_spark.plans.asserts import plan_of
from common_survey_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def centroids(emb):
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 8).collect()
    ]


def test_assignment_matches_numpy(emb, centroids):
    got = {
        r["vec_id"]: (r["cluster_id"], r["sq_dist"])
        for r in assign_clusters(emb, centroids).collect()
    }
    C = np.array([v for _, v in centroids], dtype=np.float64)
    cids = np.array([cid for cid, _ in centroids])
    for r in emb.limit(200).collect():
        x = np.array(r["embedding"], dtype=np.float64)
        d = ((C - x) ** 2).sum(axis=1)
        want = cids[int(np.argmin(d))]  # unique argmin in real data
        cid, sq = got[r["vec_id"]]
        assert cid == want
        assert sq == pytest.approx(d.min(), rel=1e-9)


def test_assignment_is_narrow(emb, centroids):
    # the whole point: centroid literals → no shuffle, no join, no UDF
    plan = plan_of(assign_clusters(emb, centroids))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "PythonUDF" not in plan


def test_every_row_assigned_once(emb, centroids):
    out = assign_clusters(emb, centroids)
    assert out.count() == emb.count()
    assert out.where(F.col("cluster_id").isNull()).count() == 0
    k_seen = out.select("cluster_id").distinct().count()
    assert k_seen <= len(centroids)


def test_empty_centroid_list_rejected(emb):
    with pytest.raises(ValueError, match="at least one centroid"):
        assign_clusters(emb, [])


def _inertia(emb, centroids) -> float:
    return (
        assign_clusters(emb, centroids)
        .agg(F.sum("sq_dist").alias("s"))
        .collect()[0]["s"]
    )


def test_lloyd_inertia_monotone(emb):
    init = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    prev = _inertia(emb, init)
    for iters in (1, 3):
        fitted = kmeans_fit(emb, k=4, max_iter=iters)
        cur = _inertia(emb, fitted)
        assert cur <= prev + 1e-9
        prev = cur
    assert len(fitted) == 4
