"""Misra–Gries heavy-hitter sketch: exactness vs the naive plan, the
union guarantee, and edge cases."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.sketches import (
    _mg_reduce,
    heavy_hitter_tokens,
    misra_gries_candidates,
)


def _tokens_df(spark, words, partitions=4):
    return spark.createDataFrame(
        [(w,) for w in words], "token string"
    ).repartition(partitions)


def _total_df(spark, n):
    return spark.range(1).select(F.lit(n).cast("long").alias("total"))


def test_heavy_hitters_match_naive_groupby(spark):
    # skewed vocab: token_i appears i^2 times — a clear frequency head
    words = [f"t{i}" for i in range(1, 40) for _ in range(i * i)]
    df = _tokens_df(spark, words)
    n = len(words)
    k = 25
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitter_tokens(df, _total_df(spark, n), k=k).collect()
    }
    exact = {
        r["token"]: r["n"]
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") * k > n)
        .collect()
    }
    assert got == exact and got  # identical AND non-trivial


def test_union_guarantee_over_many_partitions(spark):
    # one token holding exactly > N/(k+1) mass, scattered across
    # partitions so no single partition is dominated by it
    filler = [f"f{i}" for i in range(900)]
    words = filler + ["hot"] * 100  # N=1000, freq(hot)=0.1
    df = _tokens_df(spark, words, partitions=8)
    k = 12  # N/(k+1) ≈ 77 < 100
    cands = {
        r["token"] for r in misra_gries_candidates(df, k=k).collect()
    }
    assert "hot" in cands
    got = heavy_hitter_tokens(df, _total_df(spark, len(words)), k=k).collect()
    assert {r["token"] for r in got} == {"hot"}
    assert got[0]["cnt"] == 100  # exact, not the MG lower bound


def test_candidate_set_is_bounded(spark):
    # uniform vocabulary: no heavy hitters; summary stays ≤ k/partition
    words = [f"u{i}" for i in range(2000)]
    df = _tokens_df(spark, words, partitions=4)
    cands = misra_gries_candidates(df, k=16).collect()
    assert len(cands) <= 16 * 4
    out = heavy_hitter_tokens(df, _total_df(spark, len(words)), k=16).collect()
    assert out == []


def test_empty_input(spark):
    df = spark.createDataFrame([], "token string")
    assert misra_gries_candidates(df, k=8).collect() == []
    assert heavy_hitter_tokens(df, _total_df(spark, 0), k=8).collect() == []


def test_mg_reduce_properties():
    s = pd.Series({"a": 100, "b": 50, "c": 10, "d": 5, "e": 1})
    r = _mg_reduce(s, 2)
    # (k+1)-th largest = 10 subtracted from all, non-positive dropped
    assert r.to_dict() == {"a": 90, "b": 40}
    # already small: untouched
    assert _mg_reduce(s, 5).to_dict() == s.to_dict()


@pytest.mark.parametrize("k", [5, 50])
def test_weights_are_lower_bounds(spark, k):
    words = [f"t{i}" for i in range(1, 20) for _ in range(i * 3)]
    df = _tokens_df(spark, words, partitions=2)
    exact = {
        r["token"]: r["n"]
        for r in df.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in misra_gries_candidates(df, k=k).collect():
        assert 0 < r["weight"] <= exact[r["token"]]
