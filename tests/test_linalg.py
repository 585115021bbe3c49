"""embedding_covariance: agreement with numpy, partition invariance,
degenerate inputs."""

import numpy as np

from common_survey_data_pipeline_spark.operators.linalg import (
    embedding_covariance,
)


def _df(spark, x, partitions=3):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(partitions)


def test_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 5))
    want = np.cov(x, rowvar=False, ddof=1)
    for p in (1, 4):
        got = embedding_covariance(_df(spark, x, p)).collect()
        assert len(got) == 5 * 6 // 2
        for r in got:
            # contract = covariance of 1e-6-QUANTIZED elements (exact
            # integer arithmetic, bit-stable across engines): differs
            # from the float covariance by ≲ 2e-6·E|x| (~2e-6 for
            # N(0,1) data) on top of the 6-decimal output round
            assert abs(r["cov"] - round(want[r["i"] - 1, r["j"] - 1], 6)) <= 5e-6


def test_null_vectors_excluded(spark):
    x = np.arange(12.0).reshape(4, 3)
    rows = [
        (0, [float(v) for v in x[0]]),
        (1, None),
        (2, [float(v) for v in x[2]]),
        (3, [float(v) for v in x[3]]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(2)
    want = np.cov(x[[0, 2, 3]], rowvar=False, ddof=1)
    got = embedding_covariance(df).collect()
    assert len(got) == 6
    for r in got:
        assert abs(r["cov"] - round(want[r["i"] - 1, r["j"] - 1], 6)) <= 1e-6


def test_too_few_rows_is_empty(spark):
    # n == ddof → covariance undefined → empty, not a division error
    assert embedding_covariance(_df(spark, np.ones((1, 3)))).collect() == []
    assert embedding_covariance(
        spark.createDataFrame([], "vec_id long, embedding array<double>")
    ).collect() == []


def test_no_negative_zero(spark):
    # constant columns give cov exactly 0; sign must be normalized
    x = np.ones((5, 3))
    got = embedding_covariance(_df(spark, x)).collect()
    assert all(str(r["cov"]) == "0.0" for r in got)


def test_input_domain_guard_is_loud(spark):
    # elements past the exact-int64 Gram bound must raise, not wrap
    # silently into garbage (numpy int64 matmul has no overflow check)
    import pytest

    x = np.full((4, 3), 3.0e4)
    with pytest.raises(Exception, match="int64 Gram"):
        embedding_covariance(_df(spark, x)).collect()
