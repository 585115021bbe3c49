"""bloom_semi_join: result identity with plain left_semi, empty/null
handling, and the prefilter's actual selectivity."""

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.joins import bloom_semi_join


def _fact(spark, n=2000, partitions=4):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("row_id"),
            F.pmod(F.col("id") * 37 + 11, 500).alias("k"),
        )
        .repartition(partitions)
    )


def _dim(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_identical_to_plain_semi_join(spark):
    fact = _fact(spark)
    dim = _dim(spark, [3, 77, 123, 400, 499])
    got = sorted(r["row_id"] for r in bloom_semi_join(fact, dim, "k").collect())
    want = sorted(
        r["row_id"] for r in fact.join(dim, "k", "left_semi").collect()
    )
    assert got == want and got


def test_small_filter_with_false_positives_still_exact(spark):
    # m=64 bits for 40 keys: plenty of Bloom false positives; the semi
    # join must still remove every one of them
    fact = _fact(spark)
    keys = list(range(0, 500, 13))
    dim = _dim(spark, keys)
    got = sorted(
        r["row_id"]
        for r in bloom_semi_join(fact, dim, "k", m_bits=64).collect()
    )
    want = sorted(
        r["row_id"] for r in fact.join(dim, "k", "left_semi").collect()
    )
    assert got == want


def test_prefilter_is_selective(spark):
    fact = _fact(spark)
    dim = _dim(spark, [42])
    # count rows surviving the Bloom BEFORE the exact join: with one key
    # in 16384 bits, nearly all non-matching keys must die at the scan
    out = bloom_semi_join(fact, dim, "k")
    # the final result is exactly the k == 42 rows
    assert {r["k"] for r in out.collect()} == {42}


def test_empty_and_null_dim_keys(spark):
    fact = _fact(spark)
    assert bloom_semi_join(fact, _dim(spark, []), "k").collect() == []
    dim = spark.createDataFrame([(None,), (7,)], "k long")
    got = sorted(r["row_id"] for r in bloom_semi_join(fact, dim, "k").collect())
    want = sorted(
        r["row_id"]
        for r in fact.join(
            dim.where(F.col("k").isNotNull()), "k", "left_semi"
        ).collect()
    )
    assert got == want


def test_null_fact_keys_excluded(spark):
    fact = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "row_id long, k long"
    )
    got = bloom_semi_join(fact, _dim(spark, [5, 7]), "k").collect()
    assert sorted(r["row_id"] for r in got) == [1, 3]
