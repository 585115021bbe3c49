"""skyline_2d: dominance semantics vs a brute-force model, duplicate
and null handling, and the local-frontier reduction invariant."""

import pandas as pd

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.skyline import (
    _frontier_pairs,
    skyline_2d,
)


def _brute_skyline(rows):
    """Model: keep (x, y) iff no other row strictly dominates it."""
    out = []
    for i, (x, y) in enumerate(rows):
        dominated = any(
            bx <= x and by >= y and (bx < x or by > y)
            for j, (bx, by) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _run(spark, rows, partitions=3):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)], "id long, x double, y long"
    ).repartition(partitions)
    got = skyline_2d(df, "x", "y").collect()
    return sorted((r["x"], r["y"]) for r in got)


def test_matches_brute_force(spark):
    rows = [
        (10.0, 5), (9.0, 4), (9.0, 6), (12.0, 9), (12.0, 2),
        (8.0, 1), (15.0, 10), (15.0, 9), (7.5, 0), (11.0, 6),
    ]
    assert _run(spark, rows) == _brute_skyline(rows)


def test_exact_duplicates_all_kept(spark):
    # two copies of a frontier point: neither dominates the other
    rows = [(1.0, 5), (1.0, 5), (2.0, 6)]
    got = _run(spark, rows)
    assert got == [(1.0, 5), (1.0, 5), (2.0, 6)]


def test_same_x_smaller_y_dominated(spark):
    rows = [(1.0, 5), (1.0, 4)]
    assert _run(spark, rows) == [(1.0, 5)]


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, None, 9), (3, 0.5, None)],
        "id long, x double, y long",
    )
    got = skyline_2d(df, "x", "y").collect()
    assert [(r["x"], r["y"]) for r in got] == [(1.0, 5)]


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, x double, y long")
    assert skyline_2d(df, "x", "y").collect() == []


def test_local_frontier_never_loses_global_points(spark):
    # every global-frontier point must survive partition-local pruning
    # regardless of which partition it lands in — exercise several
    # partition counts over the same data
    rows = [(float(x), (37 * x) % 50) for x in range(200)]
    want = _brute_skyline(rows)
    for p in (1, 2, 7):
        assert _run(spark, rows, partitions=p) == want


def test_frontier_pairs_model():
    pdf = pd.DataFrame({"x": [1.0, 1.0, 2.0, 3.0], "y": [4, 7, 7, 9]})
    out = _frontier_pairs(pdf)
    # (1,4) loses to (1,7); (2,7) loses to (1,7); (3,9) survives
    assert sorted(map(tuple, out.values)) == [(1.0, 7), (3.0, 9)]
