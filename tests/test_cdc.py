"""Unit tests for operators/cdc.py on hand-built snapshots."""

from __future__ import annotations

from common_survey_data_pipeline_spark.operators.cdc import (
    merge_upsert,
    snapshot_diff,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, val string, n double")


def test_merge_upsert_replaces_and_inserts(spark):
    base = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    updates = _snap(spark, [(2, "B", 20.0), (9, "new", 9.0)])
    out = {r["k"]: (r["val"], r["n"]) for r in merge_upsert(base, updates, ["k"]).collect()}
    assert out == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 9: ("new", 9.0)}


def test_snapshot_diff_ops_and_null_transitions(spark):
    old = _snap(
        spark,
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0), (5, "e", 5.0)],
    )
    new = _snap(
        spark,
        [
            (1, "a", 1.0),      # unchanged → no row
            (2, "B", 2.0),      # val changed → U
            (4, "d", 4.0),      # NULL → value → U (null-safe compare)
            (5, None, 5.0),     # value → NULL → U
            (6, "f", 6.0),      # inserted → I
        ],                      # 3 deleted → D
    )
    out = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"], ["val", "n"]).collect()}
    assert out == {2: "U", 3: "D", 4: "U", 5: "U", 6: "I"}
