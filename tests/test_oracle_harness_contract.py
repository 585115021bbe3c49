"""The local harness must fail on exactly the divergence classes the
driver's representation hash fails on — round 4's lesson: the old
numeric comparator was blind to −0.0 vs +0.0, so every local sweep of
`user_value_trend` was green while the driver's row was red.

These tests run WITHOUT Spark: `compare()` only needs `.toPandas()`
on its first argument, so a stub stands in for the DataFrame, and
DuckDB literal SELECTs stand in for the oracle.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.oracle_harness import _canon_cell, _canon_rows, compare


class _FakeSparkDF:
    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_signed_zero_pair_fails(con):
    """−0.0 (DuckDB round of a tiny negative) vs +0.0 (Spark F.round
    via BigDecimal) must FAIL: the driver hashes '-0.0' != '0.0'."""
    spark_side = _FakeSparkDF(pd.DataFrame({"slope": [0.0]}))
    res = compare(spark_side, con, "SELECT round(-2.86e-08, 6) AS slope")
    assert not res["match"], "harness must reject a -0.0/+0.0 pair"
    # and the documented contract fix (+ 0) makes the same pair green
    res = compare(spark_side, con, "SELECT round(-2.86e-08, 6) + 0 AS slope")
    assert res["match"]


def test_float32_vs_float64_fails():
    """A float32 result column vs the oracle's float64 of the same
    nominal value diverges in its exact decimal expansion."""
    a = _canon_rows(pd.DataFrame({"v": np.array([1.1], dtype=np.float32)}))
    b = _canon_rows(pd.DataFrame({"v": np.array([1.1], dtype=np.float64)}))
    assert a != b


def test_datetime_precision_fails(con):
    spark_side = _FakeSparkDF(
        pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 00:00:00.123")]})
    )
    ok = compare(spark_side, con, "SELECT TIMESTAMP '2024-01-01 00:00:00.123' AS ts")
    assert ok["match"]
    bad = compare(
        spark_side, con, "SELECT TIMESTAMP '2024-01-01 00:00:00.123456' AS ts"
    )
    assert not bad["match"]


def test_date_equals_midnight_timestamp_column(con):
    """A Spark DATE column and the oracle's all-midnight TIMESTAMP
    column hash equal (the driver's pandas formatting prints both
    date-only) — but a mixed-time column keeps full timestamps."""
    import datetime

    spark_side = _FakeSparkDF(
        pd.DataFrame({"d": [datetime.date(1996, 9, 16)]})
    )
    assert compare(spark_side, con, "SELECT TIMESTAMP '1996-09-16' AS d")[
        "match"
    ]
    mixed = _FakeSparkDF(
        pd.DataFrame(
            {
                "d": [
                    pd.Timestamp("1996-09-16 00:00:00"),
                    pd.Timestamp("1996-09-16 12:00:00"),
                ]
            }
        )
    )
    res = compare(
        mixed,
        con,
        "SELECT * FROM (VALUES (TIMESTAMP '1996-09-16'),"
        " (TIMESTAMP '1996-09-16 12:00:00')) t(d)",
    )
    assert res["match"]


def test_same_float_different_source_notation_matches(con):
    """1e-07 vs 0.0000001 are the SAME double — notation in the SQL
    text must not matter once values are canonicalized."""
    spark_side = _FakeSparkDF(pd.DataFrame({"v": [1e-07]}))
    assert compare(spark_side, con, "SELECT 0.0000001::DOUBLE AS v")["match"]


def test_nan_and_null_unify(con):
    """Spark's toPandas surfaces SQL NULL doubles as NaN; DuckDB NULL
    must compare equal to it."""
    spark_side = _FakeSparkDF(pd.DataFrame({"v": [float("nan")]}))
    assert compare(spark_side, con, "SELECT NULL::DOUBLE AS v")["match"]


def test_order_insensitive(con):
    spark_side = _FakeSparkDF(pd.DataFrame({"k": [2, 1], "v": [20.0, 10.0]}))
    sql = "SELECT * FROM (VALUES (1, 10.0::DOUBLE), (2, 20.0::DOUBLE)) t(k, v)"
    assert compare(spark_side, con, sql)["match"]


def test_canon_cell_representation_forms():
    assert _canon_cell(-0.0) == "-0.0"
    assert _canon_cell(0.0) == "0.0"
    assert _canon_cell(None) == "null"
    assert _canon_cell(float("nan")) == "null"
    assert _canon_cell(np.float64(1e-07)) == "1e-07"
    assert _canon_cell(True) == "true"
    assert _canon_cell(np.int64(5)) == "5"
    assert _canon_cell([1.0, -0.0, None]) == "[1.0,-0.0,null]"
    assert _canon_cell(b"\x00\xff") == "00ff"
