"""Local replica of the driver's t2 correctness gate: run each
workload query on Spark AND its DuckDB oracle, compare row-count,
schema (column names), and an order-insensitive REPRESENTATION hash.

The representation point matters: the driver hashes the per-cell
string forms of both result sets, so two values that are numerically
equal but print differently (IEEE −0.0 vs +0.0, a float32 vs float64
widening, differing decimal scales) are a driver FAILURE. Round 4's
`user_value_trend` red row was exactly this class — DuckDB
`round(−2.86e-08, 6)` keeps the IEEE sign (−0.0) while Spark's
`F.round` goes through BigDecimal (+0.0); the old harness re-rounded
and compared numerically (−0.0 == 0.0), so every local sweep was
green while the driver's hash was red. This version canonicalizes
each cell to a string WITHOUT collapsing representation differences:
local OK ⇔ driver green, and a −0.0/+0.0 pair fails loudly
(pinned by tests/test_oracle_harness_contract.py).
"""

from __future__ import annotations

import os
from collections import Counter
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written tables (e.g. the generated sf1 set) are
            # DIRECTORIES of part files; DuckDB needs the glob form
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(x) -> str:
    """Canonical string form of one result cell, mirroring what the
    driver hashes. No numeric re-rounding, no sign collapsing — if two
    engines' representations differ, the canonical forms differ."""
    if x is None:
        return "null"
    # NaN/NaT of any flavor (float NaN, Decimal('NaN'), pd.NaT): both
    # engines surface SQL NULL doubles as NaN after .toPandas()/.df(),
    # so null and NaN must share one token
    try:
        if x != x:
            return "null"
    except (TypeError, ValueError):
        pass
    if isinstance(x, (bool, np.bool_)):
        return "true" if x else "false"
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    if isinstance(x, (float, np.floating)):
        # repr() of the Python float: '−0.0' stays '-0.0', float32
        # cells widen to their exact float64 value (so a float32-vs-
        # float64 contract divergence FAILS here, as it would at the
        # driver)
        return repr(float(x))
    if isinstance(x, pd.Timestamp):
        return str(x.floor("us") if x.nanosecond else x)
    if isinstance(x, datetime):
        return str(pd.Timestamp(x))
    if isinstance(x, date):
        return str(x)
    if isinstance(x, (bytes, bytearray)):
        return bytes(x).hex()
    if isinstance(x, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(v) for v in x) + "]"
    if isinstance(x, dict):
        items = sorted((str(k), _canon_cell(v)) for k, v in x.items())
        return "{" + ",".join(f"{k}:{v}" for k, v in items) + "}"
    return str(x)


def _canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: each row a tuple of canonical
    cell strings over name-sorted columns, rows sorted.

    Column-level DATE rule: a datetime column whose every non-null
    value is midnight formats as date-only. This mirrors the driver
    (pandas prints all-midnight datetime64 columns date-only), so a
    Spark DATE column hashes equal to the oracle's midnight TIMESTAMP
    column — the three date-typed registry queries have green driver
    rows with exactly this shape. A MIXED-time column keeps full
    timestamps for every cell, midnight ones included, on both sides.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            nonnull = s.dropna()
            if len(nonnull) and (nonnull.dt.normalize() == nonnull).all():
                df[c] = s.dt.strftime("%Y-%m-%d")
    rows = [
        tuple(_canon_cell(x) for x in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def compare(sdf, con, sql: str) -> dict:
    spark_pd = sdf.toPandas()
    oracle_pd = con.execute(sql).df()
    out = {
        "rows": (len(spark_pd), len(oracle_pd)),
        "cols": (sorted(spark_pd.columns), sorted(oracle_pd.columns)),
        "match": False,
        "detail": "",
    }
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        out["detail"] = "column mismatch"
        return out
    if len(spark_pd) != len(oracle_pd):
        out["detail"] = "row count mismatch"
        return out
    a, b = _canon_rows(spark_pd), _canon_rows(oracle_pd)
    if a == b:
        out["match"] = True
        return out
    # Diff as MULTISETS, not positional zip: with equal counts, one
    # extra/missing row early in sort order would misalign every
    # subsequent zip pair and print rows that are not each other's
    # counterpart. Rows unique to each side are the real divergence.
    cols = sorted(spark_pd.columns)
    ca, cb = Counter(a), Counter(b)
    only_spark = list((ca - cb).elements())
    only_oracle = list((cb - ca).elements())
    shown = "\n".join(
        [f"spark-only : {dict(zip(cols, r))}" for r in only_spark[:3]]
        + [f"oracle-only: {dict(zip(cols, r))}" for r in only_oracle[:3]]
    )
    out["detail"] = (
        f"{len(only_spark)} spark-only / {len(only_oracle)} oracle-only "
        f"canonical rows (of {len(a)}); first:\n" + shown
    )
    return out
