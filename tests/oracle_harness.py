"""Local replica of the driver's t2 correctness gate: run each
workload query on Spark AND its DuckDB oracle, compare row-count,
schema (column names), and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.map(
                lambda x: None if x is None or (isinstance(x, float) and math.isnan(x))
                else round(float(x), 6)
            )
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.map(lambda x: None if x is None else str(x))
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(
        drop=True
    )
    return df


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
    a, b = _normalize(spark_pd), _normalize(oracle_pd)
    if a.equals(b):
        out["match"] = True
        return out
    neq = (a != b) & ~(a.isna() & b.isna())
    bad = neq.any(axis=1)
    out["detail"] = (
        f"{int(bad.sum())} differing rows; first:\nspark:\n"
        f"{a[bad].head(3)}\noracle:\n{b[bad].head(3)}"
    )
    return out
