"""Pytest replica of the driver's correctness gate: every oracle-backed
query in the registry hash-matches its DuckDB oracle at sf0.001.

The driver runs the same comparison at sf0.01; this in-suite version
uses the smallest tables so `pytest tests/` keeps guarding oracle
parity end-to-end without the multi-minute quadratic oracles. The few
queries whose ORACLE is quadratic in corpus size run here too — at
sf0.001 they are cheap.
"""

from __future__ import annotations

import pytest

from common_survey_data_pipeline_spark.workload import REGISTRY
from tests.oracle_harness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    res = compare(spec.fn(spark, SF_DIR), con, spec.oracle)
    assert res["match"], f"{name}: {res['detail'][:800]}"


@pytest.mark.parametrize(
    "name", sorted(n for n, s in REGISTRY.items() if s.oracle is None)
)
def test_rows_only_queries_execute(spark, name):
    # no SQL oracle (hash impls/hyperplanes DuckDB lacks) — still must
    # run and return a well-formed result
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
