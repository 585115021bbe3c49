"""The SQL API surface: registered views + spark.sql produce the same
results (and plans) as the DataFrame operators."""

from __future__ import annotations

import pytest

from common_survey_data_pipeline_spark.sources.tables import register_views
from common_survey_data_pipeline_spark.workload import REGISTRY


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


def test_sql_join_agg(spark):
    out = spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n, round(sum(o.o_totalprice), 2) AS total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )
    rows = out.collect()
    assert len(rows) == 5
    assert sum(r["n"] for r in rows) == spark.table("orders").count()


def test_sql_matches_dataframe_query(spark, sf_dir):
    df_result = REGISTRY["a2_distinct_summary"].fn(spark, sf_dir)
    sql_result = spark.sql(
        """
        SELECT l_returnflag,
               count(DISTINCT l_linestatus) AS n_status,
               min(l_linestatus) AS min_status,
               max(l_linestatus) AS max_status
        FROM lineitem GROUP BY l_returnflag
        """
    )
    assert sorted(map(tuple, df_result.collect())) == sorted(
        map(tuple, sql_result.collect())
    )


def test_sql_window_and_qualify_style(spark):
    out = spark.sql(
        """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC,
                                    o_orderkey) AS rk
          FROM orders) WHERE rk = 1
        """
    )
    assert out.count() == spark.sql("SELECT count(DISTINCT o_custkey) FROM orders").first()[0]
