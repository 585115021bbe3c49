"""The persisted-band-table incremental dedup path: the corpus band
table is written bucketed once, and every increment (a) recomputes zero
corpus signatures and (b) joins the corpus side with NO Exchange —
the write-once-shuffle-never contract of VERDICT r5 item 2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.dedup import (
    incremental_pairs_vs_band_table,
    minhash_band_keys,
    minhash_incremental_pairs,
)
from common_survey_data_pipeline_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)
from common_survey_data_pipeline_spark.sources.tables import load_table

TABLE = "band_corpus_test"


@pytest.fixture(scope="module")
def split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    write_bucketed(
        minhash_band_keys(corpus, "text", "doc_id"), TABLE, 8, "band_key"
    )
    yield corpus, batch
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_persisted_path_equals_recomputing_path(spark, split):
    corpus, batch = split
    persisted = sorted(
        map(
            tuple,
            incremental_pairs_vs_band_table(
                spark, TABLE, corpus, batch, "text", "doc_id"
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            minhash_incremental_pairs(
                corpus, batch, "text", "doc_id"
            ).collect(),
        )
    )
    spark.catalog.clearCache()
    assert persisted == recomputed
    assert len(persisted) > 0


def test_corpus_side_of_candidate_join_has_no_exchange(spark, split):
    corpus, batch = split
    # force the sort-merge path so bucketing (not broadcast) carries it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch_bands = minhash_band_keys(batch, "text", "doc_id").select(
            F.col("doc_id").alias("batch_id"), "band_key"
        )
        corpus_bands = read_bucketed(spark, TABLE)
        joined = batch_bands.join(corpus_bands, "band_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
        lines = plan.splitlines()
        # the corpus side reads bucket files raw: no Exchange may sit
        # between the join and the bucketed scan (the batch side's own
        # band-key shuffles are expected — they are O(batch))
        scan_idx = [
            i for i, l in enumerate(lines) if TABLE in l and "Scan" in l
        ]
        assert scan_idx, plan
        smj_idx = [i for i, l in enumerate(lines) if "SortMergeJoin" in l]
        # in Spark's plan tree the FIRST child's subtree lines carry a
        # ":" continuation prefix; the second (corpus) child's lines do
        # not. Everything under the SMJ without a ":" prefix down to
        # the bucketed scan is the corpus branch — it must hold no
        # Exchange (Sort/Filter only).
        branch = [
            l
            for l in lines[smj_idx[0] + 1 : scan_idx[0] + 1]
            if not l.lstrip().startswith(":")
        ]
        assert branch, plan
        assert not any("Exchange" in l for l in branch), plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
