"""End-to-end curation chain (VERDICT r6 item 5): output invariants of
the composed funnel, the two-reuse-point cache policy, and the
scan-once property (every consumer of the raw corpus reads the cached
projection, never a second parquet scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.workload import REGISTRY


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    spark.catalog.clearCache()
    df = REGISTRY["corpus_e2e_curation"].fn(spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    # snapshot cache state BEFORE cleanup — the fixture consumer asserts on it
    storage = [
        (s.memSize(), s.numCachedPartitions())
        for s in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]
    yield rows, storage
    spark.catalog.clearCache()


def test_funnel_output_invariants(result):
    rows, _ = result
    assert len(rows) > 0
    for r in rows:
        assert r["doc_id"] % 37 != 0  # eval split never survives
        assert r["logit_micro"] > 0  # classifier keep threshold applied
        assert r["pack_id"] == (r["cum_tokens"] - r["n_tokens"]) // 2048


def test_packing_is_a_dense_prefix_sum(result):
    rows, _ = result
    cum = 0
    for r in rows:  # already sorted by doc_id, the packing order
        cum += r["n_tokens"]
        assert r["cum_tokens"] == cum


def test_survivors_are_subset_of_curated(spark, sf_dir, result):
    rows, _ = result
    curated = {
        r["doc_id"]
        for r in REGISTRY["curate_corpus"].fn(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    got = {r["doc_id"] for r in rows}
    assert got <= curated
    assert got != curated  # decontam/classifier really dropped docs


def test_both_reuse_points_are_cached(result):
    """The documented cache policy: the raw (doc_id, text) projection
    and the cleaned text are both materialized in the block store."""
    _, storage = result
    populated = [s for s in storage if s[0] > 0 and s[1] > 0]
    assert len(populated) >= 2, storage


def test_consumers_read_the_cache_not_the_source(spark, sf_dir):
    """Scan-once: a second consumer of the cached projection roots on
    InMemoryTableScan — the parquet source appears only inside the
    cached relation's own (already materialized) build plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", "text").cache()
    try:
        base.count()  # materialize
        consumer = base.where(F.col("doc_id") % 37 == 0)
        plan = consumer._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan
        scan_pos = plan.find("Scan parquet")
        imts_pos = plan.find("InMemoryTableScan")
        assert scan_pos == -1 or imts_pos < scan_pos, plan
    finally:
        base.unpersist()
