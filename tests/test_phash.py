"""Image pHash near-dup (VERDICT r6 item 2): the DCT pHash kernel, the
shared Hamming banding, the near/far semantics of the synthetic image
corpus, driver-side hash parity, and the no-all-pairs plan pin."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.dedup import (
    hamming_band_pairs,
)
from common_survey_data_pipeline_spark.operators.multimodal import (
    phash64_bytes,
    phash_images,
    synthetic_luma_payloads,
)
from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.workload import REGISTRY


def _popcount(x: int) -> int:
    return bin(x & (2**64 - 1)).count("1")


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = synthetic_luma_payloads(docs)
    hashes = phash_images(media)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    spark_hashes = {r["doc_id"]: r["phash"] for r in hashes.collect()}
    return docs, hashes, payloads, spark_hashes


def test_spark_hashes_match_driver_side_reference(corpus):
    """Engine-independent oracle: the identical pHash recomputed in
    pure numpy driver-side must match the distributed kernel exactly."""
    _, _, payloads, spark_hashes = corpus
    assert set(payloads) == set(spark_hashes)
    for i, p in payloads.items():
        assert phash64_bytes(p) == spark_hashes[i], i


def test_banded_pairs_equal_exact_hamming_pairs(spark, corpus):
    _, hashes, _, ref = corpus
    banded = sorted(
        map(
            tuple,
            hamming_band_pairs(hashes, "doc_id", "phash", 64, 3).collect(),
        )
    )
    exact = sorted(
        (a, b, _popcount(ref[a] ^ ref[b]))
        for a, b in itertools.combinations(sorted(ref), 2)
        if _popcount(ref[a] ^ ref[b]) <= 3
    )
    assert banded == exact
    assert len(banded) > 0  # the contract is not vacuous


def test_near_variants_pair_and_far_variants_do_not(corpus):
    """Semantics of the corpus: jittered variants of a group's base
    image land within Hamming ~3; the heavy-overlay variant stays far."""
    _, _, _, ref = corpus
    near_h, far_h = [], []
    for a, b in itertools.combinations(sorted(ref), 2):
        if a // 5 != b // 5:
            continue
        h = _popcount(ref[a] ^ ref[b])
        (far_h if (a % 5 == 4 or b % 5 == 4) else near_h).append(h)
    assert near_h and far_h
    assert sum(1 for h in near_h if h <= 3) / len(near_h) > 0.9
    assert min(far_h) > 3  # heavy overlay never pairs at the threshold


def test_banding_plan_has_no_all_pairs_stage(spark, corpus):
    """Candidate generation must be an equi-join on (chunk, chunk_val)
    — no cartesian / nested-loop stage anywhere in the plan."""
    _, hashes, _, _ = corpus
    plan = (
        hamming_band_pairs(hashes, "doc_id", "phash", 64, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_registered_contract_query_all_true(spark, sf_dir):
    rows = REGISTRY["multimodal_phash_neardup"].fn(spark, sf_dir).collect()
    spark.catalog.clearCache()
    assert len(rows) == 500
    assert all(r["banded_matches_exact"] for r in rows)
