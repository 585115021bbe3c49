"""Hub-bucket cap for ``hamming_band_pairs`` (VERDICT r7 watch item 1).

The cap's contract is stronger than the usual blocked-candidate trade:
within the banding's completeness regime (max_hamming ≤ n_chunks - 1)
the capped output is IDENTICAL to the uncapped output — the secondary
sub-split's 1-bit-flip multiprobe catches, by pigeonhole, every pair
the oversized bucket's self-join would have produced. These tests pin
that equality on random corpora, on an adversarial all-in-one-hub
corpus, and on the real SimHash path over the sf docs with a cap small
enough to force every bucket through the sub-split.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.dedup import (
    hamming_band_pairs,
    simhash_dedup_pairs,
)


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "id long, sig long"
    )


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in df.collect()
    }


def _rand_sigs(rng, n, planted, max_flip=3):
    """n random 64-bit signatures + near-dup variants of the first
    ``planted`` (each differing in 1..max_flip random bit positions)."""
    sigs = [rng.getrandbits(63) for _ in range(n)]
    for i in range(planted):
        flips = rng.sample(range(63), rng.randint(1, max_flip))
        v = sigs[i]
        for b in flips:
            v ^= 1 << b
        sigs.append(v)
    return sigs


def test_capped_equals_uncapped_random_corpus(spark):
    rng = random.Random(7)
    sigs = _rand_sigs(rng, 120, planted=30)
    df = _sig_df(spark, sigs)
    base = _pairs(hamming_band_pairs(df, "id", "sig", 64, 3))
    capped = _pairs(hamming_band_pairs(df, "id", "sig", 64, 3, bucket_cap=5))
    assert capped == base
    assert len(base) >= 30  # every planted variant pairs with its base


def test_capped_equals_uncapped_hub_corpus(spark):
    # adversarial hub: EVERY signature shares chunk-0 (low 16 bits), so
    # uncapped bucket (0, hubval) holds the whole corpus; upper bits
    # random with planted near-dups whose flips avoid chunk 0 (they
    # must stay in the hub to exercise the sub-split, not escape it)
    rng = random.Random(11)
    hub = 0xBEEF
    sigs = []
    for _ in range(150):
        sigs.append((rng.getrandbits(47) << 16) | hub)
    for i in range(40):
        flips = rng.sample(range(16, 63), rng.randint(1, 3))
        v = sigs[i]
        for b in flips:
            v ^= 1 << b
        sigs.append(v)
    df = _sig_df(spark, sigs)
    base = _pairs(hamming_band_pairs(df, "id", "sig", 64, 3))
    capped = _pairs(hamming_band_pairs(df, "id", "sig", 64, 3, bucket_cap=8))
    assert capped == base
    planted = {p for p in base if p[1] >= 150}
    assert len(planted) >= 40
    assert planted <= capped


def test_cap_one_is_pure_multiprobe_and_still_exact(spark):
    # bucket_cap=1 sends EVERY bucket with >= 2 rows through the
    # sub-split — the pure-multiprobe extreme must still be exact
    rng = random.Random(3)
    sigs = _rand_sigs(rng, 60, planted=20)
    df = _sig_df(spark, sigs)
    base = _pairs(hamming_band_pairs(df, "id", "sig", 64, 3))
    capped = _pairs(hamming_band_pairs(df, "id", "sig", 64, 3, bucket_cap=1))
    assert capped == base


def test_identical_signatures_still_pair_under_cap(spark):
    # true duplicates collide on EVERY chunk (output is inherently
    # quadratic); the cap must not lose hamming-0 pairs
    df = _sig_df(spark, [12345] * 6 + [99999])
    capped = _pairs(hamming_band_pairs(df, "id", "sig", 64, 3, bucket_cap=2))
    assert len([p for p in capped if p[2] == 0]) == 15  # C(6,2)


def test_simhash_bucket_cap_matches_uncapped_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    base = _pairs(simhash_dedup_pairs(docs, "text", "doc_id", max_hamming=3))
    capped = _pairs(
        simhash_dedup_pairs(
            docs, "text", "doc_id", max_hamming=3, bucket_cap=2
        )
    )
    assert capped == base


def test_bucket_cap_rejects_nonpositive(spark):
    df = _sig_df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="bucket_cap"):
        hamming_band_pairs(df, "id", "sig", 64, 3, bucket_cap=0).collect()


def test_bucket_cap_rejects_single_chunk(spark):
    # with one chunk the sub-split has no other chunk to key on —
    # oversized buckets would silently emit zero pairs (ADVICE r8)
    df = _sig_df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="n_chunks >= 2"):
        hamming_band_pairs(df, "id", "sig", 64, 3, n_chunks=1, bucket_cap=2)


def test_bucket_cap_warns_beyond_exact_recall_bound(spark):
    import warnings

    df = _sig_df(spark, [1, 2, 3])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        hamming_band_pairs(
            df, "id", "sig", 64, max_hamming=5, n_chunks=4, bucket_cap=2
        ).collect()
    assert any("best-effort" in str(x.message) for x in w)
