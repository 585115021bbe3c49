"""Anti / semi join wrappers (SURVEY.md §2.3 J4).

``anti_join(column_info, joined, by=qualtrics_col_name)`` at
``/root/reference/varinfo-update.R:142-145`` reports new-survey
variables absent from the joined codebook. Spark's ``left_anti`` /
``left_semi`` are the natively-scalable forms (broadcastable, null-aware
when needed); these wrappers add dplyr-style differing key names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed(left: DataFrame, right: DataFrame, left_on: str, right_on: str | None, how: str,
           broadcast_right: bool, null_matches_null: bool) -> DataFrame:
    if right_on is None:
        right_on = left_on
    rk = right.select(F.col(f"`{right_on}`").alias("__csdp_key"))
    if broadcast_right:
        rk = F.broadcast(rk)
    lk = F.col(f"`{left_on}`")
    cond = lk.eqNullSafe(rk["__csdp_key"]) if null_matches_null else lk == rk["__csdp_key"]
    return left.join(rk, cond, how)


def anti_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    broadcast_right: bool = False,
    null_matches_null: bool = True,
) -> DataFrame:
    """Rows of ``left`` with no key match in ``right``.

    ``null_matches_null=True`` (default) reproduces dplyr's
    ``na_matches="na"``: a NULL left key is considered matched by a NULL
    right key and therefore EXCLUDED — this is what drops the sentinel
    row from the reference's unmatched-variables report
    (varinfo-update.R:142-145). Set False for SQL ``NOT EXISTS``
    semantics (NULL keys always kept).
    """
    return _keyed(left, right, left_on, right_on, "left_anti", broadcast_right,
                  null_matches_null)


def semi_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    broadcast_right: bool = False,
    null_matches_null: bool = True,
) -> DataFrame:
    """Rows of ``left`` with at least one key match in ``right``."""
    return _keyed(left, right, left_on, right_on, "left_semi", broadcast_right,
                  null_matches_null)


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    key: str,
    m_bits: int = 16384,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi join with an EXPLICIT Bloom runtime filter: build an m-bit
    Bloom filter over the (already filtered, still possibly large) dim
    key set, apply it to the fact scan as a pure JVM expression, then
    run the real ``left_semi`` join to drop the Bloom's false
    positives. The result is IDENTICAL to the plain semi join — the
    Bloom only changes how many fact rows reach the shuffle, which is
    exactly what Spark's injected runtime bloom filters do; this
    operator makes the pattern explicit, tunable, and assertable.

    Scale shape: the build side reduces to at most ``m_bits/64`` rows
    (explode k hash positions → distinct (word, bit) → ``bit_or`` per
    word) — the driver collect is bounded by the CONFIGURED filter
    size, never by data (same contract as the baked k-means
    centroids). The probe is a narrow map over the fact scan with the
    word array baked as a literal; false-positive rate follows the
    standard (1 − e^{−kn/m})^k, so size m to the dim cardinality.
    """
    m_words = (m_bits + 63) // 64
    keys = dim_keys.select(F.col(key).alias("__k")).where(
        F.col("__k").isNotNull()
    ).distinct()

    def positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
            for seed in range(n_hashes)
        ]

    set_bits = (
        keys.select(
            F.explode(F.array(*positions(F.col("__k")))).alias("__pos")
        )
        .distinct()
        .collect()
    )
    if not set_bits:  # empty dim side: semi join is empty
        return fact.limit(0)
    # assemble the word array driver-side: the collect above is bounded
    # by m_bits rows (the CONFIGURED filter size), never by data
    words = [0] * m_words
    for r in set_bits:
        words[r["__pos"] // 64] |= 1 << (r["__pos"] % 64)
    # longs are signed: bit 63 wraps to the sign bit
    word_arr = F.array(
        *[
            F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long")
            for w in words
        ]
    )
    probe = None
    for pos in positions(F.col(f"`{key}`")):
        word = F.element_at(word_arr, (pos / 64).cast("int") + 1)
        hit = F.getbit(word, F.pmod(pos, 64)) == 1
        probe = hit if probe is None else (probe & hit)
    prefiltered = fact.where(F.col(f"`{key}`").isNotNull() & probe)
    return prefiltered.join(
        keys.withColumnRenamed("__k", key), key, "left_semi"
    )
