"""Distributed dense linear algebra over embedding columns: the
sample-covariance (and Gram) matrix that feeds PCA / whitening /
dimensionality diagnostics.

Scale shape — the ONLY shape that survives a 100 TB corpus of
d-dimensional vectors: each partition reduces its rows to (d, d)
partials via a vectorized ``X.T @ X`` (plus the column-sum vector and a
count), emitted as d·(d+1)/2 upper-triangle rows per Arrow batch. The
shuffle then carries O(d² · batches) tiny rows — never a per-row
explode, whose d² amplification (4096× at d=64) would dwarf the input.
The final grouped sum + closed-form covariance is a trivially small
aggregation.

Cross-engine determinism (round-5 guard-band hardening): float partials
sum in partition order, so two engines' raw covariances differ in the
last bits — and the guard-band sweep measured raw values as close as
9.6e-11 to a rounding half-boundary, i.e. a representation-hash coin
flip. The kernel therefore QUANTIZES each element to an integer at
1e-6 (``np.rint``, IEEE roundTiesToEven — mirrored by DuckDB's
``round_even`` in the paired oracle) and accumulates EXACT int64
products per Arrow batch; the combine sums them as exact decimals and
the covariance is a fixed DOUBLE op sequence over identical inputs —
bit-identical on any engine, any partitioning. The 1e-6 quantization
perturbs a covariance of O(1)-scaled vectors by ≲ 2e-6·E|x| (µ ≪ the
6-decimal output round for unit-scale embeddings). INPUT-DOMAIN
CONTRACT: a batch of r rows keeps Σ|q_i·q_j| ≤ r·max(q)² and must stay
under 2⁶³, so max|x| ≤ √(2⁶³/r)/1e6 — ≈ 30 for the default 10k-row
Arrow batches (unit-scale embeddings clear it by 50×). The kernel
CHECKS the bound per batch and raises instead of wrapping.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embedding_covariance"]

# per-element quantization scale: q = rint(x * 1e6)
_Q = 1_000_000.0
# covariance output is in q²-units; divide back by _Q² at the end
_Q2 = _Q * _Q


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", ddof: int = 1
) -> DataFrame:
    """Upper-triangle sample covariance of the vector column:
    rows ``(i, j, cov)`` for 1-based ``i ≤ j``, with
    ``cov = (n·Σq_iq_j − Σq_i·Σq_j) / (n·(n − ddof)) / 1e12`` over
    elements quantized at 1e-6 (see module docstring), rounded to 6.

    Null vectors are excluded. Returns an empty frame when fewer than
    ``ddof + 1`` vectors exist (covariance undefined).
    """

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = ju = None
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            x = np.array(vecs.tolist(), dtype=np.float64)
            # quantize exactly like the oracle: nearest-even on the
            # double product (np.rint == IEEE roundTiesToEven ==
            # DuckDB round_even(x, 0)) — keep the float result until
            # AFTER the bound check: a double→int64 cast of an
            # out-of-range value wraps (typically to INT64_MIN, whose
            # np.abs is still negative), so a post-cast max() could
            # miss the offending element and let corrupted q through
            qf = np.rint(x * _Q)
            # enforce the module's input-domain contract LOUDLY:
            # numpy int64 matmul wraps silently on overflow, which
            # would diverge from the exact HUGEINT oracle
            qmax = float(np.abs(qf).max(initial=0.0))
            if qmax * qmax * qf.shape[0] >= 2.0**63:
                raise ValueError(
                    "embedding_covariance: |x| too large for the exact "
                    f"int64 Gram path (max|q|={qmax:.3g} over "
                    f"{qf.shape[0]} rows; need max|x| <= "
                    f"{(2.0**63 / qf.shape[0]) ** 0.5 / _Q:.3g}); rescale "
                    "the embeddings or lower the quantization scale"
                )
            q = qf.astype(np.int64)
            if iu is None:
                iu, ju = np.triu_indices(q.shape[1])
            # one EXACT int64 partial per Arrow batch (~10k rows), not
            # per partition — O(d²·batches) shuffle rows, still
            # vanishing vs inputs
            s = q.sum(axis=0, dtype=np.int64)
            g = q.T @ q
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int32"),
                    "j": (ju + 1).astype("int32"),
                    "pn": np.int64(q.shape[0]),
                    "si": s[iu],
                    "sj": s[ju],
                    "gij": g[iu, ju],
                }
            )

    partials = df.select(vec_col).mapInPandas(
        partial,
        schema="i int, j int, pn long, si long, sj long, gij long",
    )
    # decimal(38,0) sums: exact however many batch partials arrive
    agg = partials.groupBy("i", "j").agg(
        F.sum("pn").alias("n"),
        F.sum(F.col("si").cast("decimal(20,0)")).alias("sx"),
        F.sum(F.col("sj").cast("decimal(20,0)")).alias("sy"),
        F.sum(F.col("gij").cast("decimal(20,0)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    return agg.where(F.col("n") > ddof).select(
        "i",
        "j",
        (
            # fixed double op sequence, mirrored verbatim in the
            # oracle SQL; + 0.0 canonicalizes IEEE −0.0 → +0.0
            F.round(
                (n * sxy - sx * sy)
                / (n * (n - F.lit(float(ddof))))
                / F.lit(_Q2),
                6,
            )
            + 0.0
        ).alias("cov"),
    )
