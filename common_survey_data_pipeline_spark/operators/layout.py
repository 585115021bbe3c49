"""Storage-layout operators: Z-order (Morton) interleaving for
multi-dimensional data clustering.

Writing a 100 TB table sorted by a single column gives parquet min/max
skipping on that column only; interleaving the bits of several bucketed
columns into one Z-value and sorting by it gives every interleaved
dimension locality in the same file order, so point/range predicates on
ANY of them prune files. This is the technique behind Delta/Iceberg
``ZORDER BY`` re-expressed as plain column arithmetic: the Z-value is a
pure per-row expression (no shuffle, no UDF), and the actual clustering
is a normal ``repartitionByRange``/sort-within-partitions write.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (integer columns already bucketed into
    ``[0, 2**bits)``) into one long: bit ``j`` of column ``ci`` lands at
    position ``j * len(cols) + ci``.

    The bit loop unrolls in Python into a flat sum of
    ``((c >> j) & 1) * 2^(j*n+ci)`` terms — all JVM-side integer
    arithmetic inside whole-stage codegen; constants are Python-side
    literals, so no per-row loop exists anywhere. ``len(cols) * bits``
    must stay ≤ 62 to fit the signed long.
    """
    ncols = len(cols)
    if ncols * bits > 62:
        raise ValueError("len(cols) * bits must be <= 62 to fit a long")
    z = F.lit(0).cast("long")
    for j in range(bits):
        for ci, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (j * ncols + ci))
    return z


def zorder_bucket_stats(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bucket_bits: int = 6,
) -> DataFrame:
    """Cluster-quality report for a prospective Z-order layout: bucket
    rows by the top ``bucket_bits`` of their Z-value (= the file an
    ordered write would place them in) and report each bucket's row
    count and per-dimension min/max spread. Narrow per-bucket ranges on
    EVERY dimension = effective multi-column data skipping.

    One scan + one aggregation into ``2**bucket_bits`` groups.
    """
    zcols = [F.col(c).bitwiseAND(F.lit((1 << bits) - 1)) for c in cols]
    z = zorder_key(zcols, bits)
    bucket = F.shiftright(z, len(cols) * bits - bucket_bits).alias("z_bucket")
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(bucket).agg(*aggs)
