"""sf1 (10×) dataset generator for the scale bench (dev tool).

Amplifies the driver's sf0.1 parquet tables 10× into /tmp/csdp_sf1 in a
DUPLICATE-STRUCTURE-PRESERVING way, so the sf1/sf0.1 runtime ratio of a
query measures data scaling, not an artificially quadratic workload:

* every foreign-key chain is offset per copy (orderkey/custkey/partkey/
  suppkey/…), so copies join only within themselves — join fanout and
  group cardinality grow LINEARLY in k, exactly like real growth;
* document text gets an injective per-copy token remap (suffix per
  word), so shingle/minhash/prefix-filter candidate structure grows
  linearly instead of k²-fold (naive row duplication would make every
  dedup query quadratically harder by construction);
* nation/region are dimension constants and copy through unchanged;
* timestamps copy through unchanged (window/asof density grows linearly
  per key because the keys are offset).

Used by ``bench.py``'s sf1_top10 section; safe to re-run (skips when
the output dir already holds all ten tables).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

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

_OFF = 1 << 32  # per-copy key offset — far above any sf0.1 key


def _amplify(df, k: int, key_cols: list[str], remap_text: str | None = None):
    """k copies with every column in ``key_cols`` offset by i·2³² and,
    optionally, an injective per-copy word remap of ``remap_text``."""
    copies = []
    for i in range(k):
        c = df
        if i > 0:
            for col in key_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * _OFF))
            if remap_text:
                c = c.withColumn(
                    remap_text,
                    F.array_join(
                        F.transform(
                            F.split(F.col(remap_text), " "),
                            lambda w: F.concat(w, F.lit(f"_{i}")),
                        ),
                        " ",
                    ),
                )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def ensure_sf1(
    spark: SparkSession,
    src_dir: str = "/root/testdata/sf0.1",
    out_dir: str = "/tmp/csdp_sf1",
    k: int = 10,
) -> str:
    """Build (once) and return the sf1 directory. Partitioned writes:
    each table lands with enough files that the sf1 reads parallelize
    across local[32] without a repartition."""
    if all(
        os.path.exists(f"{out_dir}/{t}.parquet/_SUCCESS") for t in TABLES
    ):
        return out_dir

    def rd(t):
        return spark.read.parquet(f"{src_dir}/{t}.parquet")

    plans = {
        "region": (rd("region"), [], None),
        "nation": (rd("nation"), [], None),
        "customer": (rd("customer"), ["c_custkey"], None),
        "supplier": (rd("supplier"), ["s_suppkey"], None),
        "part": (rd("part"), ["p_partkey"], None),
        "orders": (rd("orders"), ["o_orderkey", "o_custkey"], None),
        "lineitem": (
            rd("lineitem"),
            ["l_orderkey", "l_partkey", "l_suppkey"],
            None,
        ),
        "events": (rd("events"), ["event_id", "user_id"], None),
        "documents": (rd("documents"), ["doc_id"], "text"),
        "embeddings": (rd("embeddings"), ["vec_id"], None),
    }
    for t, (df, keys, text) in plans.items():
        amp = df if not keys and t in ("region", "nation") else _amplify(
            df, k, keys, text
        )
        n_files = 1 if t in ("region", "nation") else 32
        amp.repartition(n_files).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    return out_dir


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from common_survey_data_pipeline_spark import get_spark

    out = ensure_sf1(get_spark(app_name="csdp-gen-sf1"))
    print(out)
