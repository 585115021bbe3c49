"""Incremental-dedup cost probe (dev tool, VERDICT r5 item 2): show the
persisted-band-table increment costs O(batch), not O(corpus).

Method: amplify the sf0.1 documents corpus k× (k = 1, 4, 16) with an
injective token remap (same trick as tools_scalebench.py — copies share
no shingles, so candidate volume stays realistic). Keep the incoming
BATCH FIXED (the sf0.1 batch split, 500 docs). For each corpus size:

* ``recompute`` — ``minhash_incremental_pairs``: re-shingles and
  re-minhashes the whole corpus every increment → time grows ~k;
* ``persisted`` — write the corpus band table once (bucketed on
  band_key; cost charged to ingest, reported separately), then time
  ``incremental_pairs_vs_band_table`` → the per-increment time should
  stay near-flat in k.

Usage: python tools_probe_incremental.py   (prints the table rows for
SCALING.md; does not rewrite any file)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.operators.dedup import (
    incremental_pairs_vs_band_table,
    minhash_band_keys,
    minhash_incremental_pairs,
)
from common_survey_data_pipeline_spark.sources.bucketing import write_bucketed
from common_survey_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplified_corpus(docs, k: int):
    """k injectively-remapped copies of the corpus split (doc_id % 10
    != 0). Copy c shifts every token by a per-copy suffix and doc ids
    into a disjoint range, so copies contribute corpus bulk without
    synthetic duplicate pairs."""
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    parts = []
    for c in range(k):
        if c == 0:
            parts.append(corpus)
        else:
            remap = corpus.select(
                (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"(\S+)", r"$1_c" + str(c)
                ).alias("text"),
            )
            parts.append(remap.select("doc_id", "text"))
    out = parts[0].select("doc_id", "text")
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark(extra_conf={"spark.driver.memory": "16g"})
    docs = load_table(spark, SF_DIR, "documents")
    batch = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    print("k | corpus_docs | ingest_write_s | persisted_inc_s | recompute_inc_s")
    for k in (1, 4, 16):
        corpus = amplified_corpus(docs, k).localCheckpoint()
        n = corpus.count()
        table = f"probe_band_k{k}"
        t_write = timed(
            lambda: write_bucketed(
                minhash_band_keys(corpus, "text", "doc_id"),
                table, 8, "band_key",
            )
        )
        # warm both paths once (codegen), then best-of-2 measured
        def run_persisted():
            incremental_pairs_vs_band_table(
                spark, table, corpus, batch, "text", "doc_id"
            ).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

        def run_recompute():
            minhash_incremental_pairs(
                corpus, batch, "text", "doc_id"
            ).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

        run_persisted()
        t_p = min(timed(run_persisted), timed(run_persisted))
        run_recompute()
        t_r = min(timed(run_recompute), timed(run_recompute))
        print(f"{k} | {n} | {t_write:.2f} | {t_p:.2f} | {t_r:.2f}")
        spark.sql(f"DROP TABLE IF EXISTS {table}")


if __name__ == "__main__":
    main()
