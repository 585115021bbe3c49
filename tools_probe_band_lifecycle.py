"""Band-table lifecycle probe (dev tool, VERDICT r6 item 1): show what
N bucketed APPENDS do to per-increment cost, and that COMPACTION
restores it.

Method: the sf0.1 corpus split seeds the band table; N further ingest
batches (injective token remaps — disjoint ids, no synthetic dup
pairs, same trick as tools_probe_incremental.py) are APPENDED through
``append_band_table``, each leaving its own bucket files. The fixed
500-doc increment (``incremental_pairs_vs_band_table``) is timed
against the table (a) fresh, (b) after N appends (small-file
accumulation), (c) after ``compact_band_table`` (one file per bucket
again). File counts are reported next to the timings.

Usage: python tools_probe_band_lifecycle.py   (prints SCALING.md rows;
does not rewrite any file)
"""

from __future__ import annotations

import glob
import os
import sys
import time
from urllib.parse import urlparse

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.operators.dedup import (
    append_band_table,
    compact_band_table,
    incremental_pairs_vs_band_table,
    write_band_table,
)
from common_survey_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def remapped(corpus, c: int):
    return corpus.select(
        (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"(\S+)", r"$1_c" + str(c)).alias(
            "text"
        ),
    )


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark(extra_conf={"spark.driver.memory": "16g"})
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    batch = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    table = "probe_band_lifecycle"

    def files() -> int:
        return len(glob.glob(f"{wh}/{table}/part-*.parquet"))

    def run_inc():
        incremental_pairs_vs_band_table(
            spark, table, corpus, batch, "text", "doc_id"
        ).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    def best2() -> float:
        run_inc()  # codegen warm-up
        return min(timed(run_inc), timed(run_inc))

    print("stage | appends | bucket_files | increment_s | stage_cost_s")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import shutil

    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    t_w = timed(
        lambda: write_band_table(spark, corpus, table, 8, "text", "doc_id")
    )
    print(f"fresh | 0 | {files()} | {best2():.2f} | {t_w:.2f}")
    n_app = 0
    for target in (8, 32):
        t_a = 0.0
        while n_app < target:
            n_app += 1
            t_a += timed(
                lambda: append_band_table(
                    spark, remapped(corpus, n_app), table, "text", "doc_id"
                )
            )
        print(
            f"appended | {n_app} | {files()} | {best2():.2f} | {t_a:.2f}"
        )
    t_c = timed(lambda: compact_band_table(spark, table))
    print(f"compacted | {n_app} | {files()} | {best2():.2f} | {t_c:.2f}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")


if __name__ == "__main__":
    main()
