"""Band-table lifecycle (VERDICT r6 item 1): appending ingest batches
through the stored bucket spec and compacting the accumulated small
files must (a) reproduce exactly the fresh-built table, (b) keep the
no-corpus-Exchange join property, and (c) actually collapse files to
one per bucket. Build-parameter drift must be impossible: appends read
the stored LSH parameters back from table properties, and querying
with mismatched parameters raises instead of silently missing pairs
(ADVICE r6)."""

from __future__ import annotations

import glob
import os
import re
import shutil
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.dedup import (
    append_band_table,
    band_table_props,
    compact_band_table,
    incremental_pairs_vs_band_table,
    minhash_band_keys,
    write_band_table,
)
from common_survey_data_pipeline_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)
from common_survey_data_pipeline_spark.sources.tables import load_table

LIFE = "band_life_test"
FRESH = "band_life_fresh"
BUCKETS = 8


def _wh(spark) -> str:
    return urlparse(spark.conf.get("spark.sql.warehouse.dir")).path


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{_wh(spark)}/{t}", ignore_errors=True)


def _bucket_files(spark, table) -> dict[str, int]:
    per: dict[str, int] = {}
    for f in glob.glob(f"{_wh(spark)}/{table}/part-*.parquet"):
        m = re.search(r"_(\d{5})\.", os.path.basename(f))
        key = m.group(1) if m else "?"
        per[key] = per.get(key, 0) + 1
    return per


@pytest.fixture(scope="module")
def lifecycle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    first = corpus.where(F.col("doc_id") % 10 <= 5)
    later = corpus.where(F.col("doc_id") % 10 > 5)
    _drop(spark, LIFE, f"{LIFE}__compacting", FRESH)
    write_band_table(spark, first, LIFE, BUCKETS, "text", "doc_id")
    append_band_table(spark, later, LIFE, "text", "doc_id")
    files_before_compact = sum(_bucket_files(spark, LIFE).values())
    compact_band_table(spark, LIFE)
    write_band_table(spark, corpus, FRESH, BUCKETS, "text", "doc_id")
    yield corpus, batch, files_before_compact
    spark.catalog.clearCache()
    _drop(spark, LIFE, f"{LIFE}__compacting", FRESH)


def test_appended_then_compacted_equals_fresh_build(spark, lifecycle):
    rows_life = sorted(map(tuple, spark.table(LIFE).collect()))
    rows_fresh = sorted(map(tuple, spark.table(FRESH).collect()))
    assert rows_life == rows_fresh
    assert len(rows_life) > 0


def test_compaction_collapses_to_one_file_per_bucket(spark, lifecycle):
    _, _, files_before = lifecycle
    per = _bucket_files(spark, LIFE)
    assert files_before > BUCKETS  # the append really did add files
    assert sum(per.values()) == BUCKETS
    assert all(n == 1 for n in per.values()), per


def test_props_survive_append_and_compaction(spark, lifecycle):
    assert band_table_props(spark, LIFE) == {
        "shingle_words": 3,
        "num_hashes": 64,
        "bands": 16,
    }


def test_post_compaction_join_has_no_corpus_exchange(spark, lifecycle):
    """The whole point of the lifecycle: after N appends + compaction
    the corpus side must STILL join straight off bucket files."""
    _, batch, _ = lifecycle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch_bands = minhash_band_keys(batch, "text", "doc_id").select(
            F.col("doc_id").alias("batch_id"), "band_key"
        )
        joined = batch_bands.join(read_bucketed(spark, LIFE), "band_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
        lines = plan.splitlines()
        scan_idx = [
            i for i, l in enumerate(lines) if LIFE in l and "Scan" in l
        ]
        smj_idx = [i for i, l in enumerate(lines) if "SortMergeJoin" in l]
        assert scan_idx and smj_idx, plan
        # corpus branch = the SMJ's second child: lines without the
        # first child's ":" continuation prefix, down to the bucketed
        # scan — no Exchange allowed there (batch-side shuffles are
        # expected, they are O(batch))
        branch = [
            l
            for l in lines[smj_idx[0] + 1 : scan_idx[0] + 1]
            if not l.lstrip().startswith(":")
        ]
        assert branch, plan
        assert not any("Exchange" in l for l in branch), plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_lifecycle_pairs_equal_fresh_table_pairs(spark, lifecycle):
    corpus, batch, _ = lifecycle
    got = sorted(
        map(
            tuple,
            incremental_pairs_vs_band_table(
                spark, LIFE, corpus, batch, "text", "doc_id"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            incremental_pairs_vs_band_table(
                spark, FRESH, corpus, batch, "text", "doc_id"
            ).collect(),
        )
    )
    spark.catalog.clearCache()
    assert got == want
    assert len(got) > 0


def test_mismatched_query_parameters_raise(spark, lifecycle):
    corpus, batch, _ = lifecycle
    with pytest.raises(ValueError, match="shingle_words=5"):
        incremental_pairs_vs_band_table(
            spark, LIFE, corpus, batch, "text", "doc_id", shingle_words=5
        )
    with pytest.raises(ValueError, match="bands=8"):
        incremental_pairs_vs_band_table(
            spark, LIFE, corpus, batch, "text", "doc_id",
            num_hashes=64, bands=8,
        )


def test_append_to_propertyless_table_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    bare = "band_life_bare"
    _drop(spark, bare)
    # written WITHOUT write_band_table → no dedup.* properties
    write_bucketed(
        minhash_band_keys(docs, "text", "doc_id"), bare, 4, "band_key"
    )
    try:
        with pytest.raises(ValueError, match="no dedup.*properties"):
            append_band_table(spark, docs, bare, "text", "doc_id")
    finally:
        _drop(spark, bare)
