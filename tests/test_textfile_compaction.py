"""Text-corpus source round-trip and parquet compaction maintenance."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.parquet_sink import (
    compact_parquet,
    file_fragmentation_report,
    write_sorted_parquet,
)
from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.sources.textfile import (
    read_text_corpus,
    write_text_corpus,
)


def test_text_corpus_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_txt")
    write_text_corpus(docs, "text", path, shards=3)
    back = read_text_corpus(spark, path)
    # synthetic docs have no newlines and no blanks: lossless round-trip
    assert back.count() == docs.count()
    assert sorted(r["text"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )
    assert back.columns == ["doc_id", "text", "src_file"]


def test_text_corpus_doc_id_content_addressed(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_txt2")
    write_text_corpus(docs, "text", path, shards=2)
    a = {r["doc_id"] for r in read_text_corpus(spark, path).collect()}
    # re-read under a different partitioning: ids identical
    b = {
        r["doc_id"]
        for r in read_text_corpus(spark, path).repartition(7).collect()
    }
    assert a == b


def test_text_corpus_drops_blank_lines(spark, tmp_path):
    p = tmp_path / "blanks"
    p.mkdir()
    (p / "a.txt").write_text("one doc\n\n   \nanother doc\n")
    got = read_text_corpus(spark, str(p))
    assert sorted(r["text"] for r in got.collect()) == ["another doc", "one doc"]
    kept = read_text_corpus(spark, str(p), drop_blank=False)
    assert kept.count() == 4


def test_write_sorted_parquet_global_order(spark, sf_dir, tmp_path):
    """Range-partitioned sorted export: non-overlapping per-file key
    ranges (global order across files) without a single-task sort."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "sorted")
    write_sorted_parquet(orders, path, sort_by=["o_totalprice"], num_files=4)

    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert 1 < len(per_file) <= 4  # range sampler may merge tiny ranges
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # non-overlapping => global order
    assert sum(r["n"] for r in per_file) == orders.count()
    # and within every file rows are sorted
    one = spark.read.parquet(per_file[0]["f"]).select("o_totalprice").collect()
    vals = [r["o_totalprice"] for r in one]
    assert vals == sorted(vals)


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    frag_dir = str(tmp_path / "fragmented")
    docs.repartition(40).write.parquet(frag_dir)
    before = file_fragmentation_report(spark, frag_dir)
    assert before["n_files"] == 40

    out_dir = str(tmp_path / "compacted")
    n_rows = docs.count()
    planned = compact_parquet(
        spark, frag_dir, out_dir, target_rows_per_file=n_rows, sort_within_by=["doc_id"]
    )
    assert planned == 1
    after = file_fragmentation_report(spark, out_dir)
    assert after["n_files"] == 1
    assert len(glob.glob(out_dir + "/*.parquet")) == 1

    compacted = spark.read.parquet(out_dir)
    assert compacted.count() == n_rows
    assert sorted(compacted.columns) == sorted(docs.columns)
    # content preserved (order-independent, overflow-free digest)
    digest = F.expr(
        "bit_xor(xxhash64({}))".format(", ".join(sorted(docs.columns)))
    )
    assert (
        compacted.select(digest).collect()[0][0]
        == docs.select(digest).collect()[0][0]
    )
