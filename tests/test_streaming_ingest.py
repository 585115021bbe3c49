"""Streaming corpus ingestion (streaming/ingest.py): JSONL drop dir →
PII scrub + quality gate → partitioned parquet, and batch/stream parity
of the shared curation transform."""

import json

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.streaming.ingest import (
    DOC_SCHEMA,
    curate_batch,
    run_ingest_to_parquet,
)

_GOOD = (
    "the quick brown fox and the lazy dog walk to the market in the morning "
    "and it is a fine day that you would like"
)
_JUNK = "@@!! ## $$ %% ^^ && ** (( ))"


def _drop_file(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _doc(i, text, lang="en"):
    return {"doc_id": i, "text": text, "lang": lang, "source": f"src{i % 2}"}


def test_ingest_scrubs_filters_and_partitions(spark, tmp_path):
    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    out_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    _drop_file(
        in_dir / "b0.jsonl",
        [
            _doc(1, _GOOD + " mail me a.b@ex.org today"),
            _doc(2, _JUNK),  # fails the quality gate
            _doc(3, _GOOD, lang="fr"),
        ],
    )
    _drop_file(in_dir / "b1.jsonl", [_doc(4, _GOOD + " from 10.1.2.3 thanks")])

    q = run_ingest_to_parquet(spark, str(in_dir), out_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out_dir)
    rows = {r.doc_id: r for r in got.collect()}
    # junk doc gated out, the rest curated
    assert set(rows) == {1, 3, 4}
    assert "<EMAIL>" in rows[1].text and "a.b@ex.org" not in rows[1].text
    assert "<IP>" in rows[4].text and "10.1.2.3" not in rows[4].text
    # lang partitioning visible to pruning readers
    assert (tmp_path / "corpus" / "lang=fr").exists()
    assert rows[3].lang == "fr"
    assert all(r.quality >= 0.3 and r.n_tokens > 0 for r in rows.values())


def test_restart_does_not_duplicate(spark, tmp_path):
    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    out_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    _drop_file(in_dir / "b0.jsonl", [_doc(1, _GOOD)])
    q = run_ingest_to_parquet(spark, str(in_dir), out_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # second run with the same checkpoint: old file already committed,
    # only the new file lands
    _drop_file(in_dir / "b1.jsonl", [_doc(2, _GOOD)])
    q2 = run_ingest_to_parquet(spark, str(in_dir), out_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sorted(
        r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()
    ) == [1, 2]


def test_curate_batch_stream_parity(spark, tmp_path):
    # the same transform over the same rows as a batch frame must equal
    # the streamed parquet output
    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    rows = [_doc(i, _GOOD + f" extra {i}") for i in range(6)] + [_doc(99, _JUNK)]
    _drop_file(in_dir / "b0.jsonl", rows)
    out_dir = str(tmp_path / "corpus")
    q = run_ingest_to_parquet(
        spark, str(in_dir), out_dir, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = curate_batch(
        spark.createDataFrame(
            [(r["doc_id"], r["text"], r["lang"], r["source"]) for r in rows],
            DOC_SCHEMA,
        )
    )
    cols = ["doc_id", "text", "lang", "source", "quality", "n_tokens"]
    got = sorted(map(tuple, spark.read.parquet(out_dir).select(*cols).collect()))
    want = sorted(map(tuple, batch.select(*cols).collect()))
    assert got == want and len(got) == 6


def test_ingest_with_dedup_drops_corpus_near_dups(spark, tmp_path):
    from common_survey_data_pipeline_spark.streaming.ingest import (
        run_ingest_with_dedup,
    )

    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    out_dir = str(tmp_path / "corpus_out")
    ckpt = str(tmp_path / "ckpt_dedup")
    corpus_text = _GOOD + " already accepted into the corpus some time ago"
    corpus = spark.createDataFrame(
        [(1000, corpus_text, "en", "srcA")], DOC_SCHEMA
    )
    fresh = (
        "completely different sentences about ships and harbors that "
        "share nothing with the accepted corpus document at all and it "
        "is a long enough fine text that you would like"
    )
    # batch 1: an exact copy of a corpus doc (dup) + a fresh doc
    _drop_file(
        in_dir / "b0.jsonl",
        [_doc(1, corpus_text), _doc(2, fresh)],
    )
    # batch 2: a near-copy (one word changed → high jaccard) + junk
    _drop_file(
        in_dir / "b1.jsonl",
        [_doc(3, corpus_text.replace("morning", "evening")), _doc(4, _JUNK)],
    )
    q = run_ingest_with_dedup(spark, str(in_dir), out_dir, ckpt, corpus)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()
    )
    # 1 and 3 are near-dups of the corpus, 4 fails quality: only 2 lands
    assert got == [2]
