"""JSONL source/sink round-trip: explicit-schema read, corrupt-line
audit, and fixed-size shard writing."""

import glob
import json
import os

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.jsonl import (
    corrupt_line_count,
    read_jsonl,
    write_jsonl_shards,
)

SCHEMA = "doc_id BIGINT, text STRING, lang STRING"


def _write_lines(path, lines):
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def test_roundtrip_with_explicit_schema(spark, tmp_path):
    src = str(tmp_path / "in.jsonl")
    _write_lines(
        src,
        [json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en"}) for i in range(10)],
    )
    df = read_jsonl(spark, src, SCHEMA)
    assert corrupt_line_count(spark, src, SCHEMA) == 0
    got = {r.doc_id: r.text for r in df.collect()}
    assert got == {i: f"doc {i}" for i in range(10)}


def test_corrupt_lines_salvaged_not_dropped(spark, tmp_path):
    src = str(tmp_path / "bad.jsonl")
    _write_lines(
        src,
        [
            json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
            "{not json at all",
            json.dumps({"doc_id": 2, "text": "also ok", "lang": "en"}),
        ],
    )
    df = read_jsonl(spark, src, SCHEMA)
    assert df.count() == 3  # PERMISSIVE keeps the bad line as a row
    assert corrupt_line_count(spark, src, SCHEMA) == 1
    ok = df.where(F.col("_corrupt_record").isNull())
    assert sorted(r.doc_id for r in ok.collect()) == [1, 2]


def test_failfast_raises_on_corrupt(spark, tmp_path):
    src = str(tmp_path / "bad2.jsonl")
    _write_lines(src, ['{"doc_id": 1}', "oops"])
    df = read_jsonl(spark, src, SCHEMA, mode="FAILFAST", corrupt_col=None)
    try:
        df.count()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_sharded_write_produces_uniform_shards(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    shards = write_jsonl_shards(df, out, rows_per_shard=300)
    assert shards == 4  # ceil(1000/300)
    files = glob.glob(os.path.join(out, "part-*"))
    assert len(files) == 4
    # round-robin repartition → every shard within 1 row of 250
    sizes = sorted(sum(1 for _ in open(f)) for f in files)
    assert sum(sizes) == 1000
    assert sizes[0] >= 249 and sizes[-1] <= 251
    # and the data survives the round trip
    back = read_jsonl(spark, out, "doc_id BIGINT, text STRING")
    assert back.count() == 1000
    assert corrupt_line_count(spark, out, "doc_id BIGINT, text STRING") == 0
