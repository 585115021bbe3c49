"""readr-profile CSV source semantics (SURVEY.md §2.1 S1-S2)."""

import os

from common_survey_data_pipeline_spark.sources.csv import (
    read_csv_readr,
    repair_duplicate_names,
    write_csv_single_file,
)


def test_repair_duplicate_names():
    assert repair_duplicate_names(["a", "b", "a", "a"]) == ["a", "b", "a_2", "a_3"]
    assert repair_duplicate_names(["a", "a_2", "a"]) == ["a", "a_2", "a_3"]
    assert repair_duplicate_names([]) == []


def test_na_and_empty_are_null(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write('x,y,z\nNA,"",v\n,"NA",w\n')
    df = read_csv_readr(spark, p)
    rows = df.collect()
    assert [r["x"] for r in rows] == [None, None]
    assert [r["y"] for r in rows] == [None, None]
    assert [r["z"] for r in rows] == ["v", "w"]
    # all-string schema, no inference
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)


def test_multiline_and_escaped_quotes(spark, tmp_path):
    p = str(tmp_path / "m.csv")
    with open(p, "w") as f:
        f.write('a,b\n"line1\nline2","he said ""hi"", ok"\n')
    df = read_csv_readr(spark, p)
    row = df.collect()[0]
    assert row["a"] == "line1\nline2"
    assert row["b"] == 'he said "hi", ok'


def test_single_file_roundtrip(spark, tmp_path):
    p = str(tmp_path / "rt.csv")
    df = spark.createDataFrame(
        [("x", None), ("embedded\nnewline", 'q"uote')], ["c1", "c2"]
    )
    write_csv_single_file(df, p)
    assert os.path.isfile(p)
    back = read_csv_readr(spark, p)
    got = {(r["c1"], r["c2"]) for r in back.collect()}
    assert got == {("x", None), ("embedded\nnewline", 'q"uote')}
