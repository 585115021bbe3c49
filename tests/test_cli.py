"""CLI surface: query runner and compaction subcommands."""

from __future__ import annotations

from common_survey_data_pipeline_spark.__main__ import main
from common_survey_data_pipeline_spark.sources.tables import load_table


def test_cli_query_list(capsys):
    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "q5_region_nation_revenue" in out and len(out) > 100


def test_cli_query_unknown_name(capsys):
    assert main(["query", "--name", "nope", "--data", "/tmp"]) == 2


def test_cli_query_writes_parquet(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "q5_out")
    rc = main(
        ["query", "--name", "q5_region_nation_revenue", "--data", sf_dir,
         "--out", out]
    )
    assert rc == 0
    from common_survey_data_pipeline_spark.workload import REGISTRY

    want = REGISTRY["q5_region_nation_revenue"].fn(spark, sf_dir).count()
    assert spark.read.parquet(out).count() == want > 0


def test_cli_compact(spark, sf_dir, tmp_path, capsys):
    src = str(tmp_path / "frag")
    load_table(spark, sf_dir, "documents").repartition(10).write.parquet(src)
    dst = str(tmp_path / "tidy")
    rc = main(
        ["compact", "--src", src, "--dst", dst,
         "--target-rows-per-file", "1000000"]
    )
    assert rc == 0
    assert "-> 1 files" in capsys.readouterr().out
    assert spark.read.parquet(dst).count() == 500


def test_cli_query_without_data_uses_default_dir(spark, capsys):
    """--data is optional: the query runner falls back to
    DEFAULT_SF_DIR instead of crashing on os.path.join(None, ...)."""
    assert main(["query", "--name", "s1_scan_filter_project", "--explain"]) == 0
    assert "Scan" in capsys.readouterr().out
