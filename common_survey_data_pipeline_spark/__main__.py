"""CLI for the engine.

Reference workflow (two commands around the human-in-the-loop CSV edit,
see below) plus engine utilities: ``query`` runs any registry operator
against a parquet table directory, ``compact`` is the small-files
maintenance job.

The reference's workflow is "run the script, stop, hand-edit a CSV,
re-run the script" (``/root/reference/README.md:41-43``); the implicit
human-in-the-loop checkpoint becomes two explicit commands (SURVEY.md
§3.4):

    python -m common_survey_data_pipeline_spark prepare \
        --responses raw_qualtrics.csv --prior prior_varinfo.csv \
        --manual-out needs_manual_update.csv --unmatched-out unmatched.csv \
        --survey-year 2025

    # ... human edits needs_manual_update.csv ...

    python -m common_survey_data_pipeline_spark finalize \
        --manual manually_updated.csv \
        --out cumulative_varinfo.csv --dashboard-out dashboard.csv \
        --survey-year 2025
"""

from __future__ import annotations

import argparse
import sys

from common_survey_data_pipeline_spark.config import PipelineConfig
from common_survey_data_pipeline_spark.session import get_spark


def _config(args: argparse.Namespace) -> PipelineConfig:
    kwargs = {"survey_year": args.survey_year}
    if args.join_column_text:
        kwargs["join_column_text"] = args.join_column_text
    if args.max_string_distance is not None:
        kwargs["max_string_distance"] = args.max_string_distance
    return PipelineConfig(**kwargs)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="common_survey_data_pipeline_spark")
    sub = p.add_subparsers(dest="command", required=True)

    prep = sub.add_parser("prepare", help="steps 1-2: extract + join + export manual files")
    prep.add_argument("--responses", required=True)
    prep.add_argument("--prior", required=True)
    prep.add_argument("--manual-out", required=True)
    prep.add_argument("--unmatched-out", required=True)

    fin = sub.add_parser("finalize", help="steps 3-6: recency sort + outputs")
    fin.add_argument("--manual", required=True)
    fin.add_argument("--out", required=True)
    fin.add_argument("--dashboard-out", required=True)

    q = sub.add_parser(
        "query",
        help="run a registry operator (see `query --list`) over a table dir",
    )
    q.add_argument("--name", default=None, help="registry query name")
    q.add_argument(
        "--data",
        default=None,
        help="directory of *.parquet tables (default: $SPARK_GRAFT_SF_DIR "
        "or /root/testdata/sf0.1)",
    )
    q.add_argument("--out", default=None, help="write result parquet here (default: show)")
    q.add_argument("--list", action="store_true", help="list available queries")
    q.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of executing",
    )

    comp = sub.add_parser("compact", help="small-files maintenance rewrite")
    comp.add_argument("--src", required=True)
    comp.add_argument("--dst", required=True)
    comp.add_argument("--target-rows-per-file", type=int, default=1_000_000)
    comp.add_argument("--sort-by", default=None, help="comma-separated columns")

    for s in (prep, fin):
        s.add_argument("--survey-year", default="2025")
        s.add_argument("--join-column-text", default=None)
        s.add_argument("--max-string-distance", type=int, default=None)

    args = p.parse_args(argv)

    if args.command == "query":
        from common_survey_data_pipeline_spark.workload import REGISTRY

        if args.list or not args.name:
            try:
                for name in REGISTRY:
                    print(name)
            except BrokenPipeError:  # `... | head` closed the pipe
                pass
            return 0
        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; see `query --list`", file=sys.stderr)
            return 2
        from common_survey_data_pipeline_spark.sources.tables import (
            DEFAULT_SF_DIR,
        )

        spark = get_spark(app_name=f"csdp-query-{args.name}")
        df = REGISTRY[args.name].fn(spark, args.data or DEFAULT_SF_DIR)
        if args.explain:
            from common_survey_data_pipeline_spark.plans import plan_of

            print(plan_of(df))
            return 0
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            df.show(50, truncate=False)
        return 0

    if args.command == "compact":
        from common_survey_data_pipeline_spark.sources.parquet_sink import (
            compact_parquet,
            file_fragmentation_report,
        )

        spark = get_spark(app_name="csdp-compact")
        before = file_fragmentation_report(spark, args.src)
        n = compact_parquet(
            spark, args.src, args.dst, args.target_rows_per_file,
            sort_within_by=args.sort_by.split(",") if args.sort_by else (),
        )
        print(f"{before['n_files']} files -> {n} files at {args.dst}")
        return 0

    spark = get_spark(app_name=f"csdp-{args.command}")
    config = _config(args)

    from common_survey_data_pipeline_spark import pipeline

    if args.command == "prepare":
        stats = pipeline.prepare(
            spark, args.responses, args.prior, args.manual_out,
            args.unmatched_out, config,
        )
        print(
            f"matched {stats['total_matched']}/{stats['total']} "
            f"({stats['exact']} exact, {stats['fuzzy']} fuzzy, "
            f"{stats['still_unmatched']} unmatched after variable-name pass)"
        )
        print(f"wrote {args.manual_out} — review/correct it, then run finalize")
    else:
        rank = pipeline.finalize(
            spark, args.manual, args.out, args.dashboard_out, config
        )
        order = ", ".join(sorted(rank, key=rank.get))
        print(f"recency order: {order}")
        print(f"wrote {args.out} and {args.dashboard_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
