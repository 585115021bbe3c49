"""Two-command CLI for the varinfo pipeline.

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

    for s in (prep, fin):
        s.add_argument("--survey-year", default="2025")
        s.add_argument("--join-column-text", default=None)
        s.add_argument("--max-string-distance", type=int, default=None)

    args = p.parse_args(argv)
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
