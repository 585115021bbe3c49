"""The end-to-end varinfo pipeline: the reference's two-phase workflow
as explicit DataFrame transforms (SURVEY.md §3).

Phase A (``prepare``): extract new-survey variable metadata, fuzzy-join
onto the prior codebook, coalescing second-pass join on variable name,
anti-join unmatched report, export the two manual-correction files
(varinfo-update.R steps 1-2, :238-244).

Phase B (``finalize``): read the manually corrected codebook, recency-
sort, write the cumulative output and the trimmed dashboard view
(steps 3-6, :247-256).

The human-in-the-loop checkpoint that is implicit in "re-run the script"
in the reference (README.md:41-43) is explicit here: two functions, two
invocations.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from common_survey_data_pipeline_spark.config import PipelineConfig
from common_survey_data_pipeline_spark.operators.coalesce_join import coalesce_left_join
from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    keep_best_match,
    stringdist_left_join,
    with_row_id,
)
from common_survey_data_pipeline_spark.operators.joins import anti_join
from common_survey_data_pipeline_spark.operators.recency import ADMIN_ITEM_TYPES, sort_varinfo
from common_survey_data_pipeline_spark.operators.stats import fuzzy_match_stats, total_match_stats
from common_survey_data_pipeline_spark.sources.csv import (
    read_csv_header_and_first_row,
    read_csv_readr,
    write_csv_single_file,
)

log = logging.getLogger(__name__)


def load_survey_column_info(
    spark: SparkSession, response_file: str, config: PipelineConfig
) -> DataFrame:
    """Wide→long metadata extraction + sentinel row (SURVEY.md §2.1
    S3+S4; varinfo-update.R:53-64).

    Builds the 3-column ``column_info`` frame from the Qualtrics export's
    header row (variable names) and first data row (question texts), plus
    the constant administration year, then appends a sentinel row with
    empty question text so blank-text codebook rows fuzzy-match at
    distance 0 instead of to an arbitrary short text.

    Only the header and row 1 are read — the response rows never leave
    disk (the reference parses the whole file eagerly; a planner prunes
    that scan, SURVEY.md §4.1).
    """
    names, first_row = read_csv_header_and_first_row(spark, response_file)
    rows = [(n, t, config.survey_year) for n, t in zip(names, first_row)]
    rows.append((None, "", None))  # sentinel (varinfo-update.R:61)
    schema = StructType(
        [
            StructField(config.qualtrics_col_name, StringType(), True),
            StructField(config.question_text_col_name, StringType(), True),
            StructField(config.survey_admin_year_col_name, StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def join_varinfo(
    prior_varinfo: DataFrame,
    column_info: DataFrame,
    config: PipelineConfig,
    strategy: str = "broadcast",
) -> tuple[DataFrame, dict[str, int]]:
    """Fuzzy text join + best-match dedup + coalescing variable-name
    join (varinfo-update.R:93-139). Returns (joined codebook, stats).
    """
    total_rows = column_info.count()

    with_id = with_row_id(prior_varinfo, "row_id")
    filled = with_id.withColumn(
        config.join_column_text,
        F.coalesce(F.col(f"`{config.join_column_text}`"), F.lit("")),
    )
    fuzzy = stringdist_left_join(
        filled,
        column_info,
        left_on=config.join_column_text,
        right_on=config.question_text_col_name,
        max_dist=config.max_string_distance,
        strategy=strategy,
    )
    # deterministic tiebreak on the matched variable name (the reference
    # relies on nondeterministic join order here — SURVEY.md §2.3 J2)
    fuzzy_best = keep_best_match(
        fuzzy,
        ["row_id"],
        tiebreakers=[F.col(f"`{config.qualtrics_col_name}`").asc_nulls_last()],
    )
    stats = fuzzy_match_stats(fuzzy_best, total_rows, config.qualtrics_col_name)
    log.info(
        "Fuzzy text join (max distance = %d): %d exact, %d fuzzy, %d unmatched (out of %d).",
        config.max_string_distance,
        stats["exact"],
        stats["fuzzy"],
        stats["unmatched"],
        stats["total"],
    )

    joined = coalesce_left_join(
        fuzzy_best,
        column_info,
        left_on=config.join_column_var,
        right_on=config.qualtrics_col_name,
        broadcast_right=True,
    )
    stats2 = total_match_stats(
        joined, total_rows, config.qualtrics_col_name, stats["unmatched"]
    )
    log.info(
        "After variable-name join: %d additional matches, %d total matched, "
        "%d still unmatched (out of %d).",
        stats2["additional_matches"],
        stats2["total_matched"],
        stats2["still_unmatched"],
        stats2["total"],
    )
    stats.update(stats2)
    return joined, stats


def get_unmatched(
    column_info: DataFrame, joined: DataFrame, config: PipelineConfig
) -> DataFrame:
    """New-survey variables with no match in the joined codebook
    (varinfo-update.R:142-145)."""
    return anti_join(
        column_info, joined, left_on=config.qualtrics_col_name, broadcast_right=False
    )


def generate_dashboard_data(
    sorted_varinfo: DataFrame, config: PipelineConfig
) -> DataFrame:
    """Trimmed dashboard view (varinfo-update.R:226-233).

    R NA semantics, hand-translated (SURVEY.md §2.2 P5): ``!ITEM_TYPE
    %in% set`` KEEPS NA rows (R ``%in%`` is FALSE for NA) → Spark needs
    an explicit ``isNull`` escape; ``ITEM_NAME != "CONSENT"`` DROPS NA
    rows in both systems (NULL comparison is not-true).
    """
    keep_type = (~F.col("ITEM_TYPE").isin(*ADMIN_ITEM_TYPES)) | F.col("ITEM_TYPE").isNull()
    keep_name = F.col(f"`{config.join_column_var}`") != "CONSENT"
    wanted = [config.join_column_var, *config.dashboard_columns]
    present = [c for c in wanted if c in sorted_varinfo.columns]  # any_of semantics
    return sorted_varinfo.where(keep_type & keep_name).select(
        *[F.col(f"`{c}`") for c in present]
    )


def prepare(
    spark: SparkSession,
    response_file: str,
    prior_varinfo_file: str,
    needs_manual_update_file: str,
    unmatched_vars_file: str,
    config: PipelineConfig | None = None,
) -> dict[str, int]:
    """Phase A: steps 1-2 of the reference main script
    (varinfo-update.R:238-244). Writes the manual-update CSV and the
    unmatched-variables CSV; returns join stats."""
    config = config or PipelineConfig()
    column_info = load_survey_column_info(spark, response_file, config)
    prior = read_csv_readr(spark, prior_varinfo_file)
    joined, stats = join_varinfo(prior, column_info, config)
    unmatched = get_unmatched(column_info, joined, config)
    write_csv_single_file(joined, needs_manual_update_file)
    write_csv_single_file(unmatched, unmatched_vars_file)
    return stats


def finalize(
    spark: SparkSession,
    manually_updated_file: str,
    output_file: str,
    trimmed_output_file: str,
    config: PipelineConfig | None = None,
) -> dict[str, int]:
    """Phase B: steps 3-6 (varinfo-update.R:247-256). Returns the
    recency rank map."""
    config = config or PipelineConfig()
    updated = read_csv_readr(spark, manually_updated_file)
    sorted_vi, rank = sort_varinfo(
        updated, config.survey_admin_cols_in_recency_order
    )
    write_csv_single_file(sorted_vi, output_file)
    dashboard = generate_dashboard_data(sorted_vi, config)
    write_csv_single_file(dashboard, trimmed_output_file)
    return rank
