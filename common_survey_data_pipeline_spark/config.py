"""Pipeline configuration: dynamic, year-parameterized column names.

The reference generates per-administration column names at runtime from
``survey_year`` (``/root/reference/varinfo-update.R:38-44``):
``QualtricsVariableName.<yr>``, ``QuestionText.<yr>``,
``SurveyAdminYear.<yr>``. We reproduce that contract here as a frozen
dataclass so every operator takes explicit names instead of globals.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def generate_dynamic_columns(survey_year: str) -> dict[str, str]:
    """Per-year column names, matching varinfo-update.R:38-44."""
    return {
        "qualtrics_col_name": f"QualtricsVariableName.{survey_year}",
        "question_text_col_name": f"QuestionText.{survey_year}",
        "survey_admin_year_col_name": f"SurveyAdminYear.{survey_year}",
    }


@dataclass(frozen=True)
class PipelineConfig:
    """Configuration for one survey-administration update run.

    Mirrors the user-defined variables block of varinfo-update.R:11-15,
    minus file paths (IO is explicit at the pipeline edges, §3.4).
    """

    survey_year: str = "2025"
    survey_name: str = "experience"
    #: question-text column of the PRIOR codebook used as fuzzy-join key
    join_column_text: str = "QuestionText.2023"
    #: variable-name column of the codebook used for the second-pass join
    join_column_var: str = "ITEM_NAME"
    #: Levenshtein leniency for the fuzzy join (varinfo-update.R:15)
    max_string_distance: int = 6
    #: optional explicit recency ordering override (README.md:73)
    survey_admin_cols_in_recency_order: tuple[str, ...] | None = None
    #: dashboard projection columns (varinfo-update.R:231)
    dashboard_columns: tuple[str, ...] = field(
        default=(
            "ITEM_SECTION",
            "ITEM_STEM",
            "ITEM_MEMBER",
            "SCALE_OPTIONS",
            "ITEM_TYPE",
            "ITEM_PARENT_ID",
            "most_recent",
        )
    )

    # the per-year naming contract lives ONLY in generate_dynamic_columns
    # (varinfo-update.R:38-44); the properties delegate so a scheme
    # change cannot make the two drift

    @property
    def qualtrics_col_name(self) -> str:
        return generate_dynamic_columns(self.survey_year)["qualtrics_col_name"]

    @property
    def question_text_col_name(self) -> str:
        return generate_dynamic_columns(self.survey_year)["question_text_col_name"]

    @property
    def survey_admin_year_col_name(self) -> str:
        return generate_dynamic_columns(self.survey_year)["survey_admin_year_col_name"]
