"""Wide ↔ long reshaping of the per-administration codebook schema.

The reference's codebook grows 2-3 columns per survey year
(``SurveyAdminYear2023``/``QuestionText.2023`` pairs — note the
historical dot/no-dot naming inconsistency the digit-extraction
tolerates, ``/root/reference/varinfo-update.R:164-168``). Unbounded wide
schemas don't survive 100 TB or hundreds of administrations (SURVEY.md
§1.2), so the engine offers a normalized LONG twin:

    (ITEM_NAME, <core cols...>, year, admin_value, question_text)

one row per (item, administration) — partitionable BY year, stable
schema forever — with lossless conversion both ways. The wide form
remains the reference-faithful interchange format.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the codebook's fixed identity core (SURVEY.md §1.1)
CORE_COLUMNS = (
    "ITEM_NAME",
    "ITEM_TYPE",
    "ITEM_PRESENTATION_TYPE",
    "ITEM_SECTION",
    "ITEM_PARENT_ID",
    "ITEM_STEM",
    "ITEM_MEMBER",
    "SCALE_OPTIONS",
)

_QT_RE = re.compile(r"^QuestionText\.(\d+)$")


def discover_year_columns(columns: Sequence[str]) -> dict[str, dict[str, str]]:
    """Map year → {question_text: col, admin: col} from a wide codebook's
    columns, tolerating both ``SurveyAdminYear2023`` and
    ``SurveyAdminYear.2023`` spellings."""
    years: dict[str, dict[str, str]] = {}
    for c in columns:
        m = _QT_RE.match(c)
        if m:
            years.setdefault(m.group(1), {})["question_text"] = c
    for c in columns:
        if c.startswith("SurveyAdmin"):
            digits = "".join(re.findall(r"\d+", c))
            if digits in years:
                years[digits]["admin"] = c
    return years


def codebook_to_long(wide: DataFrame, keep_empty_years: bool = False) -> DataFrame:
    """Wide codebook → long (one row per item × administration).

    ``keep_empty_years=False`` (default) drops (item, year) rows where
    both the admin value and question text are NULL — an item simply not
    present in that administration — which is what makes the long form
    sparse-friendly; set True for strict positional roundtrips.
    """
    years = discover_year_columns(wide.columns)
    if not years:
        # exploding an empty array would silently emit ZERO rows —
        # every item would vanish; an unrecognized column layout must
        # be loud, not an empty codebook
        raise ValueError(
            "codebook_to_long: no administration-year columns recognized "
            f"in {wide.columns!r} (expected 'QuestionText.<year>' / "
            "'SurveyAdminYear<year>' style names)"
        )
    core = [c for c in wide.columns if c in CORE_COLUMNS]
    entries = []
    for yr in sorted(years):
        cols = years[yr]
        qt = F.col(f"`{cols['question_text']}`") if "question_text" in cols else F.lit(None)
        ad = F.col(f"`{cols['admin']}`") if "admin" in cols else F.lit(None)
        entries.append(
            F.struct(
                F.lit(yr).alias("year"),
                ad.cast("string").alias("admin_value"),
                qt.cast("string").alias("question_text"),
            )
        )
    out = wide.select(
        *[F.col(f"`{c}`") for c in core], F.explode(F.array(*entries)).alias("__e")
    ).select(
        *core,
        F.col("__e.year").alias("year"),
        F.col("__e.admin_value").alias("admin_value"),
        F.col("__e.question_text").alias("question_text"),
    )
    if not keep_empty_years:
        out = out.where(
            F.col("admin_value").isNotNull() | F.col("question_text").isNotNull()
        )
    return out


def codebook_to_wide(
    long_df: DataFrame,
    admin_col_format: str = "SurveyAdminYear{year}",
    question_col_format: str = "QuestionText.{year}",
) -> DataFrame:
    """Long codebook → wide (one row per item, per-year column pairs).

    Column names follow the given formats (defaults match the
    reference's historical no-dot admin spelling). The pivot is on a
    driver-collected year list, so the output schema is deterministic
    and the pivot needs no extra distinct pass.
    """
    years = sorted(
        r["year"] for r in long_df.select("year").distinct().collect()
    )
    core = [c for c in long_df.columns if c in CORE_COLUMNS]
    agg = long_df.groupBy(*[F.col(f"`{c}`") for c in core]).pivot("year", years).agg(
        F.first("admin_value", ignorenulls=True).alias("admin"),
        F.first("question_text", ignorenulls=True).alias("qt"),
    )
    renames = {}
    for yr in years:
        renames[f"{yr}_admin"] = admin_col_format.format(year=yr)
        renames[f"{yr}_qt"] = question_col_format.format(year=yr)
    out = agg
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out
