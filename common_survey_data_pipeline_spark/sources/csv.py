"""CSV source/sink with a readr-compatible profile.

The reference loads every file with R readr ``read_csv`` defaults
(``/root/reference/varinfo-update.R:54,239,247``). The behaviors that
matter for semantic parity (SURVEY.md §2.1 S1-S2):

* header row supplies column names; duplicate names are repaired
  (readr name_repair="unique" produces ``name...<idx>``; we produce
  ``name_<idx>`` — documented divergence, deterministic),
* the literal cell ``NA`` and the empty cell both parse to NULL,
* quoted fields may contain embedded newlines (``multiLine``) and
  doubled quotes (``escape='"'``),
* no type inference — every column is a string (the reference treats
  all values as character; SURVEY.md §1.2).

The sink mirrors readr ``write_csv``: single file, header, minimal
quoting, NULL → empty cell. Single-file output is a deliberate
reference-parity choice for small metadata tables only — the engine's
native sink at scale is partitioned Parquet.
"""

from __future__ import annotations

import csv
import glob
import io
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def repair_duplicate_names(names: list[str]) -> list[str]:
    """Deterministically deduplicate column names: second occurrence of
    ``x`` becomes ``x_2``, third ``x_3`` ... (readr would emit ``x...2``;
    dots are hostile inside Spark column references, so we use ``_``)."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for n in names:
        if n in seen:
            seen[n] += 1
            candidate = f"{n}_{seen[n]}"
            while candidate in seen:
                seen[n] += 1
                candidate = f"{n}_{seen[n]}"
            out.append(candidate)
            seen[candidate] = 1
        else:
            seen[n] = 1
            out.append(n)
    return out


def _read_header(path: str) -> list[str]:
    """Parse the first CSV record (the header) driver-side.

    Uses Python's csv module so embedded quotes/commas in header names are
    handled identically to the data-plane parser. Reading one record from
    local or mounted storage is O(header) and never touches data rows.
    """
    with open(path, newline="", encoding="utf-8-sig") as fh:
        reader = csv.reader(fh)
        return next(reader)


def read_csv_readr(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read a CSV with the readr-equivalent profile (all-string schema).

    An explicit all-string schema (built from the repaired header) is
    supplied so Spark skips inference entirely and duplicate header names
    cannot collide. ``nullValue='NA'`` covers the literal ``NA`` token;
    empty cells parse to NULL for string columns by Spark default. Quoted
    empty strings ``""`` are normalized to NULL in a post-pass to match
    readr (both ``""`` and ``NA`` → missing; SURVEY.md §1.2).
    """
    if schema is None:
        names = repair_duplicate_names(_read_header(path))
        schema = StructType([StructField(n, StringType(), True) for n in names])
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("nullValue", "NA")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    # readr: "" and NA are both missing. Spark reads quoted "" as empty
    # string; normalize to NULL so downstream NA-semantics translations
    # (SURVEY.md §2.2 P5) see one missing representation.
    return df.select(
        *[
            F.when(F.col(f"`{c}`") == "", None).otherwise(F.col(f"`{c}`")).alias(c)
            for c in df.columns
        ]
    )


def write_csv_single_file(df: DataFrame, path: str, header: bool = True) -> None:
    """Write ``df`` as ONE csv file at ``path`` (readr write_csv parity).

    Spark writes a directory of part files; we coalesce to a single
    partition and move the part file into place. Only for metadata-scale
    outputs (the reference's four sinks, varinfo-update.R:150-253) — at
    engine scale use ``df.write.parquet`` and keep partitioning.
    """
    tmpdir = tempfile.mkdtemp(prefix="csdp_csv_")
    try:
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", header)
            .option("escape", '"')
            .option("emptyValue", "")
            .option("nullValue", "")
            .csv(tmpdir + "/out")
        )
        part = glob.glob(tmpdir + "/out/part-*.csv")[0]
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        shutil.move(part, path)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def read_csv_header_and_first_row(
    spark: SparkSession, path: str
) -> tuple[list[str], list[str | None]]:
    """Return (repaired header names, first data row as strings).

    Driver-side helper for the wide→long metadata extraction (SURVEY.md
    §2.1 S3): the Qualtrics transpose needs only the header and row 1, so
    we avoid scanning response rows entirely — the "planner" version of
    the reference's eager full-file read (varinfo-update.R:54-58).
    Values equal to ``""`` or ``"NA"`` become None (readr parity).
    """
    names = repair_duplicate_names(_read_header(path))
    with open(path, newline="", encoding="utf-8-sig") as fh:
        reader = csv.reader(fh)
        next(reader)  # header
        try:
            first = next(reader)
        except StopIteration:
            first = []
    # pad/truncate to header width, normalize missing tokens
    row: list[str | None] = []
    for i in range(len(names)):
        v = first[i] if i < len(first) else None
        row.append(None if v in ("", "NA", None) else v)
    return names, row
