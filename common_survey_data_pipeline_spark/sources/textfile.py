"""Plain-text corpus source — one document per line (the WebText /
C4-style raw dump format that precedes any structured serialization).

``spark.read.text`` is already splittable and distributed; what this
module adds is the corpus CONTRACT on top of it: provenance
(``src_file``), a deterministic content-addressed ``doc_id``, and
blank-line hygiene — the pieces a downstream dedup/curation pipeline
(`operators/dedup.py`, `operators/curation.py`) expects from the
`documents` table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    drop_blank: bool = True,
) -> DataFrame:
    """Read line-delimited text files into ``(doc_id, text, src_file)``.

    ``doc_id = xxhash64(src_file, text)`` is content-addressed and
    therefore STABLE across reruns, partitionings and cluster sizes —
    unlike ``monotonically_increasing_id()``, whose values depend on
    task layout. The flip side is the contract: byte-identical lines in
    the same file share one id, i.e. within-file exact duplicates
    collapse at id level — for a dedup pipeline that is the point; add
    a position column upstream if duplicates must stay distinct.
    """
    out = (
        spark.read.text(path)
        .select(
            F.col("value").alias("text"),
            F.input_file_name().alias("src_file"),
        )
    )
    if drop_blank:
        out = out.where(F.trim(F.col("text")) != "")
    return out.select(
        F.xxhash64("src_file", "text").alias("doc_id"), "text", "src_file"
    )


def write_text_corpus(df: DataFrame, text_col: str, path: str, shards: int | None = None) -> None:
    """Write one document per line. Newlines inside documents would
    corrupt the framing, so they are escaped to ``\\n`` — the standard
    flat-text convention; `read_text_corpus` consumers that need exact
    round-trips should use the JSONL sink instead (`jsonl.py`)."""
    out = df.select(
        F.regexp_replace(F.col(text_col), "\n", "\\\\n").alias("value")
    )
    if shards:
        out = out.repartition(shards)
    out.write.mode("overwrite").text(path)
