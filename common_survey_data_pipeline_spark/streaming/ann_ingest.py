"""Streaming embedding ingestion into a persisted IVF index — the ANN
mirror of the dedup ingest service (``streaming/ingest.py``): embedding
JSONL lands in a drop directory, each micro-batch is appended to the
index through the STORED centroids (``operators/similarity.py::
append_ivf_index`` — O(batch), existing files never read), and index
health is self-maintained: when the post-append cell skew
(``ivf_cell_skew``: max/median occupancy, the pruning-health ratio)
exceeds a threshold, the service triggers ``rebalance_ivf_index``
inside the loop — the counterpart of the dedup service's
``compact_threshold_files`` auto-compaction.

Delivery semantics: index appends are guarded by a committed marker
file per batch (the ``run_ingest_vs_band_table`` recipe) — a replayed
batch whose marker exists skips the append, so crash-retry never
double-inserts vectors. The residual window (crash between append and
marker) re-appends the batch, duplicating its rows in the index;
``rebalance_ivf_index`` heals that too (its rewrite dedups vec_ids —
an index maps id → vector, duplicate ids are re-append artifacts by
construction). Marker probes go through the Hadoop FileSystem API,
never ``os.path``.

At 100 TB this is the vector-store ingest loop: the index table is the
only state; appends are partition-local writes; the rebalance is the
amortized heavy verb (bounded-sample retrain + one corpus pass),
triggered by a measured health metric rather than a wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from common_survey_data_pipeline_spark.streaming.ingest import (
    _fs_exists,
    _fs_touch,
)

#: the embedding wire schema (JSONL); mirrors the embeddings table
EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<DOUBLE>"


def stream_jsonl_embeddings(
    spark: SparkSession,
    path: str,
    schema: StructType | str = EMB_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based streaming source over an embedding JSONL drop dir."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def run_embedding_ingest(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    index_table: str,
    skew_threshold: float | None = None,
    on_stage=None,
):
    """Wire source → per-batch IVF append → skew-triggered rebalance;
    returns the StreamingQuery (caller awaits/stops it).

    The index MUST exist (``write_ivf_index`` — possibly over an empty
    seed corpus, whose empty-index guard then rejects appends until a
    rebuild; the seed requirement is the same as the band table's).
    ``skew_threshold`` (e.g. 3.0) arms the auto-rebalance: after each
    append, if max/median cell occupancy exceeds it, the quantizer
    retrains on a bounded sample of the CURRENT index contents and the
    layout rewrites in one pass — queries keep their recall contract
    across arbitrary drift without an operator in the loop.
    ``on_stage(stage, batch_id)`` is the failure-injection hook
    ("appended", "rebalanced") the kill-and-restart tests use.
    """
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
        ivf_cell_skew,
        rebalance_ivf_index,
    )

    state_dir = checkpoint_dir.rstrip("/") + "__appended"
    _stage = on_stage if on_stage is not None else (lambda *_: None)

    def _process(batch: DataFrame, batch_id: int) -> None:
        marker = f"{state_dir}/batch-{batch_id}"
        if not _fs_exists(spark, marker):
            append_ivf_index(spark, batch, index_table)
            _fs_touch(spark, marker)
        _stage("appended", batch_id)
        if skew_threshold is not None:
            mx, md = ivf_cell_skew(spark, index_table)
            if md > 0 and mx / md > skew_threshold:
                rebalance_ivf_index(spark, index_table)
        _stage("rebalanced", batch_id)

    return (
        stream_jsonl_embeddings(spark, in_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
