"""Streaming embedding ingestion into a persisted ANN index — the ANN
mirror of the dedup ingest service (``streaming/ingest.py``): embedding
JSONL lands in a drop directory, each micro-batch is appended to the
index through the STORED geometry (``operators/similarity.py::
append_ivf_index`` / ``append_ivfpq_index`` — O(batch), existing files
never read), and index health is self-maintained: when the post-append
cell skew (``ivf_cell_skew``: max/median occupancy, the pruning-health
ratio) exceeds a threshold, the service triggers the index's rebalance
verb inside the loop — the counterpart of the dedup service's
``compact_threshold_files`` auto-compaction.

Delivery semantics: EXACTLY-ONCE-EFFECT for index appends (VERDICT r9
item 2). Two markers per batch under ``<checkpoint>__appended/``:

- ``batch-<id>`` (committed): the append completed — a replayed batch
  whose committed marker exists skips the append entirely;
- ``started-<id>``: touched BEFORE the first append attempt. A replay
  that finds ``started`` without ``committed`` landed in the residual
  window (crash between the append's table commit and the marker
  touch) — the batch's rows MAY already be in the index, so the replay
  anti-joins the batch's ``vec_id``s against the index before
  appending. First deliveries never pay that scan (no ``started``
  marker → blind O(batch) append); the id-column anti-join runs only
  on the rare crash-replay path.

So crash-retry never double-inserts vectors in ANY window, without
waiting for a skew-triggered rebalance to heal duplicates (the r8
design's residual gap). Marker probes go through the Hadoop FileSystem
API, never ``os.path``.

``index_kind="ivfpq"`` (VERDICT r9 item 4) targets the composed
IVF+PQ index — the billion-vector production layout. The codes table
stores no floats, so the service also maintains the float vector store
(``corpus_table`` — the table the exact rerank and the rebalance's
retrain sample already need): per batch, floats append to the corpus
table and residual codes to the index, each side independently
guarded by the same replay anti-join; the auto-rebalance calls
``rebalance_ivfpq_index`` over the maintained corpus.

At 100 TB this is the vector-store ingest loop: the index (plus, for
ivfpq, the float store) is the only state; appends are partition-local
writes; the rebalance is the amortized heavy verb (bounded-sample
retrain + one corpus pass), triggered by a measured health metric
rather than a wall clock. The health metric itself is INCREMENTAL
(VERDICT r10 item 3): per-cell counts live in driver memory
(nlist-bounded), seeded by one full ``ivf_cell_sizes`` read at stream
start / after a rebalance, then folded per batch from the exact
per-cell increment the append verb returns — the armed probe costs
O(batch), never O(index), per micro-batch.
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


def _without_existing_ids(
    spark: SparkSession, batch: DataFrame, table: str
) -> DataFrame:
    """The replay guard: drop batch rows whose ``vec_id`` is already in
    ``table``. An id-column-pruned scan of the table — paid ONLY on the
    crash-replay path (see module doc), never per healthy batch."""
    if not spark.catalog.tableExists(table):
        return batch
    return batch.join(
        spark.table(table).select("vec_id"), "vec_id", "left_anti"
    )


def _skew_from_counts(cells: dict) -> tuple[int, float]:
    """max and interpolated median cell occupancy from a per-cell count
    dict — the same math as ``percentile(n_vectors, 0.5)`` inside
    ``operators/similarity.py::ivf_cell_skew``, over driver-held counts
    (nlist-bounded: one int per cell)."""
    vals = sorted(cells.values())
    if not vals:
        return 0, 0.0
    k = (len(vals) - 1) / 2
    f = int(k)
    md = (
        float(vals[f])
        if f == k
        else vals[f] + (vals[f + 1] - vals[f]) * (k - f)
    )
    return int(vals[-1]), float(md)


def run_embedding_ingest(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    index_table: str,
    skew_threshold: float | None = None,
    on_stage=None,
    index_kind: str = "ivf",
    corpus_table: str | None = None,
    compact_threshold_files: int | None = None,
    _skew_state: dict | None = None,
):
    """Wire source → per-batch index append → skew-triggered rebalance;
    returns the StreamingQuery (caller awaits/stops it).

    The index MUST exist (``write_ivf_index`` / ``write_ivfpq_index`` —
    possibly over an empty seed corpus, whose empty-index guard then
    rejects appends until a rebuild; the seed requirement is the same
    as the band table's). ``skew_threshold`` (e.g. 3.0) arms the
    auto-rebalance: after each append, if max/median cell occupancy
    exceeds it, the quantizer(s) retrain on a bounded sample and the
    layout rewrites in one pass — queries keep their recall contract
    across arbitrary drift without an operator in the loop.

    ``index_kind``: ``"ivf"`` (default) appends through
    ``append_ivf_index`` and rebalances with ``rebalance_ivf_index``
    (the index stores floats, so the rebalance is self-contained);
    ``"ivfpq"`` appends residual codes through ``append_ivfpq_index``
    AND maintains the float vector store ``corpus_table`` (required) —
    batch floats append there first, exactly-once by the same marker +
    replay-anti-join recipe, and the auto-rebalance retrains from it
    via ``rebalance_ivfpq_index``.

    ``compact_threshold_files`` bounds file fragmentation the same way
    the dedup service's band-table knob does: every append adds one
    file per touched cell, so a long stream makes each probed cell's
    scan open one file per batch; any batch that leaves the index
    above the threshold triggers
    ``operators/similarity.py::compact_index_files`` (back to one file
    per cell — geometry, properties, and epoch preserved, content
    byte-identical, so it composes with the replay guard and the
    rebalance untouched).

    Exactly-once-effect appends in every crash window — see the module
    doc for the two-marker recipe. ``on_stage(stage, batch_id)`` is the
    failure-injection hook the kill-and-restart tests use, called after
    each step: ``"append_uncommitted"`` (inside the residual window —
    append committed, marker not yet), ``"appended"``, ``"rebalanced"``,
    ``"compacted"``.
    """
    if index_kind not in ("ivf", "ivfpq"):
        raise ValueError(
            f"run_embedding_ingest: unknown index_kind {index_kind!r} "
            "(expected ivf | ivfpq)"
        )
    if index_kind == "ivfpq" and corpus_table is None:
        raise ValueError(
            "run_embedding_ingest(index_kind='ivfpq') needs corpus_table: "
            "the codes table stores no floats, so the service must "
            "maintain the float vector store the rerank and the "
            "rebalance retrain read"
        )
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
        append_ivfpq_index,
        compact_index_files,
        ivf_cell_sizes,
        rebalance_ivf_index,
        rebalance_ivfpq_index,
    )

    state_dir = checkpoint_dir.rstrip("/") + "__appended"
    _stage = on_stage if on_stage is not None else (lambda *_: None)
    # Incremental skew state (VERDICT r10 item 3): the armed health
    # probe used to re-aggregate the whole index's cell column every
    # micro-batch — O(index files) per batch. Now the service keeps the
    # per-cell counts in driver memory (nlist-bounded — one int per
    # cell), seeds them from ONE full ivf_cell_sizes read (stream start
    # or after a rebalance rewrote the layout), and per batch folds the
    # exact per-cell increment the append verb returns from its own
    # assigned frame — O(batch). Replays fold the post-anti-join counts
    # (what was actually written), compactions are content-identical
    # (no invalidation), and a service restart simply reseeds.
    # ``_skew_state`` lets tests inject/inspect the fold (parity vs a
    # full recompute); production callers leave it None.
    skew_state: dict = _skew_state if _skew_state is not None else {}
    skew_state.setdefault("cells", None)

    def _process(batch: DataFrame, batch_id: int) -> None:
        # the appends below run through the STREAM's cloned session
        # (the batch frame's), while every health/replay read here uses
        # the captured outer session — whose relation cache, once
        # primed, never sees the clone's inserts (measured: file counts
        # and skew frozen at their first-batch values across a 7-batch
        # stream, and a compaction rewriting from that stale snapshot
        # silently dropped every later append). Refresh the cached
        # listings before reading anything.
        spark.catalog.refreshTable(index_table)
        if corpus_table is not None and spark.catalog.tableExists(
            corpus_table
        ):
            spark.catalog.refreshTable(corpus_table)
        committed = f"{state_dir}/batch-{batch_id}"
        started = f"{state_dir}/started-{batch_id}"
        want_counts = skew_threshold is not None
        appended_counts: dict | None = None
        if not _fs_exists(spark, committed):
            replaying = _fs_exists(spark, started)
            if not replaying:
                _fs_touch(spark, started)
            if index_kind == "ivf":
                b = batch
                if replaying:
                    b = _without_existing_ids(spark, b, index_table)
                appended_counts = append_ivf_index(
                    spark, b, index_table, return_cell_counts=want_counts
                )
            else:
                # two appends per batch — pin the source frame once
                batch = batch.localCheckpoint(eager=True)
                # floats first: each side guards itself independently,
                # so any crash ordering replays clean
                bf = batch
                if replaying:
                    bf = _without_existing_ids(spark, bf, corpus_table)
                bf.select("vec_id", "embedding").write.mode(
                    "append"
                ).saveAsTable(corpus_table)
                bc = batch
                if replaying:
                    bc = _without_existing_ids(spark, bc, index_table)
                appended_counts = append_ivfpq_index(
                    spark, bc, index_table, return_cell_counts=want_counts
                )
            _stage("append_uncommitted", batch_id)
            _fs_touch(spark, committed)
            # a replay's anti-join above re-primed the outer cache
            # BEFORE the append — drop it again so the health reads
            # below see the batch's own rows
            spark.catalog.refreshTable(index_table)
        _stage("appended", batch_id)
        if skew_threshold is not None:
            if skew_state["cells"] is None:
                # ONE full per-cell read (stream start / post-rebalance)
                skew_state["cells"] = {
                    int(r["cell"]): int(r["n_vectors"])
                    for r in ivf_cell_sizes(spark, index_table).collect()
                }
            elif appended_counts:
                for cell, k in appended_counts.items():
                    skew_state["cells"][cell] = (
                        skew_state["cells"].get(cell, 0) + k
                    )
            mx, md = _skew_from_counts(skew_state["cells"])
            if md > 0 and mx / md > skew_threshold:
                if index_kind == "ivf":
                    rebalance_ivf_index(spark, index_table)
                else:
                    rebalance_ivfpq_index(
                        spark, spark.table(corpus_table), index_table
                    )
                # the rebalance rewrote every cell — reseed lazily
                skew_state["cells"] = None
        _stage("rebalanced", batch_id)
        if (
            compact_threshold_files is not None
            and len(spark.table(index_table).inputFiles())
            > compact_threshold_files
        ):
            compact_index_files(spark, index_table)
        _stage("compacted", batch_id)

    return (
        stream_jsonl_embeddings(spark, in_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
