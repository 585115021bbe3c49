"""Streaming embedding ingestion (streaming/ann_ingest.py): per-batch
IVF appends through stored centroids, marker-guarded idempotency on
crash-replay, and skew-triggered auto-rebalance."""

import json

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.sources.tables import load_table
from common_survey_data_pipeline_spark.streaming.ann_ingest import (
    run_embedding_ingest,
)


def _drop_table(spark, *tables):
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def _drop_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        for vec_id, emb in rows:
            fh.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")


def _emb_rows(df):
    return [(r["vec_id"], list(r["embedding"])) for r in df.collect()]


def _index_ids(spark, table):
    return sorted(r["vec_id"] for r in spark.table(table).collect())


def test_stream_appends_match_batch_twin_and_recall(spark, sf_dir, tmp_path):
    from common_survey_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.where(F.col("vec_id") % 2 == 0)
    later = emb.where(F.col("vec_id") % 2 == 1)
    t = "ann_ingest_stream"
    _drop_table(spark, t, f"{t}__centroids")
    write_ivf_index(spark, seed, t, nlist=8)
    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    rows = _emb_rows(later)
    half = len(rows) // 2
    _drop_jsonl(in_dir / "b0.jsonl", rows[:half])
    _drop_jsonl(in_dir / "b1.jsonl", rows[half:])
    q = run_embedding_ingest(spark, str(in_dir), str(tmp_path / "ckpt"), t)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # every streamed vector landed exactly once
    assert _index_ids(spark, t) == sorted(
        r["vec_id"] for r in emb.collect()
    )
    # recall contract holds across the streamed appends
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann = {
        (r.query_id, r.vec_id)
        for r in ivf_topk_from_index(spark, t, qs, k=10, nprobe=8).collect()
    }
    exact = {
        (r.query_id, r.vec_id) for r in cosine_topk(emb, qs, k=10).collect()
    }
    assert len(ann & exact) / len(exact) >= 0.9
    _drop_table(spark, t, f"{t}__centroids")


def test_crash_replay_does_not_duplicate_appends(spark, sf_dir, tmp_path):
    from common_survey_data_pipeline_spark.operators.similarity import (
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.where(F.col("vec_id") % 2 == 0)
    later = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 100))
    t = "ann_ingest_crash"
    _drop_table(spark, t, f"{t}__centroids")
    write_ivf_index(spark, seed, t, nlist=8)
    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    rows = _emb_rows(later)
    _drop_jsonl(in_dir / "b0.jsonl", rows[: len(rows) // 2])
    _drop_jsonl(in_dir / "b1.jsonl", rows[len(rows) // 2 :])

    class Boom(Exception):
        pass

    def bomb(stage, batch_id):
        # detonate AFTER batch 1's append committed its marker but
        # before the checkpoint commit — the replay must skip the
        # append instead of double-inserting
        if stage == "appended" and batch_id == 1:
            raise Boom("injected crash after append")

    q = run_embedding_ingest(
        spark, str(in_dir), str(tmp_path / "ckpt"), t, on_stage=bomb
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    q2 = run_embedding_ingest(spark, str(in_dir), str(tmp_path / "ckpt"), t)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    want = sorted(
        r["vec_id"]
        for r in seed.unionByName(later).select("vec_id").collect()
    )
    assert _index_ids(spark, t) == want  # no duplicates, nothing lost
    _drop_table(spark, t, f"{t}__centroids")


def test_skew_triggers_rebalance_and_recall_holds(spark, sf_dir, tmp_path):
    from common_survey_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_cell_skew,
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.where(F.col("vec_id") % 2 == 0)
    drifted = emb.where(F.col("vec_id") % 2 == 1).withColumn(
        "embedding", F.transform("embedding", lambda x: F.abs(x))
    )
    t = "ann_ingest_skew"
    _drop_table(spark, t, f"{t}__centroids")
    write_ivf_index(spark, seed, t, nlist=8)
    epoch0 = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
    }["ivf.epoch"]
    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    _drop_jsonl(in_dir / "b0.jsonl", _emb_rows(drifted))
    q = run_embedding_ingest(
        spark, str(in_dir), str(tmp_path / "ckpt"), t, skew_threshold=2.0
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the drifted append pushed skew past the threshold inside the
    # loop, so the service rebalanced: epoch bumped, skew healed
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
    }
    assert int(props["ivf.epoch"]) > int(epoch0)
    mx, md = ivf_cell_skew(spark, t)
    assert md > 0 and mx / md <= 2.5, (mx, md)
    corpus = seed.unionByName(drifted)
    qs = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann = {
        (r.query_id, r.vec_id)
        for r in ivf_topk_from_index(spark, t, qs, k=10, nprobe=7).collect()
    }
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(corpus, qs, k=10).collect()
    }
    assert len(ann & exact) / len(exact) >= 0.9
    _drop_table(spark, t, f"{t}__centroids")
