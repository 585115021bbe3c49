"""Persisted IVF index: query-time must read ONLY the probed cells'
partitions (plan-locked partition pruning), reproduce the transient
``ivf_topk`` at equal parameters, and do zero training at query time."""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    ivf_topk_from_index,
    write_ivf_index,
)
from common_survey_data_pipeline_spark.sources.tables import load_table

TABLE = "ivf_index_test"
NLIST = 8


def _drop(spark, *tables):
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _drop(spark, TABLE, f"{TABLE}__centroids")
    write_ivf_index(spark, emb, TABLE, nlist=NLIST)
    yield emb
    _drop(spark, TABLE, f"{TABLE}__centroids")


@pytest.fixture(scope="module")
def queries(index):
    return index.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_full_probe_reproduces_exact(spark, index, queries):
    got = sorted(
        map(
            tuple,
            ivf_topk_from_index(
                spark, TABLE, queries, k=10, nprobe=NLIST
            ).collect(),
        )
    )
    want = sorted(map(tuple, cosine_topk(index, queries, k=10).collect()))
    assert got == want


def test_partial_probe_recall(spark, index, queries):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(index, queries, k=10).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk_from_index(
            spark, TABLE, queries, k=10, nprobe=6
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.7


def test_scan_prunes_to_probed_partitions(spark, index, queries):
    """The whole point of persisting: a query's scan must read only
    the probed cells' directories. Locked on the scan node's partition
    count, not just the filter string."""
    import re

    ann = ivf_topk_from_index(spark, TABLE, queries, k=10, nprobe=2)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        l for l in plan.splitlines() if TABLE in l and "FileScan" in l
    ]
    assert scan_lines, plan
    # the IN filter on the partition column reached the plan…
    assert re.search(r"cell#\d+ IN \(", plan), plan
    # …and the scan's file index holds strictly fewer directories than
    # nlist: unprobed cells' files are never read. (nprobe=2 over 5
    # queries can probe at most 10 distinct cells, usually far fewer.)
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", scan_lines[0])
    assert m, scan_lines[0]
    assert int(m.group(1)) < NLIST, scan_lines[0]


def test_table_properties_recorded(spark, index):
    rows = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {TABLE}").collect()
    }
    assert rows.get("ivf.nlist") == str(NLIST)
    assert "ivf.seed" in rows


def test_append_assigns_to_nearest_stored_centroid(spark, sf_dir):
    """Appended vectors must land in the cell of their nearest STORED
    centroid (recomputed driver-side), and the original index files
    stay byte-identical (append never rewrites)."""
    import numpy as np

    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.where(F.col("vec_id") % 2 == 0)
    later = emb.where(F.col("vec_id") % 2 == 1)
    t = "ivf_append_test"
    _drop(spark, t, f"{t}__centroids")
    try:
        write_ivf_index(spark, first, t, nlist=NLIST)
        before = {
            r["vec_id"]: r["cell"]
            for r in spark.table(t).select("vec_id", "cell").collect()
        }
        append_ivf_index(spark, later, t)
        after = {
            r["vec_id"]: r["cell"]
            for r in spark.table(t).select("vec_id", "cell").collect()
        }
        # originals untouched, every later id present exactly once
        assert {k: v for k, v in after.items() if k in before} == before
        later_ids = {r["vec_id"] for r in later.select("vec_id").collect()}
        assert set(after) == set(before) | later_ids
        # driver-side recompute of the nearest stored centroid
        cpd = spark.table(f"{t}__centroids").toPandas()
        cm = np.stack(cpd["centroid"].to_numpy())
        cells = cpd["cell"].to_numpy()
        for r in later.select("vec_id", "embedding").collect():
            v = np.asarray(r["embedding"], dtype="float64")
            v /= np.linalg.norm(v)
            want = cells[((v - cm) ** 2).sum(1).argmin()]
            assert after[r["vec_id"]] == want, r["vec_id"]
    finally:
        _drop(spark, t, f"{t}__centroids")


def test_rebalance_heals_drift_skew_and_recall(spark, sf_dir):
    """The rebalance verb (VERDICT r7 item 3): a drifted append
    sequence under frozen centroids piles into few cells (max/median
    skew blows up); rebalance retrains on the current corpus, the
    layout rewrite collapses the skew, and the untouched query path
    still matches the recall of a fresh full-probe scan."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
        ivf_cell_skew,
        rebalance_ivf_index,
    )

    t = "ivf_rebalance_test"
    _drop(spark, t, f"{t}__centroids")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        first = emb.where(F.col("vec_id") % 2 == 0)
        # positive-orthant drift: high internal variance (so a retrain
        # CAN split it across cells) but concentrated relative to the
        # frozen iso-trained centroids (so the append skews hard) — a
        # tight point-clump would stay in one cell under ANY clustering
        drifted = emb.where(F.col("vec_id") % 2 == 1).withColumn(
            "embedding", F.transform("embedding", lambda x: F.abs(x))
        )
        write_ivf_index(spark, first, t, nlist=NLIST)
        append_ivf_index(spark, drifted, t)
        mx_before, md_before = ivf_cell_skew(spark, t)
        n_before = spark.table(t).count()
        rebalance_ivf_index(spark, t)
        mx_after, md_after = ivf_cell_skew(spark, t)
        # no vector lost or duplicated by the rewrite
        assert spark.table(t).count() == n_before
        assert spark.table(t).select("vec_id").distinct().count() == n_before
        # the drifted half all lands in ~one frozen cell before; after
        # retraining the occupancy flattens
        skew_before = mx_before / max(md_before, 1.0)
        skew_after = mx_after / max(md_after, 1.0)
        assert skew_before > 2.5, (mx_before, md_before)
        # healed both relatively (>= 40% drop) and absolutely (< 2.0,
        # i.e. max cell within 2x of median — pruning health restored)
        assert skew_after < 2.0 and skew_after < skew_before * 0.6, (
            (mx_before, md_before),
            (mx_after, md_after),
        )
        # recall contract survives the rewrite: full probe == exact
        corpus = first.unionByName(drifted)
        queries = corpus.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = sorted(
            map(
                tuple,
                ivf_topk_from_index(
                    spark, t, queries, k=10, nprobe=NLIST
                ).collect(),
            )
        )
        want = sorted(map(tuple, cosine_topk(corpus, queries, k=10).collect()))
        assert got == want
        # properties refreshed for future appends
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
        }
        assert props["ivf.nlist"] == str(NLIST)
    finally:
        _drop(spark, t, f"{t}__centroids")


def test_pq_index_roundtrip_and_plan(spark, sf_dir):
    """Persisted PQ: (a) full-probe-equivalent recall sanity — the
    reranked top-k from the codes index matches exact top-k when the
    shortlist covers the corpus; (b) the ADC scan's MapInPandas reads
    the CODES table, never the embeddings parquet (float vectors enter
    only at the rerank point-lookup); (c) append with stored codebooks
    ≡ the codes a fresh full build assigns."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_pq_index,
        pq_topk_from_index,
        write_pq_index,
    )
    from common_survey_data_pipeline_spark.plans import plan_of, subtree_of

    t = "pq_index_test"
    t2 = "pq_append_test"
    _drop(spark, t, f"{t}__codebooks", t2, f"{t2}__codebooks")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        write_pq_index(spark, emb, t, m=16, ksub=64)
        assert spark.table(t).count() == n
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        ann = pq_topk_from_index(
            spark, t, queries, emb, k=10, shortlist=n
        )
        got = sorted(map(tuple, ann.collect()))
        want = sorted(map(tuple, cosine_topk(emb, queries, k=10).collect()))
        assert got == want

        # plan: the MapInPandas subtree scans the codes table only
        plan = plan_of(
            pq_topk_from_index(spark, t, queries, emb, k=10, shortlist=100)
        )
        adc = "\n".join(subtree_of(plan, "MapInPandas"))
        assert t in adc
        assert "embeddings" not in adc, adc

        # append parity: codes assigned by append == fresh-build codes
        first = emb.where(F.col("vec_id") % 2 == 0)
        later = emb.where(F.col("vec_id") % 2 == 1)
        write_pq_index(spark, first, t2, m=16, ksub=64)
        append_pq_index(spark, later, t2)
        appended = {
            r["vec_id"]: list(r["codes"])
            for r in spark.table(t2).collect()
        }
        # fresh build over the SAME training half (id-ordered sample of
        # `first` == sample of the appended table's even ids)
        write_pq_index(spark, first, t, m=16, ksub=64)
        append_pq_index(spark, later, t)
        again = {
            r["vec_id"]: list(r["codes"]) for r in spark.table(t).collect()
        }
        assert appended == again and len(appended) == n
    finally:
        _drop(spark, t, f"{t}__codebooks", t2, f"{t2}__codebooks")


def test_pq_append_to_empty_index_raises(spark, sf_dir):
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_pq_index,
        write_pq_index,
    )

    t = "pq_empty_test"
    _drop(spark, t, f"{t}__codebooks")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        write_pq_index(spark, emb.where(F.lit(False)), t)
        with pytest.raises(ValueError, match="no codebooks"):
            append_pq_index(spark, emb.limit(5), t)
    finally:
        _drop(spark, t, f"{t}__codebooks")


def test_torn_rebalance_is_detected_and_healable(spark, sf_dir):
    """ADVICE r8: a crash between the rebalance's data rewrite and its
    centroid swap must be DETECTED (epoch mismatch raises on query and
    append), never silently probed with stale centroids, and a re-run
    rebalance heals the index."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
        rebalance_ivf_index,
    )

    t = "ivf_epoch_test"
    _drop(spark, t, f"{t}__centroids")
    emb = load_table(spark, sf_dir, "embeddings")
    write_ivf_index(spark, emb, t, nlist=4)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # healthy index: both stamps 0, queries fine
    assert ivf_topk_from_index(spark, t, q, k=5, nprobe=4).count() > 0

    # simulate the crash window: data table stamped with the NEW epoch
    # while the centroids table still carries the old one
    spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ('ivf.epoch'='1')")
    with pytest.raises(ValueError, match="torn"):
        ivf_topk_from_index(spark, t, q, k=5, nprobe=4)
    with pytest.raises(ValueError, match="torn"):
        append_ivf_index(spark, emb.limit(2), t)

    # re-running the rebalance rewrites both tables and heals
    rebalance_ivf_index(spark, t)
    assert ivf_topk_from_index(spark, t, q, k=5, nprobe=4).count() > 0
    # a completed rebalance leaves matching stamps, bumped past both
    props_d = {r["key"]: r["value"]
               for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()}
    props_c = {r["key"]: r["value"]
               for r in spark.sql(
                   f"SHOW TBLPROPERTIES {t}__centroids").collect()}
    assert props_d["ivf.epoch"] == props_c["ivf.epoch"] == "2"
    _drop(spark, t, f"{t}__centroids")


class TestIvfPqPersisted:
    """Composed persisted IVF+PQ index (VERDICT r8 item 5): probed-cell
    partition pruning AND codes-only scan, append through stored
    geometry, torn-write detection."""

    TABLE = "ivfpq_index_test"
    NLIST = 8

    @pytest.fixture(scope="class")
    def ivfpq(self, spark, sf_dir):
        from common_survey_data_pipeline_spark.operators.similarity import (
            write_ivfpq_index,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        _drop(spark, self.TABLE, f"{self.TABLE}__centroids",
              f"{self.TABLE}__codebooks")
        write_ivfpq_index(spark, emb, self.TABLE, nlist=self.NLIST,
                          m=16, ksub=64)
        yield emb
        _drop(spark, self.TABLE, f"{self.TABLE}__centroids",
              f"{self.TABLE}__codebooks")

    @pytest.fixture(scope="class")
    def qs(self, ivfpq):
        return ivfpq.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

    def test_recall_at_full_probe(self, spark, ivfpq, qs):
        from common_survey_data_pipeline_spark.operators.similarity import (
            ivfpq_topk_from_index,
        )

        ann = {
            (r.query_id, r.vec_id)
            for r in ivfpq_topk_from_index(
                spark, self.TABLE, qs, ivfpq, k=10, nprobe=self.NLIST,
                shortlist=200,
            ).collect()
        }
        exact = {
            (r.query_id, r.vec_id)
            for r in cosine_topk(ivfpq, qs, k=10).collect()
        }
        assert len(ann & exact) / len(exact) >= 0.9

    def test_scan_prunes_partitions_and_reads_codes_only(
        self, spark, ivfpq, qs
    ):
        import re

        from common_survey_data_pipeline_spark.operators.similarity import (
            ivfpq_topk_from_index,
        )

        ann = ivfpq_topk_from_index(
            spark, self.TABLE, qs, ivfpq, k=10, nprobe=2
        )
        plan = ann._jdf.queryExecution().executedPlan().toString()
        scan_lines = [
            l for l in plan.splitlines()
            if self.TABLE in l and "FileScan" in l
        ]
        assert scan_lines, plan
        assert re.search(r"cell#\d+ IN \(", plan), plan
        m = re.search(r"InMemoryFileIndex\((\d+) paths\)", scan_lines[0])
        assert m and int(m.group(1)) < self.NLIST, scan_lines[0]
        # codes-only: the index scan reads no float vectors — the only
        # ReadSchema on the index table carries codes, never embedding
        assert re.search(
            r"ReadSchema:.*codes", scan_lines[0]
        ) and "embedding" not in scan_lines[0], scan_lines[0]

    def test_append_uses_stored_geometry_and_keeps_recall(self, spark, sf_dir):
        from common_survey_data_pipeline_spark.operators.similarity import (
            append_ivfpq_index,
            ivfpq_topk_from_index,
            write_ivfpq_index,
        )

        t = "ivfpq_append_test"
        _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")
        emb = load_table(spark, sf_dir, "embeddings")
        first = emb.where(F.col("vec_id") % 2 == 0)
        later = emb.where(F.col("vec_id") % 2 == 1)
        write_ivfpq_index(spark, first, t, nlist=self.NLIST, m=16, ksub=64)
        files_before = set(spark.table(t).inputFiles())
        append_ivfpq_index(spark, later, t)
        # append never rewrites the existing files
        assert files_before <= set(spark.table(t).inputFiles())
        qs = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        ann = {
            (r.query_id, r.vec_id)
            for r in ivfpq_topk_from_index(
                spark, t, qs, emb, k=10, nprobe=self.NLIST, shortlist=200
            ).collect()
        }
        exact = {
            (r.query_id, r.vec_id)
            for r in cosine_topk(emb, qs, k=10).collect()
        }
        assert len(ann & exact) / len(exact) >= 0.9
        _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")

    def test_torn_write_detected(self, spark, ivfpq, qs):
        from common_survey_data_pipeline_spark.operators.similarity import (
            append_ivfpq_index,
            ivfpq_topk_from_index,
        )

        spark.sql(
            f"ALTER TABLE {self.TABLE}__codebooks "
            "SET TBLPROPERTIES ('ivfpq.epoch'='9')"
        )
        try:
            with pytest.raises(ValueError, match="torn"):
                ivfpq_topk_from_index(spark, self.TABLE, qs, ivfpq, k=5)
            with pytest.raises(ValueError, match="torn"):
                append_ivfpq_index(spark, ivfpq.limit(2), self.TABLE)
        finally:
            spark.sql(
                f"ALTER TABLE {self.TABLE}__codebooks "
                "SET TBLPROPERTIES ('ivfpq.epoch'='0')"
            )


def test_pq_rebalance_heals_drift_mse_and_recall(spark, sf_dir):
    """VERDICT r8 item 6: frozen codebooks under a drifted append
    degrade ADC reconstruction error; rebalance_pq_index (bounded
    current-corpus sample retrain + one-pass re-encode) must reduce it
    and the recall contract must hold post-rebalance."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_pq_index,
        pq_adc_mse,
        pq_topk_from_index,
        rebalance_pq_index,
        write_pq_index,
    )

    t = "pq_rebalance_test"
    _drop(spark, t, f"{t}__codebooks")
    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.where(F.col("vec_id") % 2 == 0)
    drift = emb.where(F.col("vec_id") % 2 == 1).withColumn(
        "embedding", F.transform("embedding", lambda x: F.abs(x))
    )
    corpus = first.unionByName(drift)
    write_pq_index(spark, first, t, m=16, ksub=64)
    mse_fresh = pq_adc_mse(spark, t, first)
    append_pq_index(spark, drift, t)
    mse_drifted = pq_adc_mse(spark, t, corpus)
    # the drifted append degrades reconstruction (codebooks never saw
    # the positive orthant)
    assert mse_drifted > mse_fresh * 1.2, (mse_fresh, mse_drifted)
    rebalance_pq_index(spark, corpus, t)
    mse_healed = pq_adc_mse(spark, t, corpus)
    assert mse_healed < mse_drifted * 0.8, (mse_drifted, mse_healed)
    # epochs bumped and matching after the rebalance
    props_d = {r["key"]: r["value"]
               for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()}
    props_c = {r["key"]: r["value"]
               for r in spark.sql(
                   f"SHOW TBLPROPERTIES {t}__codebooks").collect()}
    assert props_d["pq.epoch"] == props_c["pq.epoch"] == "1"
    # recall contract re-proved on the healed index
    qs = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann = {
        (r.query_id, r.vec_id)
        for r in pq_topk_from_index(
            spark, t, qs, corpus, k=10, shortlist=200
        ).collect()
    }
    exact = {(r.query_id, r.vec_id)
             for r in cosine_topk(corpus, qs, k=10).collect()}
    assert len(ann & exact) / len(exact) >= 0.9
    _drop(spark, t, f"{t}__codebooks")


def test_pq_torn_rebalance_detected(spark, sf_dir):
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_pq_index,
        pq_topk_from_index,
        write_pq_index,
    )

    t = "pq_epoch_test"
    _drop(spark, t, f"{t}__codebooks")
    emb = load_table(spark, sf_dir, "embeddings")
    write_pq_index(spark, emb, t, m=16, ksub=64)
    spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ('pq.epoch'='1')")
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(ValueError, match="torn"):
        pq_topk_from_index(spark, t, qs, emb, k=5)
    with pytest.raises(ValueError, match="torn"):
        append_pq_index(spark, emb.limit(2), t)
    _drop(spark, t, f"{t}__codebooks")


def test_ivfpq_rebalance_heals_both_drift_modes_and_recall(spark, sf_dir):
    """VERDICT r9 item 1: the composed index accumulates BOTH drift
    modes at once under frozen geometry — a drifted append piles into
    few cells (pruning health collapses) AND quantizes badly against
    codebooks that never saw the new distribution (ADC reconstruction
    error grows). ONE rebalance_ivfpq_index call must heal both, and
    the recall contract must hold post-rebalance."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivfpq_index,
        ivf_cell_skew,
        ivfpq_adc_mse,
        ivfpq_topk_from_index,
        rebalance_ivfpq_index,
        write_ivfpq_index,
    )

    t = "ivfpq_rebalance_test"
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")
    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.where(F.col("vec_id") % 2 == 0)
    drift = emb.where(F.col("vec_id") % 2 == 1).withColumn(
        "embedding", F.transform("embedding", lambda x: F.abs(x))
    )
    corpus = first.unionByName(drift)
    write_ivfpq_index(spark, first, t, nlist=16, m=16, ksub=64)
    mse_fresh = ivfpq_adc_mse(spark, t, first)
    append_ivfpq_index(spark, drift, t)
    mse_drifted = ivfpq_adc_mse(spark, t, corpus)
    mx_d, md_d = ivf_cell_skew(spark, t)
    # drift mode 1: cell skew (appends pile into few cells)
    assert md_d > 0 and mx_d / md_d > 3.0, (mx_d, md_d)
    # drift mode 2: residual quantization error
    assert mse_drifted > mse_fresh * 1.2, (mse_fresh, mse_drifted)
    rebalance_ivfpq_index(spark, corpus, t)
    mse_healed = ivfpq_adc_mse(spark, t, corpus)
    mx_h, md_h = ivf_cell_skew(spark, t)
    assert md_h > 0 and mx_h / md_h < mx_d / md_d / 2, (
        (mx_d, md_d), (mx_h, md_h)
    )
    assert mse_healed < mse_drifted * 0.8, (mse_drifted, mse_healed)
    # epochs bumped and matching across all THREE tables
    stamps = {
        sfx: {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}{sfx}").collect()
        }["ivfpq.epoch"]
        for sfx in ("", "__centroids", "__codebooks")
    }
    assert set(stamps.values()) == {"1"}, stamps
    # recall contract re-proved on the healed index
    qs = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann = {
        (r.query_id, r.vec_id)
        for r in ivfpq_topk_from_index(
            spark, t, qs, corpus, k=10, nprobe=14, shortlist=200
        ).collect()
    }
    exact = {(r.query_id, r.vec_id)
             for r in cosine_topk(corpus, qs, k=10).collect()}
    assert len(ann & exact) / len(exact) >= 0.9
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")


def test_ivfpq_torn_rebalance_detected_and_healable(spark, sf_dir):
    """The torn-write epoch check extended to the composed rebalance
    path (VERDICT r9 item 1): a crash between the rebalance's three
    non-atomic writes raises on query and append, and re-running the
    rebalance heals all three tables to one stamp strictly past every
    torn one."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivfpq_index,
        ivfpq_topk_from_index,
        rebalance_ivfpq_index,
        write_ivfpq_index,
    )

    t = "ivfpq_reb_epoch_test"
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")
    emb = load_table(spark, sf_dir, "embeddings")
    write_ivfpq_index(spark, emb, t, nlist=8, m=16, ksub=16)
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # simulate a crash after the data rewrite, before the companion
    # swaps: data table carries the new epoch, companions the old
    spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ('ivfpq.epoch'='3')")
    with pytest.raises(ValueError, match="torn"):
        ivfpq_topk_from_index(spark, t, qs, emb, k=5, nprobe=8)
    with pytest.raises(ValueError, match="torn"):
        append_ivfpq_index(spark, emb.limit(2), t)
    rebalance_ivfpq_index(spark, emb, t)
    stamps = {
        sfx: {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}{sfx}").collect()
        }["ivfpq.epoch"]
        for sfx in ("", "__centroids", "__codebooks")
    }
    # healed past the LARGEST torn stamp (3), not past the data
    # table's pre-crash value
    assert set(stamps.values()) == {"4"}, stamps
    assert ivfpq_topk_from_index(spark, t, qs, emb, k=5, nprobe=8).count() > 0
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")


def test_torn_props_recovered_from_companion_mirror(spark, sf_dir):
    """ADVICE r9 (similarity.py): a crash between the data-table
    overwrite (which drops TBLPROPERTIES) and the ALTER that restores
    them must NOT strand the advertised 're-run the rebalance to heal'
    path — the build params are mirrored onto the companion tables and
    the rebalance recovers them from there, for all three lifecycles."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        rebalance_ivf_index,
        rebalance_ivfpq_index,
        rebalance_pq_index,
        write_ivf_index,
        write_ivfpq_index,
        write_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)

    t = "ivf_props_heal_test"
    _drop(spark, t, f"{t}__centroids")
    write_ivf_index(spark, emb, t, nlist=4)
    spark.sql(
        f"ALTER TABLE {t} UNSET TBLPROPERTIES "
        "('ivf.nlist', 'ivf.seed', 'ivf.epoch')"
    )
    rebalance_ivf_index(spark, t)  # must recover nlist from __centroids
    props = {r["key"]: r["value"]
             for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()}
    assert props["ivf.nlist"] == "4"
    _drop(spark, t, f"{t}__centroids")

    t = "pq_props_heal_test"
    _drop(spark, t, f"{t}__codebooks")
    write_pq_index(spark, emb, t, m=16, ksub=16)
    spark.sql(
        f"ALTER TABLE {t} UNSET TBLPROPERTIES "
        "('pq.m', 'pq.ksub', 'pq.seed', 'pq.epoch')"
    )
    rebalance_pq_index(spark, emb, t)  # must recover m/ksub from companion
    props = {r["key"]: r["value"]
             for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()}
    assert (props["pq.m"], props["pq.ksub"]) == ("16", "16")
    _drop(spark, t, f"{t}__codebooks")

    t = "ivfpq_props_heal_test"
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")
    write_ivfpq_index(spark, emb, t, nlist=4, m=16, ksub=16)
    spark.sql(
        f"ALTER TABLE {t} UNSET TBLPROPERTIES "
        "('ivfpq.nlist', 'ivfpq.m', 'ivfpq.ksub', 'ivfpq.seed', "
        "'ivfpq.epoch')"
    )
    rebalance_ivfpq_index(spark, emb, t)
    props = {r["key"]: r["value"]
             for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()}
    assert (props["ivfpq.nlist"], props["ivfpq.m"]) == ("4", "16")
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")


def test_compact_index_files_restores_one_file_per_cell(spark, sf_dir):
    """Round-10: appends add one file per touched cell per batch, so a
    probed cell's scan opens one file per append; compact_index_files
    must collapse each lifecycle's data tree back to one file per cell
    with content, build properties, epoch, and query results
    byte-identical — for BOTH cell-partitioned index kinds."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
        append_ivfpq_index,
        compact_index_files,
        ivf_topk_from_index,
        ivfpq_topk_from_index,
        write_ivf_index,
        write_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def props_of(t):
        return {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
            if r["key"].startswith(("ivf.", "pq.", "ivfpq."))
        }

    t = "compact_ivf_test"
    _drop(spark, t, f"{t}__centroids", f"{t}__compacting")
    write_ivf_index(spark, emb.where(F.col("vec_id") % 4 == 0), t, nlist=4)
    for r in range(1, 4):
        append_ivf_index(spark, emb.where(F.col("vec_id") % 4 == r), t)
    files0 = len(spark.table(t).inputFiles())
    rows0 = sorted(map(tuple, spark.table(t).select("vec_id", "cell").collect()))
    props0, res0 = props_of(t), sorted(
        map(tuple, ivf_topk_from_index(spark, t, qs, k=5, nprobe=4).collect())
    )
    compact_index_files(spark, t)
    n_cells = spark.table(t).select("cell").distinct().count()
    assert len(spark.table(t).inputFiles()) == n_cells < files0
    assert sorted(
        map(tuple, spark.table(t).select("vec_id", "cell").collect())
    ) == rows0
    assert props_of(t) == props0  # epoch copied, not bumped
    assert sorted(
        map(tuple, ivf_topk_from_index(spark, t, qs, k=5, nprobe=4).collect())
    ) == res0
    _drop(spark, t, f"{t}__centroids")

    t = "compact_ivfpq_test"
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks", f"{t}__compacting")
    write_ivfpq_index(
        spark, emb.where(F.col("vec_id") % 4 == 0), t, nlist=4, m=16, ksub=16
    )
    for r in range(1, 4):
        append_ivfpq_index(spark, emb.where(F.col("vec_id") % 4 == r), t)
    files0 = len(spark.table(t).inputFiles())
    rows0 = sorted(map(tuple, spark.table(t).select("vec_id", "cell").collect()))
    props0, res0 = props_of(t), sorted(
        map(
            tuple,
            ivfpq_topk_from_index(
                spark, t, qs, emb, k=5, nprobe=4, shortlist=100
            ).collect(),
        )
    )
    compact_index_files(spark, t)
    n_cells = spark.table(t).select("cell").distinct().count()
    assert len(spark.table(t).inputFiles()) == n_cells < files0
    assert sorted(
        map(tuple, spark.table(t).select("vec_id", "cell").collect())
    ) == rows0
    assert props_of(t) == props0
    assert sorted(
        map(
            tuple,
            ivfpq_topk_from_index(
                spark, t, qs, emb, k=5, nprobe=4, shortlist=100
            ).collect(),
        )
    ) == res0
    _drop(spark, t, f"{t}__centroids", f"{t}__codebooks")
