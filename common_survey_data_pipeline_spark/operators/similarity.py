"""Embedding similarity search over ``array<float>`` columns.

Five paths (SURVEY.md north star; BASELINE.json):

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, compute cosine with JVM higher-order functions
  (``zip_with`` + ``aggregate``) or one numpy matmul per partition
  (``strategy='matmul'``), rank per query. One pass over the corpus,
  no shuffle of the corpus itself — the scalable exact baseline when
  queries ≪ corpus.
* ``signlsh_topk`` — random-hyperplane (sign) LSH: h fixed hyperplanes
  (seeded numpy, embedded as literal arrays) give every vector an h-bit
  bucket; queries probe their own bucket plus all Hamming-1 neighbors
  (multi-probe), and only in-bucket candidates get exact cosine. Equi-
  join on the bucket id → shuffle-partitionable, approximate recall,
  corpus-scale friendly.
* ``ivf_topk`` — inverted-file index: a KMeans coarse quantizer
  partitions the corpus into cells; queries probe their nprobe nearest
  cells. ``write_ivf_index``/``append_ivf_index``/
  ``ivf_topk_from_index`` persist the same index partitioned BY cell
  id, so query-time scans prune to the probed cells' files and appends
  assign to stored centroids without retraining.
* ``pq_topk`` — product quantization + asymmetric distance: the corpus
  as m-byte codes (21-32× compression), queries scan codes with
  per-subspace lookup tables and exactly rerank a small shortlist —
  the storage-bound regime's operator.
* ``ivfpq_topk`` — the FAISS ``IVFx,PQy`` composition: coarse cells
  prune the scan to nprobe/nlist of the corpus AND the in-cell scan
  runs over product-quantized residuals — the billion-vector default.
* ``embedding_neardup_pairs`` — all-pairs near-duplicate mining with
  the LSH-bucketed candidate path (exact branch cost-gated).

Norms/dots run in float64 regardless of input float32 storage.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def _round6z(col: Column) -> Column:
    """Round a similarity to 6 decimals and canonicalize IEEE signed
    zero (+ 0.0: −0.0 + 0.0 = +0.0, identity otherwise), so a
    near-zero rounded cosine prints identically in Spark and DuckDB
    (see workload._roundz) and sorts in one tie-group in both engines.
    Every rounded-similarity path — expr or matmul — must go through
    this or its numpy twin (np.round(...) + 0.0)."""
    return F.round(col, 6) + F.lit(0.0)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    exclude_self: bool = True,
    strategy: str = "expr",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, vec_id, cosine_sim DOUBLE, rank INT), rank 1..k
    by (cosine_sim DESC rounded to 6, vec_id ASC) — the rounding +
    id tiebreak makes ranking reproducible across engines.

    ``strategy='expr'`` scores pairs with JVM higher-order functions —
    right for a handful of queries. ``'matmul'`` broadcasts the query
    matrix and scores each corpus partition with one numpy product in
    ``mapInPandas`` — ~100× cheaper per pair once the query set has
    hundreds of rows. Identical output (tested), including the corrupt-
    input envelope: null-vector rows are dropped on both sides up front
    (a NULL embedding would crash the numpy kernel and emit NULL-sim
    rows from the expression path — two different behaviors for the
    same corrupt input).
    """
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull() & F.col(corpus_id).isNotNull()
    )
    queries = queries.where(
        F.col(query_vec).isNotNull() & F.col(query_id).isNotNull()
    )
    if strategy == "matmul":
        return _cosine_topk_matmul(
            corpus, queries, corpus_id, corpus_vec, query_id, query_vec, k,
            exclude_self,
        )
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv"))
    )
    joined = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("__cv")
    ).crossJoin(q)
    if exclude_self:
        joined = joined.where(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine_sim", _round6z(cosine(F.col("__cv"), F.col("__qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )


def _cosine_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int,
    exclude_self: bool,
) -> DataFrame:
    """BLAS scoring kernel for ``cosine_topk``: broadcast the
    unit-normalized query matrix, one matmul per corpus partition, emit
    each partition's per-query top-k candidates (already rounded), then
    a global window keeps the true top-k — partial top-k per partition
    bounds the shuffle at (partitions × queries × k) rows.

    Id types are DERIVED from the inputs (string/UUID ids round-trip
    unchanged): the mapInPandas schema and the empty-query early
    return both use the query/corpus id columns' own Spark types, so
    empty and non-empty results of this strategy always union cleanly
    and match the expr strategy's schema."""
    import pandas as pd

    qid_t = queries.schema[query_id].dataType.simpleString()
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = f"query_id {qid_t}, vec_id {cid_t}, cosine_sim double"
    qpd = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).toPandas()
    if len(qpd) == 0:  # np.stack cannot stack zero arrays
        return corpus.sparkSession.createDataFrame(
            [], out_schema + ", rank int"
        )
    q_ids = qpd["qid"].to_numpy()
    qm = np.stack(qpd["qv"].to_numpy()).astype("float64")
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qn[qn == 0] = np.nan
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, qm / qn))

    def block(it):
        ids_q, qmat = bc.value
        for pdf in it:
            c_ids = pdf["cid"].to_numpy()
            cm = np.stack(pdf["cv"].to_numpy()).astype("float64")
            cn = np.linalg.norm(cm, axis=1, keepdims=True)
            cn[cn == 0] = np.nan
            sims = np.round((cm / cn) @ qmat.T, 6) + 0.0  # n_c × n_q; +0.0 = _round6z twin (-0.0 -> +0.0)
            if exclude_self:
                sims[c_ids[:, None] == ids_q[None, :]] = np.nan
            out = []
            for j, qid in enumerate(ids_q):
                col = sims[:, j]
                valid = ~np.isnan(col)
                take = min(k, int(valid.sum()))
                if take == 0:
                    continue
                idx = np.flatnonzero(valid)
                # top-k by (sim desc, id asc) — lexsort on (-sim, id)
                order = idx[np.lexsort((c_ids[idx], -col[idx]))][:take]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": c_ids[order],
                            "cosine_sim": col[order],
                        }
                    )
                )
            if out:  # a batch with no survivors simply yields nothing
                yield pd.concat(out)

    partial = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv")
    ).mapInPandas(block, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )


def recall_vs_exact(
    ann: DataFrame,
    exact: DataFrame,
    k: int,
    min_recall: float = 0.9,
) -> DataFrame:
    """Per-query recall contract of an approximate top-k result against
    the exact one. Both inputs carry (query_id, vec_id, ...) rows.

    Output: (query_id, found_k INT, recall_ok BOOLEAN) where ``found_k``
    is how many neighbors the ANN index returned and ``recall_ok`` is
    ``|ann ∩ exact| / k >= min_recall``. This is the harness every ANN
    query in the registry exports: instead of "returned 50 rows", the
    driver's value-hash pins "full k found AND recall ≥ min_recall" per
    query. The exact side is a full corpus scan — the verification cost,
    paid on a query SAMPLE at 100 TB, never on the whole query log.

    The query universe is the EXACT side's: a query the ANN index
    misses entirely (empty bucket, no probe hits) reports
    ``found_k = 0, recall_ok = false`` — deriving the universe from the
    ann side would make total misses vanish from the report, the one
    regression the contract exists to catch.
    """
    universe = exact.select("query_id").distinct()
    hits = ann.select("query_id", "vec_id").join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"]
    )
    found = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("__found"))
    hit_n = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("__hits"))
    return (
        universe.join(found, "query_id", "left")
        .join(hit_n, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("__found"), F.lit(0)).cast("int").alias("found_k"),
            (
                F.coalesce(F.col("__hits"), F.lit(0)) / F.lit(float(k))
                >= min_recall
            ).alias("recall_ok"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def signlsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """h-bit sign-LSH bucket id of a vector: bit i = (vec · plane_i) >= 0.

    The hyperplanes are embedded as literal arrays — constant-folded by
    Catalyst, shipped once in the plan, no lookup table or UDF.
    """
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(vec, lit_plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def _lsh_base_cols(
    vec: Column, tables: list[np.ndarray], n_planes: int
) -> list[Column]:
    """Per-table tagged bucket id columns: table ``t``'s buckets live in
    a disjoint id space via the ``t << (n_planes + 1)`` tag. Shared by
    ``signlsh_topk`` and ``embedding_neardup_pairs`` so the LSH geometry
    cannot silently diverge between the two."""
    return [
        signlsh_bucket(vec, planes) + F.lit(t << (n_planes + 1)).cast("long")
        for t, planes in enumerate(tables)
    ]


def _lsh_probe_cols(
    n_tables: int, n_planes: int, multiprobe: bool
) -> list[Column]:
    """Probe set over MATERIALIZED base-bucket columns ``__b{t}``: each
    table's own bucket plus (when ``multiprobe``) its Hamming-1 XOR
    neighbors. Referencing the materialized columns instead of inlining
    the plane-literal-heavy bucket expression keeps the plan from
    bloating n_planes×."""
    cols: list[Column] = []
    for t in range(n_tables):
        base = F.col(f"__b{t}")
        cols.append(base)
        if multiprobe:
            cols.extend(
                base.bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
                for i in range(n_planes)
            )
    return cols


def signlsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-table sign-LSH.

    ``n_tables`` independent hash tables of ``n_planes`` bits each;
    corpus vectors land in one bucket per table, each query probes its
    own bucket (+ Hamming-1 neighbors when ``multiprobe``) in every
    table, and the UNION of candidates is ranked exactly. More tables →
    higher recall at the cost of an n_tables× bucket index — the
    classic LSH recall/space dial. Same output contract as
    ``cosine_topk``; at 100 TB the bucket join is a shuffle equi-join
    on (table, bucket) instead of a full corpus scan per query.

    Corrupt rows (null id/vector) cannot participate — same contract as
    ``ivf_topk`` / ``embedding_neardup_pairs`` (a null vector would
    otherwise sign-hash to bucket 0 in every table and surface as a
    NULL-similarity candidate).
    """
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull() & F.col(corpus_id).isNotNull()
    )
    queries = queries.where(
        F.col(query_vec).isNotNull() & F.col(query_id).isNotNull()
    )
    probe = corpus.select(corpus_vec).first()
    if probe is None:  # empty corpus: steady state for fresh partitions
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine_sim double, rank int"
        )
    dim = len(probe[0])
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("__cv"),
        F.explode(
            F.array(*_lsh_base_cols(F.col(corpus_vec), tables, n_planes))
        ).alias("bucket"),
    )
    # materialize each table's base bucket once, then derive the probe
    # set from the column refs (see _lsh_probe_cols)
    q0 = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        *[
            col.alias(f"__b{t}")
            for t, col in enumerate(
                _lsh_base_cols(F.col(query_vec), tables, n_planes)
            )
        ],
    )
    qb = q0.select(
        "query_id",
        "__qv",
        F.explode(
            F.array(*_lsh_probe_cols(n_tables, n_planes, multiprobe))
        ).alias("bucket"),
    )
    joined = (
        c.join(F.broadcast(qb), "bucket")
        .select("query_id", "__qv", "vec_id", "__cv")
        .dropDuplicates(["query_id", "vec_id"])  # union across tables/probes
    )
    if exclude_self:
        joined = joined.where(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine_sim", _round6z(cosine(F.col("__cv"), F.col("__qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )


def _exact_neardup_matmul(
    corpus: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    threshold: float,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a blocked BLAS product.

    The unit-normalized matrix is broadcast (N×d float64 — 25 MB at
    100k×64, the same shape of broadcast a dimension table would be);
    each corpus partition computes its block's N_b×N similarity slab
    with one numpy matmul inside ``mapInPandas`` and emits only the
    above-threshold upper-triangle pairs. ~1.6 GFLOP for 5000 vectors
    (sub-second in BLAS) versus tens of seconds for per-pair HOF
    evaluation — this is the vectorized-pandas path reserved for
    kernels the relational operators can't express efficiently.
    """
    import numpy as np
    import pandas as pd

    pdf_all = corpus.select(
        F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("v")
    ).toPandas()
    if len(pdf_all) == 0:  # empty corpus: no pairs, typed empty frame
        return corpus.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine_sim double"
        )
    ids = pdf_all["id"].to_numpy()
    x = np.stack(pdf_all["v"].to_numpy()).astype("float64")
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = np.nan  # zero vectors never match
    xn = x / norms
    bc = corpus.sparkSession.sparkContext.broadcast((ids, xn))

    def block(it):
        all_ids, all_xn = bc.value
        for pdf in it:
            b_ids = pdf["id"].to_numpy()
            bx = np.stack(pdf["v"].to_numpy()).astype("float64")
            bn = np.linalg.norm(bx, axis=1, keepdims=True)
            bn[bn == 0] = np.nan
            sims = np.round((bx / bn) @ all_xn.T, 6) + 0.0  # _round6z twin (-0.0 -> +0.0)
            rows_i, cols_j = np.where(
                (sims >= threshold) & (b_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": b_ids[rows_i].astype("int64"),
                    "id_b": all_ids[cols_j].astype("int64"),
                    "cosine_sim": sims[rows_i, cols_j],
                }
            )

    return corpus.select(
        F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("v")
    ).mapInPandas(block, "id_a long, id_b long, cosine_sim double")


def _unit_normalize(vec: Column) -> Column:
    """vec / ||vec||, with the norm evaluated once (array-bind trick —
    a bare ``transform(vec, x -> x / l2_norm(vec))`` recomputes the norm
    per element, turning O(d) into O(d²))."""
    return F.element_at(
        F.transform(
            F.array(F.nullif(l2_norm(vec), F.lit(0.0))),
            lambda n: F.transform(vec, lambda x: x.cast("double") / n),
        ),
        1,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF (inverted-file)
    index: a KMeans coarse quantizer over unit-normalized vectors
    partitions the corpus into ``nlist`` cells; each query probes its
    ``nprobe`` nearest cells and ranks only those candidates exactly.

    Same output contract as ``cosine_topk``. Scale shape: the corpus is
    scanned once to assign cells (then the assignment is a materialized
    column — at 100 TB you'd partition the parquet layout BY the cell
    id); each query touches nprobe/nlist of the corpus via an equi-join
    on the cell id. Recall rises with ``nprobe`` (= nlist → exact).

    Unit-normalizing first makes KMeans' euclidean geometry equivalent
    to cosine geometry (|a-b|² = 2-2cos on the unit sphere).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = corpus.where(
        # null vectors cannot be indexed or matched; zero vectors have
        # no direction — _unit_normalize yields an all-NULL array that
        # array_to_vector rejects (NOT_NULL_ASSERT_VIOLATION inside
        # KMeans.fit), so they are corrupt rows too (failed-encoder
        # output), same policy as _exact_neardup_matmul's norms==0→nan
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    if corpus.first() is None:  # nothing to index
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine_sim double, rank int"
        )
    c_norm = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("__cv"),
        _unit_normalize(F.col(corpus_vec)).alias("__cn"),
    ).withColumn("__features", array_to_vector("__cn"))

    model = KMeans(k=nlist, seed=seed, featuresCol="__features").fit(c_norm)
    c_cells = model.transform(c_norm).select(
        "vec_id", "__cv", F.col("prediction").alias("cell")
    )

    # tiny (nlist × dim) centroid table — broadcast to rank cells per query
    centroids = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(centroids, "cell int, centroid array<double>")
    )

    q = queries.where(  # same corrupt-row policy on the query side
        F.col(query_vec).isNotNull()
        & F.col(query_id).isNotNull()
        & (l2_norm(F.col(query_vec)) > 0)
    ).select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        _unit_normalize(F.col(query_vec)).alias("__qn"),
    )
    # Probe ranking shares the ASSIGNMENT metric: corpus vectors land in
    # argmin ||v-c||² = argmax (v·c - ||c||²/2), so queries rank cells by
    # q·c - ||c||²/2 too (the FAISS convention) — ranking by raw q·c
    # would penalize nothing for large-norm centroids and could leave a
    # query's true-neighbor cell (under the assignment metric) unprobed.
    qd = q.crossJoin(cdf).withColumn(
        "__cdist",
        0.5 * dot(F.col("centroid"), F.col("centroid"))
        - dot(F.col("__qn"), F.col("centroid")),
    )
    w_cell = Window.partitionBy("query_id").orderBy(F.col("__cdist").asc(), F.col("cell"))
    probes = (
        qd.withColumn("__cr", F.row_number().over(w_cell))
        .where(F.col("__cr") <= nprobe)
        .select("query_id", "__qv", "cell")
    )

    joined = c_cells.join(F.broadcast(probes), "cell")
    if exclude_self:
        joined = joined.where(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine_sim", _round6z(cosine(F.col("__cv"), F.col("__qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 6,
    n_tables: int = 16,
    seed: int = 42,
    multiprobe: bool = True,
    strategy: str = "auto",
    exact_cutoff: int = 65536,
) -> DataFrame:
    """Embedding near-duplicate pairs with cost-based strategy choice.
    Output (id_a, id_b, cosine_sim DOUBLE), id_a < id_b, exact-verified
    cosine ≥ threshold in every strategy.

    ``strategy='exact'`` — all-pairs comparison as a blocked BLAS
    matmul (broadcast normalized matrix, per-partition numpy slab).
    Up to tens of thousands of vectors this IS the better physical
    plan: at weak thresholds the candidate volume an LSH index needs
    for high recall approaches all-pairs anyway, minus the index-build
    cost — and BLAS evaluates a pair for ~100× less than interpreted
    per-pair expressions.

    ``strategy='lsh'`` — multi-table sign-LSH self-join with Hamming-1
    multiprobe, exact verification of candidates. Recall per pair at
    angle θ is 1-(1-p)^T with p the per-table collision probability
    ((1-θ/π)^b plus probe terms) — ≈0.998 at cosine 0.45 with the
    defaults, higher for tighter thresholds; scale-out path.

    ``strategy='auto'`` — exact when the corpus is smaller than
    ``exact_cutoff`` (one cheap count()), else LSH: the engine picks
    the plan by statistics the way a cost-based optimizer would.
    """
    # corrupt rows (null id/vector) cannot participate in any pair
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull() & F.col(corpus_id).isNotNull()
    )
    if strategy == "auto":
        strategy = "exact" if corpus.count() <= exact_cutoff else "lsh"
    if strategy == "exact":
        return _exact_neardup_matmul(corpus, corpus_id, corpus_vec, threshold)

    probe = corpus.select(corpus_vec).first()
    if probe is None:
        return corpus.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine_sim double"
        )
    dim = len(probe[0])
    # distinct seed offset: the self-join index must not reuse the
    # query-index hyperplanes of signlsh_topk on the same corpus
    tables = [_hyperplanes(dim, n_planes, seed + 1000 + t) for t in range(n_tables)]

    base = corpus.select(
        F.col(corpus_id).alias("__id"),
        F.col(corpus_vec).alias("__v"),
        *[
            col.alias(f"__b{t}")
            for t, col in enumerate(
                _lsh_base_cols(F.col(corpus_vec), tables, n_planes)
            )
        ],
    )
    c = base.select(
        "__id", "__v",
        F.explode(F.array(*[F.col(f"__b{t}") for t in range(n_tables)])).alias("bucket"),
    )
    p = base.select(
        F.col("__id").alias("__pid"),
        F.col("__v").alias("__pv"),
        F.explode(
            F.array(*_lsh_probe_cols(n_tables, n_planes, multiprobe))
        ).alias("bucket"),
    )
    return (
        c.join(p, (c["bucket"] == p["bucket"]) & (c["__id"] < p["__pid"]))
        .select("__id", "__v", "__pid", "__pv")
        .dropDuplicates(["__id", "__pid"])
        .withColumn("cosine_sim", _round6z(cosine(F.col("__v"), F.col("__pv"))))
        .where(F.col("cosine_sim") >= threshold)
        .select(
            F.col("__id").alias("id_a"),
            F.col("__pid").alias("id_b"),
            "cosine_sim",
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN, the storage-bound
# regime's workhorse: at 100 TB of embeddings you cannot afford to scan
# float vectors, so the corpus is stored as m-byte PQ codes (here
# m codes of log2(ksub) bits each; 64-dim float32 → 8 bytes = 32×
# compression) and queries scan CODES with an asymmetric-distance
# lookup table, reranking only a shortlist exactly.
# ---------------------------------------------------------------------------


def _pq_train_codebooks(
    sample: "np.ndarray", m: int, ksub: int, seed: int, iters: int = 12
) -> "np.ndarray":
    """Per-subspace Lloyd k-means over a bounded, unit-normalized
    training sample (seeded init, fixed iterations → deterministic).
    Training on a driver-side sample is the production shape (FAISS
    trains PQ on ~100k vectors regardless of corpus size); the sample
    here is id-ordered and capped, never O(corpus)."""
    rng = np.random.default_rng(seed)
    n, d = sample.shape
    dsub = d // m
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * dsub : (j + 1) * dsub]
        cents = x[rng.choice(n, size=min(ksub, n), replace=False)].copy()
        if len(cents) < ksub:  # degenerate tiny sample: pad by repeat
            cents = np.tile(cents, (-(-ksub // len(cents)), 1))[:ksub]
        # r10: the Lloyd iteration rewritten allocation-lean — the
        # previous form built three (n, ksub) float temporaries per
        # iteration for the full squared distance and then ran ksub
        # masked x[mask].mean(0) passes over the whole sample; at
        # m=16, iters=12 that was ~10.6 s of driver numpy inside the
        # sf1 similarity_pq query. argmin of ||x−c||² is argmax of
        # x·c − ½||c||² (the per-row ||x||² term cannot change the
        # winner), so assignment is ONE matmul into a reused buffer +
        # an in-place broadcast subtract, and the centroid update is
        # one bincount per subspace dimension. Empty clusters keep
        # their previous centroid, as before. Float rounding shifts at
        # the last ulp vs the old expression; every ANN query's
        # recall-contract output is ulp-robust (re-proven by direct
        # output comparison at sf0.001/0.01/0.1/sf1 and the oracle
        # hash).
        score = np.empty((len(x), ksub), dtype=np.float64)
        for _ in range(iters):
            np.matmul(x, cents.T, out=score)
            score -= 0.5 * (cents**2).sum(1)[None, :]
            assign = score.argmax(1)
            counts = np.bincount(assign, minlength=ksub).astype(np.float64)
            sums = np.stack(
                [
                    np.bincount(assign, weights=x[:, dd], minlength=ksub)
                    for dd in range(dsub)
                ],
                axis=1,
            )
            nonempty = counts > 0
            cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        books[j] = cents
    return books


def _rerank_shortlist(
    corpus: DataFrame,
    queries: DataFrame,
    short: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int,
    exclude_self: bool,
) -> DataFrame:
    """Exact-cosine rerank of an approximate shortlist — the shared
    tail of every compressed-domain ANN path (PQ, IVF-PQ): join the
    (query_id, vec_id) shortlist back to full-precision vectors (the
    corpus side by id — at 100 TB a point-lookup against the vector
    store, NOT a scan), broadcast the small query set, score exactly,
    and keep the top-k per query with the repo-wide deterministic
    tie-break (sim desc, vec_id asc)."""
    cand = short.join(
        corpus.select(
            F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("__cv")
        ),
        "vec_id",
    ).join(
        F.broadcast(
            queries.select(
                F.col(query_id).alias("query_id"),
                F.col(query_vec).alias("__qv"),
            )
        ),
        "query_id",
    )
    if exclude_self:
        cand = cand.where(F.col("vec_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine_sim", _round6z(cosine(F.col("__cv"), F.col("__qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 100,
    train_cap: int = 16384,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k cosine neighbors via PRODUCT QUANTIZATION with
    asymmetric distance (ADC) + exact rerank — same output contract as
    ``cosine_topk``.

    Pipeline: (1) train m per-subspace codebooks on a bounded
    id-ordered sample (driver numpy, deterministic); (2) scan the
    corpus ONCE in an Arrow-batched kernel that encodes each vector to
    its m nearest-centroid codes and immediately ADC-scores it against
    every query's (m × ksub) lookup table — the compressed-domain scan
    costs one uint8 gather + add per (vector, query, subspace), no
    float-vector reads in the steady state (at 100 TB the codes are
    what you PERSIST; this operator fuses encode+scan because the
    synthetic corpus arrives as floats); (3) keep a per-partition
    partial top-``shortlist`` per query (the `_cosine_topk_matmul`
    shuffle-bounding trick), cut globally, and (4) exactly rerank only
    the shortlist with full-precision cosine.

    Recall dial: ``shortlist`` (ADC keeps the true neighbor in its
    top-100 with high margin at these params — measured in the
    ``similarity_pq`` contract); raise ``m``/``ksub`` for finer codes.
    Unit-normalizing both sides makes the ADC inner product an
    estimator of cosine.
    """
    import pandas as pd

    corpus = corpus.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    queries = queries.where(
        F.col(query_vec).isNotNull()
        & F.col(query_id).isNotNull()
        & (l2_norm(F.col(query_vec)) > 0)
    )
    qid_t = queries.schema[query_id].dataType.simpleString()
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    adc_schema = f"query_id {qid_t}, vec_id {cid_t}, adc_score double"
    out_schema = f"query_id {qid_t}, vec_id {cid_t}, cosine_sim double, rank int"
    qpd = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).toPandas()
    if len(qpd) == 0:
        return corpus.sparkSession.createDataFrame([], out_schema)
    # bounded training sample (id-ordered → deterministic across runs
    # and partitionings); empty corpus → schema-stable empty result
    # (np.stack on zero rows raises), the repo-wide empty-input contract
    tr = (
        corpus.select(F.col(corpus_vec).alias("v"))
        .orderBy(F.col(corpus_id))
        .limit(train_cap)
        .toPandas()
    )
    if len(tr) == 0:
        return corpus.sparkSession.createDataFrame([], out_schema)
    train = np.stack(tr["v"].to_numpy()).astype("float64")
    if train.shape[1] % m != 0:
        raise ValueError(
            f"PQ subspace count m={m} must divide the embedding "
            f"dimension {train.shape[1]} (dsub would truncate and "
            "silently drop trailing dimensions from the codes)"
        )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    books = _pq_train_codebooks(train, m, ksub, seed)

    q_ids = qpd["qid"].to_numpy()
    qm = np.stack(qpd["qv"].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    dsub = qm.shape[1] // m
    # per-query ADC lookup tables: luts[q, j, c] = q_sub_j · centroid_jc
    luts = np.stack(
        [qm[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (nq, m, ksub)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, books, luts))

    def block(it):
        ids_q, bks, lut = bc.value
        n_q = len(ids_q)
        for pdf in it:
            c_ids = pdf["cid"].to_numpy()
            cm = np.stack(pdf["cv"].to_numpy()).astype("float64")
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            b = len(cm)
            scores = np.zeros((n_q, b))
            for j in range(m):
                x = cm[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (x**2).sum(1, keepdims=True)
                    - 2.0 * x @ bks[j].T
                    + (bks[j] ** 2).sum(1)[None, :]
                )
                codes_j = d2.argmin(1)  # (b,)
                scores += lut[:, j, codes_j]  # (nq, b) gather
            out = []
            take = min(shortlist, b)
            for qi, qid in enumerate(ids_q):
                col = scores[qi]
                order = np.lexsort((c_ids, -col))[:take]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": c_ids[order],
                            "adc_score": col[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    partial = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv")
    ).mapInPandas(block, adc_schema)
    w_sl = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc_nulls_last(), F.col("vec_id").asc()
    )
    short = (
        partial.withColumn("__r", F.row_number().over(w_sl))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "vec_id")
    )
    # exact rerank of the shortlist only
    return _rerank_shortlist(
        corpus, queries, short,
        corpus_id, corpus_vec, query_id, query_vec, k, exclude_self,
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 100,
    train_cap: int = 16384,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF-PQ — the FAISS
    ``IVFx,PQy`` composition and the billion-vector production shape:
    an inverted-file coarse quantizer prunes the search to ``nprobe``
    of ``nlist`` cells, and inside the probed cells the scan runs in
    the COMPRESSED domain over product-quantized RESIDUALS (vector
    minus its cell centroid — residual codebooks spend their bits on
    the within-cell geometry, where the variance lives after coarse
    assignment), with an exact rerank of the global shortlist. Same
    output contract as ``cosine_topk``/``pq_topk``.

    ADC decomposition: for vector v in cell c with residual codes
    (v≈centroid_c+Σ_j book_j[code_j]), the query dot is
    q·v ≈ q·centroid_c + Σ_j lut[q,j,code_j] — one per-(query,cell)
    offset plus m uint8 gathers. Both the coarse quantizer and the
    residual codebooks train on ONE bounded id-ordered sample (the
    FAISS production shape: training never touches more than
    ``train_cap`` vectors no matter the corpus size), so the whole
    index build is one driver-side numpy job plus a single corpus
    scan; at 100 TB the codes and cell ids are what you PERSIST
    (see ``write_ivf_index`` for the partitioned layout — this
    operator fuses encode+scan because the synthetic corpus arrives
    as floats).

    Scale shape vs the standalone paths: ``ivf_topk`` still reads
    full float vectors in the probed cells; ``pq_topk`` scans codes
    but ALL of them. IVF-PQ multiplies the two savings — nprobe/nlist
    of the corpus, at m bytes per vector — which is why it is the
    default at billion scale. Recall dials: ``nprobe`` (cell
    coverage) × ``shortlist`` (ADC slack); the per-batch work is
    vectorized over the whole Arrow batch (cell assignment, residual
    encode and LUT gather are batched matmuls/gathers, never per-row
    Python).
    """
    import pandas as pd

    corpus = corpus.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    queries = queries.where(
        F.col(query_vec).isNotNull()
        & F.col(query_id).isNotNull()
        & (l2_norm(F.col(query_vec)) > 0)
    )
    qid_t = queries.schema[query_id].dataType.simpleString()
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = f"query_id {qid_t}, vec_id {cid_t}, cosine_sim double, rank int"
    adc_schema = f"query_id {qid_t}, vec_id {cid_t}, adc_score double"
    qpd = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).toPandas()
    if len(qpd) == 0:
        return corpus.sparkSession.createDataFrame([], out_schema)
    # bounded id-ordered training sample (deterministic across runs and
    # partitionings); empty corpus → schema-stable empty result, the
    # repo-wide empty-input contract
    tr = (
        corpus.select(F.col(corpus_vec).alias("v"))
        .orderBy(F.col(corpus_id))
        .limit(train_cap)
        .toPandas()
    )
    if len(tr) == 0:
        return corpus.sparkSession.createDataFrame([], out_schema)
    train = np.stack(tr["v"].to_numpy()).astype("float64")
    if train.shape[1] % m != 0:
        raise ValueError(
            f"PQ subspace count m={m} must divide the embedding "
            f"dimension {train.shape[1]} (dsub would truncate; with "
            "m > dim every subspace is empty and ADC degenerates to "
            "the coarse term only)"
        )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    # coarse quantizer = Lloyd over the FULL-dim sample (m=1 subspace);
    # unit-normalized → euclidean argmin ≡ cosine argmax
    cents = _pq_train_codebooks(
        train, 1, min(nlist, len(train)), seed
    )[0]  # (nlist, d)
    assign_tr = (
        (train**2).sum(1, keepdims=True)
        - 2.0 * train @ cents.T
        + (cents**2).sum(1)[None, :]
    ).argmin(1)
    resid = train - cents[assign_tr]
    # residual codebooks (seed offset decorrelates the two inits)
    books = _pq_train_codebooks(resid, m, ksub, seed + 1)

    q_ids = qpd["qid"].to_numpy()
    qm = np.stack(qpd["qv"].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    n_q, d = qm.shape
    dsub = d // m
    n_cells = len(cents)
    eff_probe = min(nprobe, n_cells)
    # per-(query, cell) coarse offsets and the nprobe probe mask.
    # The ADC coarse term is the raw dot q·c (that IS the q·v
    # decomposition's first term), but PROBE RANKING uses the
    # assignment metric q·c - ||c||²/2 (euclidean argmin ≡ its argmax)
    # so both sides of the index share one coarse geometry — ranking
    # probes by raw q·c can leave the true-neighbor cell unprobed when
    # centroid norms differ (the FAISS convention matches assignment).
    offsets = qm @ cents.T  # (nq, nlist): q · centroid_c
    probe_score = offsets - 0.5 * (cents**2).sum(1)[None, :]
    probe_rank = np.argsort(-probe_score, axis=1, kind="stable")
    probe_mask = np.zeros((n_q, n_cells), dtype=bool)
    rows = np.arange(n_q)[:, None]
    probe_mask[rows, probe_rank[:, :eff_probe]] = True
    # per-query residual LUTs: luts[q, j, c] = q_sub_j · book_jc
    luts = np.stack(
        [qm[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (nq, m, ksub)
    bc = corpus.sparkSession.sparkContext.broadcast(
        (q_ids, cents, books, luts, offsets, probe_mask)
    )

    def block(it):
        ids_q, ctr, bks, lut, offs, pmask = bc.value
        nq = len(ids_q)
        for pdf in it:
            c_ids = pdf["cid"].to_numpy()
            cm = np.stack(pdf["cv"].to_numpy()).astype("float64")
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            b = len(cm)
            # batched cell assignment + residual encode
            d2c = (
                (cm**2).sum(1, keepdims=True)
                - 2.0 * cm @ ctr.T
                + (ctr**2).sum(1)[None, :]
            )
            cellvec = d2c.argmin(1)  # (b,)
            rm = cm - ctr[cellvec]
            scores = offs[:, cellvec].copy()  # (nq, b) coarse term
            for j in range(m):
                x = rm[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (x**2).sum(1, keepdims=True)
                    - 2.0 * x @ bks[j].T
                    + (bks[j] ** 2).sum(1)[None, :]
                )
                codes_j = d2.argmin(1)  # (b,)
                scores += lut[:, j, codes_j]
            # kill candidates in unprobed cells — at scale those rows
            # live in pruned partitions and are never read at all
            scores = np.where(pmask[:, cellvec], scores, -np.inf)
            out = []
            for qi, qid in enumerate(ids_q):
                col = scores[qi]
                live = np.flatnonzero(np.isfinite(col))
                if len(live) == 0:
                    continue
                take = min(shortlist, len(live))
                order = live[np.lexsort((c_ids[live], -col[live]))[:take]]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": c_ids[order],
                            "adc_score": col[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    partial = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv")
    ).mapInPandas(block, adc_schema)
    w_sl = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc_nulls_last(), F.col("vec_id").asc()
    )
    short = (
        partial.withColumn("__r", F.row_number().over(w_sl))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "vec_id")
    )
    return _rerank_shortlist(
        corpus, queries, short,
        corpus_id, corpus_vec, query_id, query_vec, k, exclude_self,
    )


# ---------------------------------------------------------------------------
# Persisted IVF index — the ANN counterpart of the dedup stack's
# persisted band table: the coarse quantizer runs ONCE at ingest, the
# corpus is laid out partitioned BY cell id, and every query reads only
# its probed cells' files (partition pruning), never the corpus.
# ---------------------------------------------------------------------------


def _table_props(spark, table: str) -> dict:
    return {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }


def _set_epoch(spark, table: str, epoch: int, key: str = "ivf.epoch") -> None:
    """Stamp the shared consistency epoch on one of an index's tables."""
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ('{key}'='{epoch}')"
    )


def _check_epochs(
    spark,
    table: str,
    suffixes: tuple[str, ...],
    key: str,
    heal_hint: str,
) -> None:
    """Verify the data table and every companion carry the SAME epoch
    stamp. A rebalance writes an index's tables non-atomically; a
    crash between the data rewrite and a companion swap would
    otherwise leave rows encoded/partitioned under NEW geometry while
    queries rank with the OLD one — silent recall collapse (ADVICE
    r8). Epoch mismatch fails loudly instead; re-running the rebalance
    rewrites every table and heals the index. Pre-epoch indexes (no
    stamp anywhere) pass unchecked."""
    d = _table_props(spark, table).get(key)
    for sfx in suffixes:
        c = _table_props(spark, f"{table}{sfx}").get(key)
        if d != c:
            raise ValueError(
                f"index {table!r} is torn: data epoch {d!r} != "
                f"{sfx.lstrip('_')} epoch {c!r} — a rebalance crashed "
                f"between its non-atomic writes. Re-run {heal_hint} to heal."
            )


def _index_param(
    spark, table: str, key: str, suffixes: tuple[str, ...]
) -> str | None:
    """Stored build parameter with companion-table fallback (ADVICE
    r9): ``saveAsTable(overwrite)`` drops TBLPROPERTIES, so a crash
    between a rebalance's data rewrite and the ALTER that restores the
    params leaves the data table bare — and the advertised "re-run the
    rebalance to heal" path would itself raise "no stored property".
    Every write/rebalance therefore MIRRORS the build params onto the
    companion tables (written in a different crash window), and this
    lookup falls back to them, so at least one copy survives any
    single mid-sequence crash."""
    v = _table_props(spark, table).get(key)
    if v is not None:
        return v
    for sfx in suffixes:
        v = _table_props(spark, f"{table}{sfx}").get(key)
        if v is not None:
            return v
    return None


def _ivf_set_epoch(spark, table: str, epoch: int) -> None:
    _set_epoch(spark, table, epoch, "ivf.epoch")


def _ivf_check_epochs(spark, table: str) -> None:
    _check_epochs(
        spark, table, ("__centroids",), "ivf.epoch", "rebalance_ivf_index"
    )


def write_ivf_index(
    spark,
    corpus: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
) -> None:
    """Build and persist an IVF index: train the KMeans coarse
    quantizer (unit-normalized — euclidean ≡ cosine geometry), assign
    every vector its cell, and write the corpus PARTITIONED BY the
    cell id — the directory layout IS the inverted file, so a query
    probing ``nprobe`` of ``nlist`` cells reads ``nprobe/nlist`` of
    the files and the rest never leaves storage (plan-locked partition
    pruning in ``tests/test_similarity_persisted.py``). Centroids land
    in a tiny companion table ``{table}__centroids``; ``nlist``/
    ``seed`` are recorded as table properties (the
    ``write_band_table`` validation pattern).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = corpus.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    vec_t = corpus.schema[corpus_vec].dataType.simpleString()
    if corpus.first() is None:
        # empty ingest: persist a schema-stable EMPTY index (KMeans
        # cannot fit zero rows) — the query path then returns no rows
        # instead of crashing, the repo-wide empty-input contract
        spark.createDataFrame(
            [], f"vec_id {cid_t}, embedding {vec_t}, cell int"
        ).write.mode("overwrite").partitionBy("cell").saveAsTable(table)
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES "
            f"('ivf.nlist'='{nlist}', 'ivf.seed'='{seed}')"
        )
        spark.createDataFrame(
            [], "cell int, centroid array<double>"
        ).write.mode("overwrite").saveAsTable(f"{table}__centroids")
        spark.sql(
            f"ALTER TABLE {table}__centroids SET TBLPROPERTIES "
            f"('ivf.nlist'='{nlist}', 'ivf.seed'='{seed}')"
        )
        _ivf_set_epoch(spark, table, 0)
        _ivf_set_epoch(spark, f"{table}__centroids", 0)
        return
    c_norm = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("embedding"),
        _unit_normalize(F.col(corpus_vec)).alias("__cn"),
    ).withColumn("__features", array_to_vector("__cn"))
    model = KMeans(k=nlist, seed=seed, featuresCol="__features").fit(c_norm)
    assigned = model.transform(c_norm).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    )
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .saveAsTable(table)
    )
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('ivf.nlist'='{nlist}', 'ivf.seed'='{seed}')"
    )
    centroids = [
        (i, [float(x) for x in ctr])
        for i, ctr in enumerate(model.clusterCenters())
    ]
    spark.createDataFrame(
        centroids, "cell int, centroid array<double>"
    ).write.mode("overwrite").saveAsTable(f"{table}__centroids")
    # mirror the build params onto the companion so a torn rebalance
    # can still recover them (ADVICE r9 — see _index_param)
    spark.sql(
        f"ALTER TABLE {table}__centroids SET TBLPROPERTIES "
        f"('ivf.nlist'='{nlist}', 'ivf.seed'='{seed}')"
    )
    _ivf_set_epoch(spark, table, 0)
    _ivf_set_epoch(spark, f"{table}__centroids", 0)


def ivf_topk_from_index(
    spark,
    table: str,
    queries: DataFrame,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted IVF index (:func:`write_ivf_index`): rank the
    stored centroids per query (driver-side numpy over the nlist-row
    centroid table — bounded by the index's own size, never the
    corpus), then scan ONLY the probed cells via an IN-filter the
    parquet source prunes partitions with, and rank candidates with
    exact cosine. Same output contract as ``cosine_topk``; zero
    training or assignment work at query time — the ingest job paid it
    once.
    """
    _ivf_check_epochs(spark, table)
    queries = queries.where(
        F.col(query_vec).isNotNull()
        & F.col(query_id).isNotNull()
        & (l2_norm(F.col(query_vec)) > 0)
    )
    qpd = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).toPandas()
    cpd = spark.table(f"{table}__centroids").toPandas()
    if len(qpd) == 0 or len(cpd) == 0:
        qid_t = queries.schema[query_id].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {qid_t}, vec_id long, cosine_sim double, rank int"
        )
    qm = np.stack(qpd["qv"].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    cm = np.stack(cpd["centroid"].to_numpy()).astype("float64")
    cells = cpd["cell"].to_numpy()
    # probe ranking by the assignment metric q·c - ||c||²/2 (matches
    # ivf_topk / ivfpq_topk — see the probe-metric note in ivf_topk)
    sims = qm @ cm.T - 0.5 * (cm**2).sum(1)[None, :]  # (nq, nlist)
    probe_rows = []
    for qi, qid in enumerate(qpd["qid"]):
        # nearest nprobe cells, ties by cell id (matches ivf_topk)
        order = np.lexsort((cells, -sims[qi]))[:nprobe]
        for c in cells[order]:
            probe_rows.append((qid, int(c)))
    probed_cells = sorted({c for _, c in probe_rows})
    qid_t = queries.schema[query_id].dataType.simpleString()
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, f"query_id {qid_t}, cell int")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    # the IN filter is what the source prunes partitions with — only
    # the probed cells' directories are ever read
    corpus = spark.table(table).where(F.col("cell").isin(probed_cells))
    cand = (
        corpus.join(probes, "cell")
        .join(F.broadcast(q), "query_id")
    )
    if exclude_self:
        cand = cand.where(F.col("vec_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine_sim", _round6z(cosine(F.col("embedding"), F.col("__qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )


def append_ivf_index(
    spark,
    batch: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    return_cell_counts: bool = False,
) -> dict[int, int] | None:
    """Append an ingest batch to a persisted IVF index
    (:func:`write_ivf_index`) WITHOUT retraining: each new vector is
    assigned to its nearest STORED centroid (broadcast nlist×dim
    matrix, one numpy argmin per Arrow batch) and written through the
    same cell partitioning — the mirror of the dedup stack's
    ``append_band_table``. Cost is O(batch); the existing index files
    are never read or rewritten, and queries keep pruning to probed
    cells across any number of appends (drifting centroids degrade
    recall gracefully — the standard IVF trade; retrain with
    :func:`write_ivf_index` when the corpus distribution moves).

    ``return_cell_counts=True`` additionally returns the per-cell row
    counts of EXACTLY what this call appended (computed from the same
    assigned frame the write materialized, via a one-batch persist) —
    the O(batch) increment the streaming service folds into its
    running skew state instead of re-scanning the index per
    micro-batch (VERDICT r10 item 3).
    """
    import pandas as pd

    batch = batch.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    if batch.first() is None:  # nothing to append
        return {} if return_cell_counts else None
    _ivf_check_epochs(spark, table)
    cpd = spark.table(f"{table}__centroids").toPandas()
    if len(cpd) == 0:
        raise ValueError(
            f"IVF index {table!r} has no centroids (built from an empty "
            "corpus) — rebuild with write_ivf_index before appending"
        )
    cm = np.stack(cpd["centroid"].to_numpy()).astype("float64")
    cell_ids = cpd["cell"].to_numpy()
    bc = spark.sparkContext.broadcast((cell_ids, cm))
    cid_t = batch.schema[corpus_id].dataType.simpleString()
    vec_t = batch.schema[corpus_vec].dataType.simpleString()
    schema = f"vec_id {cid_t}, embedding {vec_t}, cell int"

    def assign(it):
        cells, cents = bc.value
        for pdf in it:
            if not len(pdf):  # Arrow can hand over empty batches
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            d2 = (
                (vm**2).sum(1, keepdims=True)
                - 2.0 * vm @ cents.T
                + (cents**2).sum(1)[None, :]
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": cells[d2.argmin(1)].astype("int32"),
                }
            )

    assigned = batch.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    ).mapInPandas(assign, schema)
    if not return_cell_counts:
        assigned.write.mode("append").partitionBy("cell").saveAsTable(table)
        return None
    # one materialization serves the write AND the increment counts
    assigned = assigned.persist()
    assigned.write.mode("append").partitionBy("cell").saveAsTable(table)
    rows = (
        assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assigned.unpersist()
    return {int(r["cell"]): int(r["n"]) for r in rows}


def ivf_cell_sizes(spark, table: str) -> DataFrame:
    """Per-cell row counts of a persisted IVF index — the health metric
    the rebalance decision reads (a partition-column groupBy: computable
    from parquet footers/metadata, never a corpus scan of vector data)."""
    return (
        spark.table(table)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def ivf_cell_skew(spark, table: str) -> tuple[int, float]:
    """(max, median) cell occupancy — max/median is the pruning-health
    ratio: under frozen centroids a drifted append sequence piles new
    vectors into few cells, so probed-cell scans grow toward O(corpus)
    while recall per probed byte collapses."""
    row = (
        ivf_cell_sizes(spark, table)
        .agg(
            F.max("n_vectors").alias("mx"),
            F.expr("percentile(n_vectors, 0.5)").alias("md"),
        )
        .collect()[0]
    )
    return int(row["mx"]), float(row["md"])


def rebalance_ivf_index(
    spark,
    table: str,
    nlist: int | None = None,
    seed: int = 43,
    train_cap: int = 16384,
) -> None:
    """Retrain a persisted IVF index's coarse quantizer on the CURRENT
    corpus and rewrite the cell layout — the missing third verb of the
    index lifecycle (``write`` trains once, ``append`` assigns to
    frozen centroids, ``rebalance`` heals the drift appends accumulate;
    VERDICT r7 item 3). The query path (:func:`ivf_topk_from_index`)
    is untouched: it reads whatever centroids table and partition
    layout exist.

    Training follows the FAISS production shape shared with
    ``ivfpq_topk``: Lloyd k-means over a bounded id-ordered sample of
    unit-normalized vectors (``train_cap`` rows regardless of corpus
    size, deterministic across runs and partitionings) — NOT a full
    Spark ML fit, because a rebalance is routine maintenance and must
    not cost a multi-pass corpus job. Assignment is the same broadcast
    argmin Arrow kernel appends use; the rewrite is ONE corpus pass
    repartitioned by the new cell id. ``nlist`` defaults to the value
    stored in the index's table properties at build time.
    """
    import pandas as pd

    props = _table_props(spark, table)
    if nlist is None:
        stored = _index_param(spark, table, "ivf.nlist", ("__centroids",))
        if stored is None:
            raise ValueError(
                f"IVF index {table!r} has no stored ivf.nlist property "
                "on the data table or its __centroids companion — not "
                "built by write_ivf_index? Pass nlist explicitly."
            )
        nlist = int(stored)
    # materialize BEFORE the overwrite: the rewrite reads the same
    # table it replaces, and only a lineage cut makes that safe.
    # dropDuplicates on vec_id: an index maps id → vector, so duplicate
    # ids are at-least-once re-append artifacts (the streaming ingest's
    # residual crash window) — the rebalance is where they heal
    cur = (
        spark.table(table)
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
        .localCheckpoint(eager=True)
    )
    if cur.first() is None:
        return  # empty index: nothing to rebalance, layout already trivial
    tr = (
        cur.select("embedding")
        .orderBy("vec_id")
        .limit(train_cap)
        .toPandas()
    )
    train = np.stack(tr["embedding"].to_numpy()).astype("float64")
    norms = np.linalg.norm(train, axis=1, keepdims=True)
    train = train[norms[:, 0] > 0] / norms[norms[:, 0] > 0]
    cents = _pq_train_codebooks(train, 1, min(nlist, len(train)), seed)[0]
    cell_ids = np.arange(len(cents))
    bc = spark.sparkContext.broadcast((cell_ids, cents))
    cid_t = cur.schema["vec_id"].dataType.simpleString()
    vec_t = cur.schema["embedding"].dataType.simpleString()
    schema = f"vec_id {cid_t}, embedding {vec_t}, cell int"

    def assign(it):
        cells, ctr = bc.value
        for pdf in it:
            if not len(pdf):  # Arrow can hand over empty batches
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            d2 = (
                (vm**2).sum(1, keepdims=True)
                - 2.0 * vm @ ctr.T
                + (ctr**2).sum(1)[None, :]
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": cells[d2.argmin(1)].astype("int32"),
                }
            )

    # consistency epoch (ADVICE r8): the data rewrite and the centroid
    # swap are two non-atomic writes; stamping both with a shared
    # incremented epoch lets every reader (_ivf_check_epochs) detect a
    # crash between them instead of silently probing a torn index.
    # saveAsTable(overwrite) drops TBLPROPERTIES, so mid-sequence
    # crashes leave a missing-or-stale stamp on exactly one side —
    # every window below is detected.
    epoch = int(props.get("ivf.epoch", "0")) + 1
    assigned = cur.mapInPandas(assign, schema)
    assigned.write.mode("overwrite").partitionBy("cell").saveAsTable(table)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('ivf.nlist'='{nlist}', 'ivf.seed'='{seed}', "
        f"'ivf.epoch'='{epoch}')"
    )
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in zip(cell_ids, cents)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__centroids")
    spark.sql(
        f"ALTER TABLE {table}__centroids SET TBLPROPERTIES "
        f"('ivf.nlist'='{nlist}', 'ivf.seed'='{seed}')"
    )
    _ivf_set_epoch(spark, f"{table}__centroids", epoch)


def compact_index_files(spark, table: str) -> None:
    """Rewrite a cell-partitioned ANN index (IVF or composed IVF+PQ)
    to exactly ONE data file per cell, preserving geometry, stored
    build properties, and the consistency epoch — the ANN mirror of
    ``operators/dedup.py::compact_band_table``. Every
    ``append_ivf_index`` / ``append_ivfpq_index`` (and every streaming
    ingest micro-batch) adds one file per touched cell, so after N
    appends a probed cell's scan opens N small files: partition
    pruning still skips unprobed CELLS, but each probed cell pays N
    file opens and loses row-group-sized reads. Compaction is the
    amortized heal — ONE shuffle of the index data keyed on ``cell``
    (each cell lands in exactly one task, so the partitioned rewrite
    emits exactly one file per cell), no retraining, no re-encoding,
    content byte-identical. The rewrite is the
    :func:`rebalance_ivf_index` in-place recipe — pin the content with
    an eager ``localCheckpoint`` (the overwrite deletes the files it
    was read from), overwrite the SAME table, restore the properties —
    NOT the band table's shadow-table + catalog-rename swap: renaming
    a PARTITIONED table invalidates per-partition catalog locations,
    and a long-lived stream's cloned sessions cache the relation by
    name across that DDL (measured: appends landing after a
    rename-based compaction silently vanished from the next rewrite).
    The epoch is restored unchanged, NOT bumped — geometry did not
    move, so readers' epoch-equality checks hold across the rewrite;
    the overwrite-to-ALTER crash window is the same one every
    rebalance has, detected by the epoch check and healed by the
    rebalance verb."""
    props = {
        k: v
        for k, v in _table_props(spark, table).items()
        if k.startswith(("ivf.", "pq.", "ivfpq."))
    }
    cur = spark.table(table).localCheckpoint(eager=True)
    (
        cur.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .saveAsTable(table)
    )
    if props:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
        spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


# ---------------------------------------------------------------------------
# Persisted PQ index — compression AT REST: the corpus persists as
# m-byte codes (the storage-bound regime pq_topk only simulates by
# fusing encode+scan), queries scan codes without ever reading float
# vectors, and the exact rerank is a point-lookup join on shortlist
# ids. write/append/query, the band-table & IVF lifecycle pattern.
# ---------------------------------------------------------------------------


def _pq_encode_kernel(books: "np.ndarray"):
    """mapInPandas kernel: unit-normalize each vector and emit its m
    nearest-centroid codes — one batched matmul per subspace."""
    import pandas as pd

    m, _, dsub = books.shape

    def encode(it):
        for pdf in it:
            if not len(pdf):  # Arrow can hand over empty batches
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            codes = np.zeros((len(vm), m), dtype="int16")
            for j in range(m):
                x = vm[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (x**2).sum(1, keepdims=True)
                    - 2.0 * x @ books[j].T
                    + (books[j] ** 2).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes)}
            )

    return encode


def write_pq_index(
    spark,
    corpus: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    m: int = 16,
    ksub: int = 64,
    train_cap: int = 16384,
    seed: int = 42,
) -> None:
    """Train PQ codebooks on a bounded id-ordered sample (the FAISS
    production shape shared with ``pq_topk``) and persist the corpus
    as CODES ONLY — ``(vec_id, codes array<smallint>)``, m·2 bytes per
    vector vs 4·dim for floats (m=16 on 64-dim float32: 8× at rest,
    and the ADC scan moves 12× less than the float scan reads).
    Codebooks land flattened in ``{table}__codebooks``
    ``(j, c, centroid)``; build parameters are table properties and
    :func:`append_pq_index` reads them back — no caller knob to drift.
    """
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    schema = f"vec_id {cid_t}, codes array<smallint>"
    src = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    )
    tr = src.select("embedding").orderBy(
        src["vec_id"]
    ).limit(train_cap).toPandas()
    if len(tr) == 0:
        spark.createDataFrame([], schema).write.mode(
            "overwrite"
        ).saveAsTable(table)
        spark.createDataFrame(
            [], "j int, c int, centroid array<double>"
        ).write.mode("overwrite").saveAsTable(f"{table}__codebooks")
        for t in (table, f"{table}__codebooks"):
            spark.sql(
                f"ALTER TABLE {t} SET TBLPROPERTIES "
                f"('pq.m'='{m}', 'pq.ksub'='{ksub}', 'pq.seed'='{seed}')"
            )
        _set_epoch(spark, table, 0, "pq.epoch")
        _set_epoch(spark, f"{table}__codebooks", 0, "pq.epoch")
        return
    train = np.stack(tr["embedding"].to_numpy()).astype("float64")
    if train.shape[1] % m != 0:
        raise ValueError(
            f"PQ subspace count m={m} must divide the embedding "
            f"dimension {train.shape[1]}"
        )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    books = _pq_train_codebooks(train, m, ksub, seed)
    src.mapInPandas(_pq_encode_kernel(books), schema).write.mode(
        "overwrite"
    ).saveAsTable(table)
    rows = [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "j int, c int, centroid array<double>"
    ).write.mode("overwrite").saveAsTable(f"{table}__codebooks")
    # params on BOTH tables: the companion copy is what lets a torn
    # rebalance recover m/ksub (ADVICE r9 — see _index_param)
    for t in (table, f"{table}__codebooks"):
        spark.sql(
            f"ALTER TABLE {t} SET TBLPROPERTIES "
            f"('pq.m'='{m}', 'pq.ksub'='{ksub}', 'pq.seed'='{seed}')"
        )
    _set_epoch(spark, table, 0, "pq.epoch")
    _set_epoch(spark, f"{table}__codebooks", 0, "pq.epoch")


def _pq_check_epochs(spark, table: str) -> None:
    _check_epochs(
        spark, table, ("__codebooks",), "pq.epoch", "rebalance_pq_index"
    )


def _pq_load_books(spark, table: str) -> "np.ndarray":
    cb = spark.table(f"{table}__codebooks").orderBy("j", "c").toPandas()
    if len(cb) == 0:
        return np.zeros((0, 0, 0))
    m = int(cb["j"].max()) + 1
    ksub = int(cb["c"].max()) + 1
    dsub = len(cb["centroid"].iloc[0])
    books = np.zeros((m, ksub, dsub))
    for _, r in cb.iterrows():
        books[int(r["j"]), int(r["c"])] = np.asarray(r["centroid"])
    return books


def append_pq_index(
    spark,
    batch: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Encode an ingest batch with the index's STORED codebooks and
    append its codes — O(batch), the existing code files never read
    (the ``append_band_table`` / ``append_ivf_index`` mirror). Frozen
    codebooks under drift lose reconstruction precision gracefully;
    retrain with :func:`write_pq_index` when the distribution moves."""
    batch = batch.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    if batch.first() is None:
        return
    _pq_check_epochs(spark, table)
    books = _pq_load_books(spark, table)
    if books.size == 0:
        raise ValueError(
            f"PQ index {table!r} has no codebooks (built from an empty "
            "corpus) — rebuild with write_pq_index before appending"
        )
    cid_t = batch.schema[corpus_id].dataType.simpleString()
    schema = f"vec_id {cid_t}, codes array<smallint>"
    batch.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    ).mapInPandas(_pq_encode_kernel(books), schema).write.mode(
        "append"
    ).saveAsTable(table)


def pq_topk_from_index(
    spark,
    table: str,
    queries: DataFrame,
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    shortlist: int = 100,
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted PQ index: the ADC scan reads ONLY the codes
    table (m smallints per vector — per-batch scoring is one LUT
    gather+add per subspace, zero float-vector reads), keeps a
    per-partition partial top-``shortlist`` per query, cuts globally,
    and exactly reranks the shortlist against ``corpus`` — a
    point-lookup join on shortlist ids (at 100 TB: the vector store
    lookup, NOT a scan; plan-locked in
    ``tests/test_similarity_persisted.py``). Same output contract as
    ``cosine_topk``/``pq_topk``."""
    import pandas as pd

    queries = queries.where(
        F.col(query_vec).isNotNull()
        & F.col(query_id).isNotNull()
        & (l2_norm(F.col(query_vec)) > 0)
    )
    qid_t = queries.schema[query_id].dataType.simpleString()
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = f"query_id {qid_t}, vec_id {cid_t}, cosine_sim double, rank int"
    adc_schema = f"query_id {qid_t}, vec_id {cid_t}, adc_score double"
    _pq_check_epochs(spark, table)
    qpd = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).toPandas()
    books = _pq_load_books(spark, table)
    if len(qpd) == 0 or books.size == 0:
        return spark.createDataFrame([], out_schema)
    q_ids = qpd["qid"].to_numpy()
    qm = np.stack(qpd["qv"].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    m, _, dsub = books.shape
    luts = np.stack(
        [qm[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (nq, m, ksub)
    bc = spark.sparkContext.broadcast((q_ids, luts))

    def block(it):
        ids_q, lut = bc.value
        for pdf in it:
            if not len(pdf):  # Arrow can hand over empty batches
                continue
            c_ids = pdf["vec_id"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype("int64")
            b = len(codes)
            scores = np.zeros((len(ids_q), b))
            for j in range(lut.shape[1]):
                scores += lut[:, j, codes[:, j]]
            out = []
            take = min(shortlist, b)
            for qi, qid in enumerate(ids_q):
                col = scores[qi]
                order = np.lexsort((c_ids, -col))[:take]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": c_ids[order],
                            "adc_score": col[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    partial = spark.table(table).mapInPandas(block, adc_schema)
    w_sl = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc_nulls_last(), F.col("vec_id").asc()
    )
    short = (
        partial.withColumn("__r", F.row_number().over(w_sl))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "vec_id")
    )
    return _rerank_shortlist(
        corpus, queries, short,
        corpus_id, corpus_vec, query_id, query_vec, k, exclude_self,
    )


def rebalance_pq_index(
    spark,
    corpus: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    m: int | None = None,
    ksub: int | None = None,
    train_cap: int = 16384,
    seed: int = 43,
) -> None:
    """Retrain a persisted PQ index's codebooks on the CURRENT corpus
    and re-encode every vector in one pass — the rebalance verb of the
    PQ lifecycle (VERDICT r8 item 6), healing the quantization-error
    drift :func:`append_pq_index`'s frozen codebooks accumulate (the
    same failure family :func:`rebalance_ivf_index` fixes for cells).

    The codes table stores no floats, so the rebalance takes the float
    ``corpus`` (the vector store the exact rerank already reads):
    codebooks retrain on a bounded id-ordered sample (``train_cap``
    rows, deterministic — the FAISS production shape), the corpus
    re-encodes in ONE ``mapInPandas`` pass, and codes + codebooks swap
    in under a bumped shared ``pq.epoch`` — every crash window between
    the two non-atomic writes is detected by the epoch check on query
    and append (:func:`_pq_check_epochs`); re-running the rebalance
    heals. ``m``/``ksub`` default to the stored build parameters.
    """
    props = _table_props(spark, table)
    if m is None:
        stored = _index_param(spark, table, "pq.m", ("__codebooks",))
        if stored is None:
            raise ValueError(
                f"PQ index {table!r} has no stored pq.m property on the "
                "data table or its __codebooks companion — not built by "
                "write_pq_index? Pass m explicitly."
            )
        m = int(stored)
    if ksub is None:
        ksub = int(
            _index_param(spark, table, "pq.ksub", ("__codebooks",)) or "64"
        )
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    src = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    )
    tr = src.select("embedding").orderBy(src["vec_id"]).limit(
        train_cap
    ).toPandas()
    if len(tr) == 0:
        return  # empty corpus: nothing to re-encode
    train = np.stack(tr["embedding"].to_numpy()).astype("float64")
    if train.shape[1] % m != 0:
        raise ValueError(
            f"PQ subspace count m={m} must divide the embedding "
            f"dimension {train.shape[1]}"
        )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    books = _pq_train_codebooks(train, m, ksub, seed)
    epoch = int(props.get("pq.epoch", "0")) + 1
    cid_t = src.schema["vec_id"].dataType.simpleString()
    schema = f"vec_id {cid_t}, codes array<smallint>"
    src.mapInPandas(_pq_encode_kernel(books), schema).write.mode(
        "overwrite"
    ).saveAsTable(table)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('pq.m'='{m}', 'pq.ksub'='{ksub}', 'pq.seed'='{seed}', "
        f"'pq.epoch'='{epoch}')"
    )
    rows = [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "j int, c int, centroid array<double>"
    ).write.mode("overwrite").saveAsTable(f"{table}__codebooks")
    spark.sql(
        f"ALTER TABLE {table}__codebooks SET TBLPROPERTIES "
        f"('pq.m'='{m}', 'pq.ksub'='{ksub}', 'pq.seed'='{seed}')"
    )
    _set_epoch(spark, f"{table}__codebooks", epoch, "pq.epoch")


def pq_adc_mse(
    spark,
    table: str,
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> float:
    """Mean squared RECONSTRUCTION error of a persisted PQ index
    against the float corpus — the drift metric a PQ deployment
    monitors (ADC score error is bounded by reconstruction error via
    Cauchy-Schwarz): decode each stored code through the stored
    codebooks and average ||unit(v) − decode(codes)||². One join +
    one Arrow pass; returns a driver-side float (a METRIC, not data).
    """
    import pandas as pd

    books = _pq_load_books(spark, table)
    if books.size == 0:
        return float("nan")
    bc = spark.sparkContext.broadcast(books)
    joined = spark.table(table).join(
        corpus.select(
            F.col(corpus_id).alias("vec_id"),
            F.col(corpus_vec).alias("embedding"),
        ),
        "vec_id",
    )

    def err(it):
        bks = bc.value
        m, _, dsub = bks.shape
        for pdf in it:
            if not len(pdf):
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            vm /= np.linalg.norm(vm, axis=1, keepdims=True)
            codes = np.stack(pdf["codes"].to_numpy()).astype("int64")
            rec = np.concatenate(
                [bks[j][codes[:, j]] for j in range(m)], axis=1
            )
            se = ((vm - rec) ** 2).sum(1)
            yield pd.DataFrame({"se": se, "n": np.ones(len(se))})

    agg = (
        joined.mapInPandas(err, "se double, n double")
        .agg(F.sum("se").alias("se"), F.sum("n").alias("n"))
        .first()
    )
    return float(agg["se"] / agg["n"]) if agg["n"] else float("nan")


# ---------------------------------------------------------------------------
# Composed persisted IVF+PQ index (VERDICT r8 item 5) — the
# billion-vector production layout: residual CODES at rest,
# partitioned by coarse cell. Queries prune to probed-cell partitions
# AND scan compressed — the multiplied savings ivfpq_topk computes
# transiently, now with both index halves persisted
# (write/append/query, the band-table lifecycle pattern).
# ---------------------------------------------------------------------------


def _ivfpq_check_epochs(spark, table: str) -> None:
    _check_epochs(
        spark,
        table,
        ("__centroids", "__codebooks"),
        "ivfpq.epoch",
        "write_ivfpq_index",
    )


def _ivfpq_encode_kernel(cents: "np.ndarray", books: "np.ndarray"):
    """mapInPandas kernel: assign each vector its nearest coarse cell
    (euclidean over unit vectors ≡ cosine) and PQ-encode its RESIDUAL
    against the cell centroid — batched matmuls throughout."""
    import pandas as pd

    m, _, dsub = books.shape

    def encode(it):
        for pdf in it:
            if not len(pdf):
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            vm /= np.linalg.norm(vm, axis=1, keepdims=True)
            d2c = (
                (vm**2).sum(1, keepdims=True)
                - 2.0 * vm @ cents.T
                + (cents**2).sum(1)[None, :]
            )
            cell = d2c.argmin(1)
            rm = vm - cents[cell]
            codes = np.zeros((len(vm), m), dtype="int16")
            for j in range(m):
                x = rm[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (x**2).sum(1, keepdims=True)
                    - 2.0 * x @ books[j].T
                    + (books[j] ** 2).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "codes": list(codes),
                    "cell": cell.astype("int32"),
                }
            )

    return encode


def write_ivfpq_index(
    spark,
    corpus: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    nlist: int = 16,
    m: int = 8,
    ksub: int = 16,
    train_cap: int = 16384,
    seed: int = 42,
) -> None:
    """Build and persist the composed IVF+PQ index: coarse quantizer +
    residual codebooks train on ONE bounded id-ordered sample (the
    FAISS ``IVFx,PQy`` shape ``ivfpq_topk`` computes transiently),
    then one corpus pass writes ``(vec_id, codes, cell)`` PARTITIONED
    BY cell — the directory layout is the inverted file AND the rows
    are m·2-byte residual codes, so a query reads ``nprobe/nlist`` of
    the files at PQ compression: the multiplied savings, both at rest.
    Centroids and codebooks land in companion tables; build params are
    table properties; all three tables share an ``ivfpq.epoch`` stamp
    (torn multi-table writes fail loudly at query/append time)."""
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    schema = f"vec_id {cid_t}, codes array<smallint>, cell int"
    src = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    )
    props = (
        f"'ivfpq.nlist'='{nlist}', 'ivfpq.m'='{m}', "
        f"'ivfpq.ksub'='{ksub}', 'ivfpq.seed'='{seed}'"
    )
    tr = src.select("embedding").orderBy(src["vec_id"]).limit(
        train_cap
    ).toPandas()
    if len(tr) == 0:
        spark.createDataFrame([], schema).write.mode(
            "overwrite"
        ).partitionBy("cell").saveAsTable(table)
        spark.createDataFrame(
            [], "cell int, centroid array<double>"
        ).write.mode("overwrite").saveAsTable(f"{table}__centroids")
        spark.createDataFrame(
            [], "j int, c int, centroid array<double>"
        ).write.mode("overwrite").saveAsTable(f"{table}__codebooks")
        for t in (table, f"{table}__centroids", f"{table}__codebooks"):
            spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ({props})")
            _set_epoch(spark, t, 0, "ivfpq.epoch")
        return
    train = np.stack(tr["embedding"].to_numpy()).astype("float64")
    if train.shape[1] % m != 0:
        raise ValueError(
            f"PQ subspace count m={m} must divide the embedding "
            f"dimension {train.shape[1]}"
        )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    cents = _pq_train_codebooks(train, 1, min(nlist, len(train)), seed)[0]
    assign_tr = (
        (train**2).sum(1, keepdims=True)
        - 2.0 * train @ cents.T
        + (cents**2).sum(1)[None, :]
    ).argmin(1)
    books = _pq_train_codebooks(train - cents[assign_tr], m, ksub, seed + 1)
    src.mapInPandas(_ivfpq_encode_kernel(cents, books), schema).write.mode(
        "overwrite"
    ).partitionBy("cell").saveAsTable(table)
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "j int, c int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__codebooks")
    # params mirrored onto all three tables: a crash that loses one
    # copy leaves two others for _index_param to recover (ADVICE r9)
    for t in (table, f"{table}__centroids", f"{table}__codebooks"):
        spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ({props})")
        _set_epoch(spark, t, 0, "ivfpq.epoch")


def _ivfpq_load(spark, table: str):
    """(centroids (nlist, d), cell_ids (nlist,), codebooks (m, ksub,
    dsub)) from the companion tables — index-sized driver reads."""
    cpd = spark.table(f"{table}__centroids").orderBy("cell").toPandas()
    books = _pq_load_books(spark, table)
    if len(cpd) == 0 or books.size == 0:
        return None
    cents = np.stack(cpd["centroid"].to_numpy()).astype("float64")
    return cents, cpd["cell"].to_numpy(), books


def append_ivfpq_index(
    spark,
    batch: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    return_cell_counts: bool = False,
) -> dict[int, int] | None:
    """Append an ingest batch to a persisted IVF+PQ index without
    retraining: assign to the nearest STORED centroid, encode the
    residual with the STORED codebooks, append through the same cell
    partitioning — O(batch), existing files never read. Both drift
    modes (cell skew, quantization error) degrade gracefully; heal
    with :func:`rebalance_ivfpq_index` (bounded-sample retrain of both
    quantizers + one re-encode pass) when the distribution moves.

    ``return_cell_counts`` mirrors :func:`append_ivf_index`: the
    per-cell counts of exactly what this call appended, for the
    streaming service's O(batch) incremental skew fold."""
    batch = batch.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    if batch.first() is None:
        return {} if return_cell_counts else None
    _ivfpq_check_epochs(spark, table)
    loaded = _ivfpq_load(spark, table)
    if loaded is None:
        raise ValueError(
            f"IVF+PQ index {table!r} has no centroids/codebooks (built "
            "from an empty corpus) — rebuild with write_ivfpq_index "
            "before appending"
        )
    cents, _, books = loaded
    cid_t = batch.schema[corpus_id].dataType.simpleString()
    schema = f"vec_id {cid_t}, codes array<smallint>, cell int"
    encoded = batch.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    ).mapInPandas(_ivfpq_encode_kernel(cents, books), schema)
    if not return_cell_counts:
        encoded.write.mode("append").partitionBy("cell").saveAsTable(table)
        return None
    encoded = encoded.persist()
    encoded.write.mode("append").partitionBy("cell").saveAsTable(table)
    rows = (
        encoded.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    encoded.unpersist()
    return {int(r["cell"]): int(r["n"]) for r in rows}


def rebalance_ivfpq_index(
    spark,
    corpus: DataFrame,
    table: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    nlist: int | None = None,
    m: int | None = None,
    ksub: int | None = None,
    train_cap: int = 16384,
    seed: int = 43,
) -> None:
    """Rebalance the COMPOSED IVF+PQ index — the last cell of the
    lifecycle grid (VERDICT r9 item 1): band table, IVF, and PQ each
    already have their rebalance verb, and the composed index is the
    one that accumulates BOTH drift modes at once under frozen
    geometry (appends pile into few cells, degrading partition
    pruning, AND residual quantization error grows where the codebooks
    never trained — ``pq_adc_mse``-style).

    The codes table stores no floats, so — like
    :func:`rebalance_pq_index` — the rebalance takes the float
    ``corpus`` (the vector store the exact rerank already reads).
    Coarse quantizer and residual codebooks retrain on ONE bounded
    id-ordered sample (``train_cap`` rows regardless of corpus size,
    deterministic — the FAISS production shape shared with
    :func:`write_ivfpq_index`), then the corpus re-encodes AND
    re-partitions in one ``mapInPandas`` pass. ``vec_id`` duplicates
    are dropped first (the :func:`rebalance_ivf_index` healing
    pattern: an index maps id → vector, duplicate ids are at-least-once
    re-append artifacts). All three tables swap in under a bumped
    shared ``ivfpq.epoch`` — every crash window between the non-atomic
    writes is detected by :func:`_ivfpq_check_epochs`; re-running the
    rebalance heals, and the build params needed for that re-run
    survive any single torn write via the companion-table mirrors
    (``_index_param``). ``nlist``/``m``/``ksub`` default to the stored
    build parameters."""
    props = _table_props(spark, table)
    companions = ("__centroids", "__codebooks")
    if nlist is None:
        stored = _index_param(spark, table, "ivfpq.nlist", companions)
        if stored is None:
            raise ValueError(
                f"IVF+PQ index {table!r} has no stored ivfpq.nlist "
                "property on the data table or its companions — not "
                "built by write_ivfpq_index? Pass nlist explicitly."
            )
        nlist = int(stored)
    if m is None:
        stored = _index_param(spark, table, "ivfpq.m", companions)
        if stored is None:
            raise ValueError(
                f"IVF+PQ index {table!r} has no stored ivfpq.m property "
                "on the data table or its companions — not built by "
                "write_ivfpq_index? Pass m explicitly."
            )
        m = int(stored)
    if ksub is None:
        ksub = int(
            _index_param(spark, table, "ivfpq.ksub", companions) or "16"
        )
    # epoch continues from the LARGEST stamp any of the three tables
    # carries — a previously torn rebalance may have advanced only one
    # side, and the heal must land strictly past all of them
    epoch = 1 + max(
        int(_table_props(spark, f"{table}{s}").get("ivfpq.epoch", "0"))
        for s in ("",) + companions
    )
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull()
        & F.col(corpus_id).isNotNull()
        & (l2_norm(F.col(corpus_vec)) > 0)
    )
    src = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    ).dropDuplicates(["vec_id"])
    tr = src.select("embedding").orderBy(src["vec_id"]).limit(
        train_cap
    ).toPandas()
    if len(tr) == 0:
        return  # empty corpus: nothing to retrain or re-encode
    train = np.stack(tr["embedding"].to_numpy()).astype("float64")
    if train.shape[1] % m != 0:
        raise ValueError(
            f"PQ subspace count m={m} must divide the embedding "
            f"dimension {train.shape[1]}"
        )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    cents = _pq_train_codebooks(train, 1, min(nlist, len(train)), seed)[0]
    assign_tr = (
        (train**2).sum(1, keepdims=True)
        - 2.0 * train @ cents.T
        + (cents**2).sum(1)[None, :]
    ).argmin(1)
    books = _pq_train_codebooks(train - cents[assign_tr], m, ksub, seed + 1)
    cid_t = src.schema["vec_id"].dataType.simpleString()
    schema = f"vec_id {cid_t}, codes array<smallint>, cell int"
    new_props = (
        f"'ivfpq.nlist'='{nlist}', 'ivfpq.m'='{m}', "
        f"'ivfpq.ksub'='{ksub}', 'ivfpq.seed'='{seed}'"
    )
    src.mapInPandas(_ivfpq_encode_kernel(cents, books), schema).write.mode(
        "overwrite"
    ).partitionBy("cell").saveAsTable(table)
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "j int, c int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__codebooks")
    for t in (table, f"{table}__centroids", f"{table}__codebooks"):
        spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ({new_props})")
        _set_epoch(spark, t, epoch, "ivfpq.epoch")


def ivfpq_adc_mse(
    spark,
    table: str,
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> float:
    """Mean squared RECONSTRUCTION error of a persisted IVF+PQ index
    against the float corpus — the composed counterpart of
    :func:`pq_adc_mse` (decode = cell centroid + residual codebook
    lookup), the quantization-drift half of the index's health pair
    (cell skew being the other, via :func:`ivf_cell_skew`, which works
    unchanged on the composed table). One join + one Arrow pass;
    returns a driver-side float (a METRIC, not data)."""
    import pandas as pd

    loaded = _ivfpq_load(spark, table)
    if loaded is None:
        return float("nan")
    cents, cell_ids, books = loaded
    pos_of = {int(c): i for i, c in enumerate(cell_ids)}
    bc = spark.sparkContext.broadcast((cents, pos_of, books))
    joined = spark.table(table).join(
        corpus.select(
            F.col(corpus_id).alias("vec_id"),
            F.col(corpus_vec).alias("embedding"),
        ),
        "vec_id",
    )

    def err(it):
        ctr, pos, bks = bc.value
        mm = bks.shape[0]
        for pdf in it:
            if not len(pdf):
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            vm /= np.linalg.norm(vm, axis=1, keepdims=True)
            codes = np.stack(pdf["codes"].to_numpy()).astype("int64")
            cellpos = np.array([pos[int(c)] for c in pdf["cell"]])
            rec = ctr[cellpos] + np.concatenate(
                [bks[j][codes[:, j]] for j in range(mm)], axis=1
            )
            se = ((vm - rec) ** 2).sum(1)
            yield pd.DataFrame({"se": se, "n": np.ones(len(se))})

    agg = (
        joined.mapInPandas(err, "se double, n double")
        .agg(F.sum("se").alias("se"), F.sum("n").alias("n"))
        .first()
    )
    return float(agg["se"] / agg["n"]) if agg["n"] else float("nan")


def ivfpq_topk_from_index(
    spark,
    table: str,
    queries: DataFrame,
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted IVF+PQ index: rank stored centroids per query
    with the assignment metric q·c − ||c||²/2 (the FAISS convention —
    shared with every IVF path here), prune the scan to the probed
    cells' PARTITIONS via an IN-filter (plan-locked), ADC-score the
    surviving residual codes (coarse offset + m LUT gathers per row,
    one Arrow batch at a time), cut a global per-query shortlist, and
    exactly rerank against the float ``corpus`` — a point-lookup join
    on shortlist ids, never a corpus scan. Same output contract as
    ``cosine_topk``/``ivfpq_topk``; zero training or assignment at
    query time."""
    import pandas as pd

    _ivfpq_check_epochs(spark, table)
    queries = queries.where(
        F.col(query_vec).isNotNull()
        & F.col(query_id).isNotNull()
        & (l2_norm(F.col(query_vec)) > 0)
    )
    qid_t = queries.schema[query_id].dataType.simpleString()
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = f"query_id {qid_t}, vec_id {cid_t}, cosine_sim double, rank int"
    adc_schema = f"query_id {qid_t}, vec_id {cid_t}, adc_score double"
    qpd = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).toPandas()
    loaded = _ivfpq_load(spark, table)
    if len(qpd) == 0 or loaded is None:
        return spark.createDataFrame([], out_schema)
    cents, cell_ids, books = loaded
    q_ids = qpd["qid"].to_numpy()
    qm = np.stack(qpd["qv"].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    n_q = len(qm)
    m, _, dsub = books.shape
    n_cells = len(cents)
    eff_probe = min(nprobe, n_cells)
    # coarse ADC term is the raw dot q·c; probe RANKING uses the
    # assignment metric (see ivfpq_topk's probe-metric note)
    offsets = qm @ cents.T  # (nq, nlist), indexed by centroid ROW
    probe_score = offsets - 0.5 * (cents**2).sum(1)[None, :]
    probe_rank = np.argsort(-probe_score, axis=1, kind="stable")
    # map centroid rows -> stored cell ids; masks/offsets index by the
    # POSITION of a cell id in cell_ids (cell ids are dense from the
    # build, but the lookup stays correct if they ever are not)
    pos_of = {int(c): i for i, c in enumerate(cell_ids)}
    probe_mask = np.zeros((n_q, n_cells), dtype=bool)
    rows_ix = np.arange(n_q)[:, None]
    probe_mask[rows_ix, probe_rank[:, :eff_probe]] = True
    probed_cells = sorted(
        {int(cell_ids[c]) for qi in range(n_q)
         for c in probe_rank[qi, :eff_probe]}
    )
    # per-query residual LUTs precomputed driver-side (nq × m × ksub
    # doubles — query-set-sized, small): luts[q, j, c] = q_sub_j · book_jc
    luts = np.stack(
        [qm[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )
    bc = spark.sparkContext.broadcast(
        (q_ids, luts, offsets, probe_mask, pos_of)
    )

    def block(it):
        ids_q, lut, offs, pmask, pos = bc.value
        mm = lut.shape[1]
        for pdf in it:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype("int64")
            cellpos = np.array([pos[int(c)] for c in pdf["cell"]])
            scores = offs[:, cellpos].copy()
            for j in range(mm):
                scores += lut[:, j, codes[:, j]]
            scores = np.where(pmask[:, cellpos], scores, -np.inf)
            out = []
            for qi, qid in enumerate(ids_q):
                col = scores[qi]
                live = np.flatnonzero(np.isfinite(col))
                if len(live) == 0:
                    continue
                take = min(shortlist, len(live))
                order = live[np.lexsort((c_ids[live], -col[live]))[:take]]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": c_ids[order],
                            "adc_score": col[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    # the IN filter on the partition column is what prunes the scan to
    # probed cells' directories
    codes_scan = spark.table(table).where(F.col("cell").isin(probed_cells))
    partial = codes_scan.mapInPandas(block, adc_schema)
    w_sl = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc_nulls_last(), F.col("vec_id").asc()
    )
    short = (
        partial.withColumn("__r", F.row_number().over(w_sl))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "vec_id")
    )
    return _rerank_shortlist(
        corpus, queries, short,
        corpus_id, corpus_vec, query_id, query_vec, k, exclude_self,
    )
