"""Deduplication operators for large-scale text corpora.

Four families, all shuffle-architected for 100 TB (SURVEY.md north
star; BASELINE.json):

* **exact** — content-hash groupBy; one shuffle on the hash, map-side
  partial aggregation, no data movement of full texts beyond first-seen.
* **MinHash + LSH** — shingle → k minhashes → b bands; candidate pairs
  only where a band matches (equi-join on (band, band-signature) — a
  plain shuffle join AQE can skew-split), then exact-Jaccard
  verification of candidates. Cost ~ O(N·k + candidates), never O(N²).
* **SimHash** — 64-bit signature; banding over 4×16-bit chunks
  guarantees every pair within Hamming distance 3 shares a band
  (pigeonhole), so near-dup candidate generation is again an equi-join.
* **embedding cosine** — random-hyperplane (sign) LSH buckets then
  in-bucket exact cosine (see ``similarity.py`` for the kernels).

Plus two cross-cutting layers:

* **substring level** — positional hashed k-gram tables
  (``_pos_gram_hashes``) feeding duplicate-span reports
  (``substring_dup_spans``, variable k, optional near-verbatim
  normalization) and the cut-and-rebuild cleaner
  (``substring_dedup_clean`` / ``cut_spans_rebuild``, shared with
  ``decontam.decontaminate_spans``).
* **index lifecycle** — the persisted band-key table
  (``write_band_table`` → ``append_band_table`` →
  ``compact_band_table``) with build parameters as table properties,
  bucketed so increments join the corpus side with no Exchange.

Everything is built from JVM higher-order functions (``transform`` /
``aggregate`` / ``array_min``) — zero Python UDFs, full codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions.text import jaccard, word_shingles


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate groups by md5 content hash: one row per distinct
    content with member count and the keeper (minimum id).

    Output: (content_hash STRING, n_dups LONG, keeper_id LONG).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (minimum id) per distinct text content."""
    w_keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(w_keep, on=id_col, how="left_semi")


def line_dedup_keep_first(
    df: DataFrame,
    text_col: str,
    id_col: str,
    unit_tokens: int = 12,
) -> DataFrame:
    """Line/paragraph-level exact dedup with KEEP-FIRST semantics — the
    C4/Dolma-style cleaner: split every document into units, keep each
    distinct unit only at its FIRST occurrence in the global
    (doc_id, unit_idx) order, and re-emit every document rebuilt from
    its surviving units (boilerplate lines repeated across a crawl
    vanish everywhere but their first sighting).

    The synthetic corpus has no newlines, so units are fixed
    ``unit_tokens``-token windows; on a real corpus pass the text
    through a line/paragraph splitter first — the keep-first algebra
    below is splitter-agnostic.

    Scale shape: one unit explode, ONE unit-hash-keyed groupBy whose
    state is a single (doc_id, idx) struct-min (two longs — map-side
    combinable, duplicate-heavy keys collapse before the shuffle), an
    equi-join back on (hash, doc, idx), and a per-document rebuild
    bounded by document length. No windows, no all-pairs, no driver
    loops.

    Output: (id_col, n_units LONG, n_kept LONG, cleaned_text STRING) —
    one row per input document, empty string when every unit was seen
    earlier.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n_units = F.ceil(F.size("__toks") / F.lit(unit_tokens)).cast("long")
    # the tokenized frame feeds the unit explode AND the per-doc totals,
    # and the exploded units feed the keepers groupBy AND the kept
    # probe side — cache both so the tokenizer/slicer pipeline runs
    # once, not three times (the minhash_dedup_pairs caching contract:
    # call spark.catalog.clearCache() after consuming in long-lived
    # sessions)
    toked = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__nu", n_units)
        .cache()
    )
    units = (
        toked.select(
            id_col,
            "__nu",
            F.posexplode(
                F.when(
                    F.col("__nu") > 0,
                    F.transform(
                        F.sequence(F.lit(0), F.col("__nu").cast("int") - 1),
                        lambda i: F.array_join(
                            F.slice(
                                F.col("__toks"),
                                i * unit_tokens + 1,
                                unit_tokens,
                            ),
                            " ",
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("idx", "unit"),
        )
        .withColumn("__h", F.md5(F.col("unit")))
        .cache()  # keepers groupBy + kept probe side
    )
    keepers = units.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("idx").alias("i")))
        .alias("first")
    )
    kept = units.join(keepers, "__h").where(
        (F.col(id_col) == F.col("first.d")) & (F.col("idx") == F.col("first.i"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("unit")))
                ),
                lambda s: s["unit"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    base = toked.select(id_col, F.col("__nu").alias("n_units"))
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        "n_units",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """Array of ``num_hashes`` minhash values over a shingle array.

    Hash family: ``xxhash64(shingle, seed)`` for seed = 1..k — the seed
    participates as an extra hashed column, giving k distinct hash
    functions entirely JVM-side.
    """
    seeds = F.array(*[F.lit(s) for s in range(1, num_hashes + 1)])
    hashed = F.transform(shingles, lambda sh: F.xxhash64(sh))
    return F.transform(
        seeds,
        lambda s: F.array_min(F.transform(hashed, lambda h: F.xxhash64(h, s))),
    )


def _band_keys(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(__id, band_key) rows: one 64-bit LSH band key per band per id.

    Explode-then-aggregate formulation: per (doc, shingle) row compute
    all k hashes as PLAIN columns, then k min-aggregates per doc. Every
    expression stays inside whole-stage codegen (array-lambda HOFs are
    interpreted per element — ~10× slower measured at sf0.1), and the
    partial aggregation makes the shuffle k longs per doc. The
    variable-length shingle string is hashed ONCE to a long, then the k
    hash functions re-hash that 8-byte long with the seed — ~4× less
    hashed bytes than seeding xxhash64 over the string k times. Each
    r-long band slice collapses to one 64-bit key so the join key is
    fixed-width (cheap shuffle) instead of an array.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    seeds = list(range(1, num_hashes + 1))
    exploded = df.select(
        F.col(id_col).alias("__id"), F.explode(shingles_col).alias("__sh")
    ).select("__id", F.xxhash64("__sh").alias("__h"))
    mins = exploded.groupBy("__id").agg(
        *[F.min(F.xxhash64("__h", F.lit(s))).alias(f"__m{s}") for s in seeds]
    )
    band_keys = F.array(
        *[
            F.xxhash64(F.lit(b), *[F.col(f"__m{b * r + j + 1}") for j in range(r)])
            for b in range(bands)
        ]
    )
    return mins.select("__id", F.explode(band_keys).alias("band_key"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Candidate near-duplicate id pairs: ids sharing at least one LSH
    band. Output (id_a, id_b) with id_a < id_b, distinct.

    With r = num_hashes/bands rows per band, a pair with Jaccard j
    becomes a candidate with probability 1-(1-j^r)^bands — at the
    default (r=4, b=32): j=0.5 → 0.87, j=0.8 → ~1-1e-13. Rows with
    empty shingle sets never collide (their minhash is NULL).
    """
    banded = _band_keys(df, id_col, shingles_col, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Verified near-duplicate pairs: MinHash-LSH candidate generation
    followed by exact word-shingle Jaccard ≥ threshold.

    Output: (id_a, id_b, jaccard_sim DOUBLE) with id_a < id_b.
    Default 16 bands × 4 rows: candidate recall 1-(1-j⁴)¹⁶ ≈ 1-3.5e-8
    at j=0.9 (the near-dup regime); raise num_hashes/bands for corpora
    whose near-dup threshold sits lower.

    Caching contract: the shingle table is ``.cache()``d (shared by
    candidate generation and both verify sides) and not unpersisted —
    the result is lazy. Long-lived sessions should
    ``spark.catalog.clearCache()`` after consuming the result; see
    :func:`prefix_filter_jaccard_pairs` for the full rationale.
    """
    sh = (
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(F.col(text_col), shingle_words).alias("__shingles"),
        )
        .where(F.size("__shingles") > 0)
        # referenced by candidate generation AND both verify sides —
        # materialize once instead of recomputing the shingle pipeline 3×
        .cache()
    )
    cand = minhash_lsh_candidates(sh, "__id", "__shingles", num_hashes, bands)
    a = sh.select(F.col("__id").alias("id_a"), F.col("__shingles").alias("__sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__shingles").alias("__sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard_sim", F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def minhash_estimate_certificate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    tolerance: float = 0.25,
) -> DataFrame:
    """Sketch-error certificate for the MinHash estimator — the dedup
    counterpart of ``quantile_error_certificate``: over the verified
    near-dup pairs (same candidates and exact Jaccard as
    :func:`minhash_dedup_pairs`), compute the Jaccard ESTIMATE the
    signatures imply (matching-component fraction) and certify
    ``|estimate − exact| ≤ tolerance`` per pair. A broken hash family,
    a signature/band mismatch, or a silent change in ``num_hashes``
    moves the estimates and breaks the certificate long before recall
    visibly degrades.

    Expectation math: each component matches with probability j, so
    the estimator is Binomial(k, j)/k with σ = √(j(1−j)/k) ≈ 0.0625
    at k=64, j=0.5 — tolerance 0.25 is 4σ (≈6e-5 excursion odds per
    threshold-grade pair, so a red certificate on a NEW corpus means
    a real regression, not an expected estimator tail; this corpus's
    near-dup pairs sit at j ≥ 0.8, ≥ 5σ). The seeded hash family makes
    the computation deterministic, so a green run is stable.

    Output: (id_a, id_b, jaccard_sim DOUBLE, within_tolerance BOOLEAN)
    with id_a < id_b. Signatures are computed ONLY for pair members —
    the candidate id set semi-joins the shingle table before the
    signature expression runs, so the per-doc 64-hash array cost is
    O(pair members), not O(corpus).
    """
    sh = (
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(F.col(text_col), shingle_words).alias("__shingles"),
        )
        .where(F.size("__shingles") > 0)
        .cache()  # candidates + both verify/signature sides (see
        # minhash_dedup_pairs' caching contract)
    )
    cand = minhash_lsh_candidates(sh, "__id", "__shingles", num_hashes, bands)
    pair_ids = (
        cand.select(F.col("id_a").alias("__id"))
        .unionByName(cand.select(F.col("id_b").alias("__id")))
        .distinct()
    )
    # signature cost is O(pair members): restrict BEFORE the 64-hash
    # array expression, not after
    sig = sh.join(pair_ids, "__id", "left_semi").select(
        "__id",
        "__shingles",
        minhash_signature(F.col("__shingles"), num_hashes).alias("__sig"),
    )
    a = sig.select(
        F.col("__id").alias("id_a"),
        F.col("__shingles").alias("__sh_a"),
        F.col("__sig").alias("__sig_a"),
    )
    b = sig.select(
        F.col("__id").alias("id_b"),
        F.col("__shingles").alias("__sh_b"),
        F.col("__sig").alias("__sig_b"),
    )
    est = (
        F.aggregate(
            F.zip_with(
                F.col("__sig_a"),
                F.col("__sig_b"),
                lambda x, y: (x == y).cast("int"),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard_sim", F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6)
        )
        .where(F.col("jaccard_sim") >= threshold)
        .select(
            "id_a",
            "id_b",
            "jaccard_sim",
            (F.abs(est - F.col("jaccard_sim")) <= tolerance).alias(
                "within_tolerance"
            ),
        )
    )


def minhash_incremental_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Incremental dedup: near-duplicate pairs BETWEEN a new batch and
    an existing corpus (the continuous-ingestion shape — each incoming
    shard is checked against the already-accepted corpus, never against
    itself). Output ``(batch_id, corpus_id, jaccard_sim)``.

    Same banded-LSH candidate generation as :func:`minhash_dedup_pairs`
    but as a two-sided equi-join on band keys: candidate volume is
    O(matching bands), never |batch| × |corpus|. At 100 TB the corpus
    band table is computed once and reused across incoming batches
    (write it to a bucketed table on ``band_key``), so each increment
    shuffles only the batch side.

    Caching contract: both shingle tables are ``.cache()``d and not
    unpersisted (the lazy result reads each side twice); call
    ``spark.catalog.clearCache()`` after consuming the result in
    long-lived sessions — see :func:`prefix_filter_jaccard_pairs`.
    """
    def _sh(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            word_shingles(F.col(text_col), shingle_words).alias("__shingles"),
        ).where(F.size("__shingles") > 0)

    sh_c, sh_b = _sh(corpus).cache(), _sh(batch).cache()
    bands_c = _band_keys(sh_c, "__id", "__shingles", num_hashes, bands)
    bands_b = _band_keys(sh_b, "__id", "__shingles", num_hashes, bands)
    cand = (
        bands_b.select(F.col("__id").alias("batch_id"), "band_key")
        .join(
            bands_c.select(F.col("__id").alias("corpus_id"), "band_key"),
            "band_key",
        )
        .select("batch_id", "corpus_id")
        .distinct()
    )
    a = sh_b.select(F.col("__id").alias("batch_id"), F.col("__shingles").alias("__sh_a"))
    b = sh_c.select(F.col("__id").alias("corpus_id"), F.col("__shingles").alias("__sh_b"))
    return (
        cand.join(a, "batch_id")
        .join(b, "corpus_id")
        .withColumn(
            "jaccard_sim", F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6)
        )
        .where(F.col("jaccard_sim") >= threshold)
        .select("batch_id", "corpus_id", "jaccard_sim")
    )


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array, fully columnar.

    Per token, ``xxhash64`` supplies 64 bits; each bit position
    accumulates +1/-1 across tokens; the sign of each accumulator is the
    output bit. Bits are OR-assembled (no additive overflow on bit 63).
    """
    # F.shiftright/shiftleft python wrappers demand a literal shift; the
    # underlying SQL functions take column shifts — call them by name.
    counts = F.aggregate(
        tokens_col,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.when(
                    F.call_function("shiftright", F.xxhash64(t), i).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            ),
            lambda x, y: x + y,
        ),
    )
    bit_values = F.zip_with(
        counts,
        F.sequence(F.lit(0), F.lit(63)),
        lambda c, i: F.when(
            c > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bit_values, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    hash_fn: str = "md5",
) -> tuple[DataFrame, int]:
    """Per-document SimHash signature, explode-then-aggregate form:
    one plain-column hash per token row, then ``bits`` sign-sum
    aggregates per doc (all inside whole-stage codegen, map-side
    partial aggregation shrinks the shuffle to ``bits`` longs/doc).

    ``hash_fn='md5'`` uses a 60-bit token hash both Spark and DuckDB
    can compute bit-identically (first 15 hex chars of md5) — the
    oracle-checkable profile. ``'xxhash64'`` is the cheaper 64-bit
    JVM-only profile.

    Returns ``(signatures, bits)``: a (__id, __sim LONG) frame plus the
    signature width, which callers need for chunked banding.
    """
    from common_survey_data_pipeline_spark.functions.text import tokens

    bits = 60 if hash_fn == "md5" else 64
    tok = df.select(
        F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5("__t"), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64("__t")
    th = tok.select("__id", h.alias("__h"))
    sums = th.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright("__h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__s{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"__s{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("__id", sig.alias("__sim")), bits


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    hash_fn: str = "md5",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ max_hamming
    (≤ 3 guaranteed complete via 4-chunk banding — a pair within
    Hamming 3 must agree on at least one of 4 chunks by pigeonhole;
    larger thresholds are best-effort with the same bands).
    ``bucket_cap`` bounds hub-bucket join fanout on template-heavy
    corpora with NO recall loss at max_hamming ≤ 3 — see
    :func:`hamming_band_pairs`.

    Output: (id_a, id_b, hamming INT). With ``hash_fn='md5'`` the
    result is bit-identical to the all-pairs SQL oracle.
    """
    # docs with zero tokens have no exploded rows, hence no signature —
    # they cannot pair (matching the oracle, where they vanish the same way)
    sigs, bits = simhash_signatures(df, text_col, id_col, hash_fn)
    return hamming_band_pairs(
        sigs, "__id", "__sim", bits, max_hamming, bucket_cap=bucket_cap
    )


def hamming_band_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int = 64,
    max_hamming: int = 3,
    n_chunks: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate id pairs over ANY integer bit-signature column by
    Hamming distance ≤ ``max_hamming``, banded over ``n_chunks``
    equal-width chunks: a pair within Hamming ``n_chunks - 1`` must
    agree on at least one chunk by pigeonhole, so candidate generation
    is an equi-join on (chunk, chunk_val) — never all-pairs (larger
    thresholds are best-effort with the same bands). Shared by text
    SimHash (:func:`simhash_dedup_pairs`) and image pHash
    (``operators/multimodal.py::phash_images``) — one banding engine
    for every Hamming-space signature.

    ``bucket_cap`` (VERDICT r7 watch item 1): with ~65k buckets per
    chunk, a ≥10⁸-signature corpus puts ~N/65k ids in EVERY bucket, and
    skewed corpora (all-same-background images, template text) put far
    more in a few hub buckets — the within-bucket self-join is then
    quadratic per bucket. With a cap set, buckets holding more than
    ``bucket_cap`` rows switch to a RECALL-EXACT secondary sub-split:
    inside an oversized bucket a pair within Hamming ``n_chunks - 1``
    has its ≤ ``n_chunks - 1`` differing bits spread over the other
    ``n_chunks - 1`` chunks, so by pigeonhole SOME other chunk differs
    in ≤ 1 bit — an equi-join on (bucket, other-chunk, value) where the
    probe side also emits every 1-bit flip of its chunk value
    (``chunk_w + 1`` probe keys per other chunk) therefore catches every
    pair the unbounded self-join would, while sub-bucket sizes drop by
    ~2^chunk_w. The trade is the ~(n_chunks-1)(chunk_w+2)× key fanout
    on hub rows only; output is IDENTICAL to the uncapped path whenever
    ``max_hamming ≤ n_chunks - 1`` (property-tested), and best-effort
    beyond that exactly like the base banding. Sub-buckets can still be
    large when signatures collide on 2·chunk_w bits (e.g. true
    duplicates, where the OUTPUT is quadratic) — the cap bounds the
    dominant 16-bit-collision failure, not output size; it does not
    recurse.

    Output: ``(id_a, id_b, hamming INT)`` with ``id_a < id_b``.
    """
    if bucket_cap is not None:
        if bucket_cap < 1:
            raise ValueError(
                f"hamming_band_pairs: bucket_cap must be >= 1, got {bucket_cap}"
            )
        if n_chunks < 2:
            # the sub-split keys on OTHER chunks; with one chunk there
            # are none, so every oversized bucket would emit zero
            # build/probe rows and silently lose all its pairs
            raise ValueError(
                "hamming_band_pairs: bucket_cap requires n_chunks >= 2 "
                f"(got n_chunks={n_chunks}; with a single chunk the "
                "capped sub-split has no other chunk to key on)"
            )
        if max_hamming > n_chunks - 1:
            import warnings

            warnings.warn(
                "hamming_band_pairs: bucket_cap's sub-split is "
                f"recall-exact only for max_hamming <= n_chunks - 1 "
                f"(= {n_chunks - 1}); with max_hamming={max_hamming} "
                "oversized buckets are deduplicated best-effort",
                stacklevel=2,
            )
    chunk_w = bits // n_chunks
    mask = (1 << chunk_w) - 1

    def _chunk_val(col, i):
        return F.shiftright(col, i * chunk_w).bitwiseAND(F.lit(mask))

    chunks = sigs.select(
        F.col(id_col).alias("__id"),
        F.col(sig_col).alias("__sim"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        _chunk_val(F.col(sig_col), i).alias("chunk_val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(
        "__id", "__sim", F.col("c.chunk").alias("chunk"), F.col("c.chunk_val").alias("chunk_val")
    )

    def _bucket_pairs(frame):
        a = frame.alias("a")
        b = frame.alias("b")
        return a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.__id") < F.col("b.__id")),
        ).select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(
                F.col("a.__sim").bitwiseXOR(F.col("b.__sim"))
            ).alias("hamming"),
        )

    if bucket_cap is None:
        pairs = _bucket_pairs(chunks)
    else:
        # bucket size as a count Window over the bucket key: ONE
        # shuffle of the chunk table, vs the aggregate-then-join form's
        # two (the prefix_filter_jaccard_pairs df-attachment trick).
        # r10: CACHE the sized table — four consumers read it (both
        # sides of the small self-join, the big path's build and probe)
        # and each would otherwise re-run the window sort over the
        # reused exchange; blocks are n_chunks×N skinny rows,
        # LRU-evictable, and the cache preserves the (chunk, chunk_val)
        # partitioning so the small self-join needs no further
        # exchange (same caching contract as
        # prefix_filter_jaccard_pairs: clearCache() after consuming in
        # long-lived sessions).
        # (r11 measured and REJECTED: de-skewing this window into a
        # map-side-partial groupBy count BROADCAST back onto a cached
        # chunk table — the count table is bounded by n_chunks·2^chunk_w
        # so it broadcasts — lost badly in a 3-sample adjacent A/B:
        # dedup_simhash_capped sf0.1 3.51 → 4.71 s, sf1 7.81 → 12.49 s.
        # The cached window output feeds four consumers WITH its
        # (chunk, chunk_val) partitioning, which the broadcast-join
        # form forfeits — every consumer then re-exchanges, and those
        # exchanges cost far more than the window sort saved. Skew
        # exposure of the window itself is the hub-bucket case the
        # bucket_cap targets: ~2^chunk_w buckets per chunk bound each
        # window partition at N/2^chunk_w expected rows, and the
        # capped sub-split — not this window — is the guard against
        # pathological concentrations.)
        sized = chunks.withColumn(
            "__bn",
            F.count(F.lit(1)).over(Window.partitionBy("chunk", "chunk_val")),
        ).cache()
        small = sized.where(F.col("__bn") <= bucket_cap).drop("__bn")
        big = sized.where(F.col("__bn") > bucket_cap).drop("__bn")
        # secondary sub-split of oversized buckets: key on
        # (primary chunk, primary value, other chunk j, j's value);
        # the probe side emits j's value plus all chunk_w 1-bit flips,
        # so any pair differing by <= 1 bit in SOME other chunk meets
        # in at least one sub-bucket (see docstring pigeonhole)
        others = F.filter(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _chunk_val(F.col("__sim"), j).alias("jv"),
                    )
                    for j in range(n_chunks)
                ]
            ),
            lambda s: s["j"] != F.col("chunk"),
        )
        build = big.select(
            "__id", "__sim", "chunk", "chunk_val", F.explode(others).alias("o")
        ).select(
            "__id",
            "__sim",
            "chunk",
            "chunk_val",
            F.col("o.j").alias("j"),
            F.col("o.jv").alias("jv"),
        )
        probe = big.select(
            "__id", "__sim", "chunk", "chunk_val", F.explode(others).alias("o")
        ).select(
            "__id",
            "__sim",
            "chunk",
            "chunk_val",
            F.col("o.j").alias("j"),
            F.explode(
                F.array(
                    F.col("o.jv"),
                    *[
                        F.col("o.jv").bitwiseXOR(F.lit(1 << bpos))
                        for bpos in range(chunk_w)
                    ],
                )
            ).alias("jv"),
        )
        a = build.alias("a")
        b = probe.alias("b")
        big_pairs = a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.j") == F.col("b.j"))
            & (F.col("a.jv") == F.col("b.jv"))
            & (F.col("a.__id") < F.col("b.__id")),
        ).select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(
                F.col("a.__sim").bitwiseXOR(F.col("b.__sim"))
            ).alias("hamming"),
        )
        pairs = _bucket_pairs(small).unionByName(big_pairs)
    return pairs.where(F.col("hamming") <= max_hamming).distinct()


def neardup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs: assign every id
    in ``pairs`` the minimum id reachable through the pair graph (the
    cluster's canonical keeper).

    Iterative min-label propagation: each round, every node takes the
    min of its own label and its neighbors' labels — one shuffle join +
    one shuffle aggregate per round, converging in O(graph diameter)
    rounds (near-dup clusters are shallow; ``max_iter`` bounds
    pathological chains). This is the standard large-graph CC formulation
    on a relational engine — no driver-side union-find, no per-node
    state, checkpointing to cut lineage growth. For DEEP graphs (chains,
    social graphs) where diameter-many rounds are unaffordable, use
    :func:`connected_components_star` — identical output contract,
    O(log n) rounds.

    Output: (doc_id, cluster_id) for every id appearing in ``pairs``.

    Convergence is checked every round (count of changed labels); if
    ``max_iter`` rounds pass with labels still moving, the result would
    silently contain SPLIT clusters (one real cluster under several
    labels), so a ``RuntimeWarning`` is raised naming the residual
    changed-label count — callers either raise ``max_iter`` or treat
    the warning as a data-quality signal (a near-dup graph with
    diameter > 20 usually means a degenerate shingle, not real text).
    """
    import warnings

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # edges are re-scanned every round (join + convergence check);
        # without this the whole upstream pair pipeline (e.g. MinHash)
        # re-executes per iteration
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    changed = None  # labels-changed count of the last completed round
    for i in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # localCheckpoint truncates the query lineage (plans double per
        # round otherwise); eager so convergence check reuses it
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        warnings.warn(
            f"neardup_clusters: label propagation did not converge in "
            f"{max_iter} rounds ({changed} labels still changing) — "
            f"clusters may be split; raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_words: int = 3,
) -> DataFrame:
    """EXACT all-pairs word-n-gram Jaccard ≥ threshold — the oracle-
    grade form (quadratic; use ``minhash_dedup_pairs`` at scale, this
    one for verification and modest inputs). Same output contract.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(F.col(text_col), shingle_words).alias("__sh"),
    ).where(F.size("__sh") > 0)
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard_sim", F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_words: int = 3,
    cache_tokens: bool = True,
) -> DataFrame:
    """EXACT set-similarity join via PREFIX FILTERING (SSJoin /
    All-Pairs, Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07): the
    deterministic scale path to the same answer as
    :func:`ngram_jaccard_pairs`, complementing the probabilistic
    :func:`minhash_dedup_pairs`.

    Under a GLOBAL token order, a record's prefix is its first
    ``n − ceil(t·n) + 1`` tokens; any pair with Jaccard ≥ t must share
    at least one prefix token, so equi-joining on prefix tokens loses
    NOTHING, and exact verification of the candidates restores full
    precision. Ordering tokens rarest-first makes prefix tokens rare
    by construction, which bounds the candidate join's per-key fanout.

    Plan (all equi-joins, no quadratic stage, no randomness):
    1. distinct shingle sets per record (narrow, cached — the df count
       and the ordered probe both read it);
    2. global shingle document-frequency as a map-side-partial groupBy
       on the 8-byte shingle hash, joined back shuffled-hash — hot
       shingles collapse before the exchange and AQE can skew-split
       the probe (a count Window could not: no partials, unsplittable
       window partitions — r11 de-skew);
    3. rare-first sort per record, slice the prefix (sort_array over
       (df, shingle) structs — JVM-side); the ordered-token table is
       CACHED (not localCheckpoint-ed: lineage survives executor loss
       and the blocks are LRU-evictable) because the prefix side and
       both verification sides all read it — one materialization
       instead of re-running the token shuffles three times;
    4. candidate pairs = self-equi-join on prefix tokens, de-duped;
    5. exact Jaccard verify on the candidate pairs only.

    Output: ``(id_a, id_b, jaccard_sim)`` — bit-identical to the
    all-pairs form.

    Caching contract (ADVICE r3): with ``cache_tokens=True`` (default)
    the ordered-token table is ``.cache()``d and NOT unpersisted — the
    returned DataFrame is lazy, so the blocks must outlive this call
    for the prefix side and both verification sides to share one
    materialization. Blocks are LRU-evictable, but long-lived sessions
    issuing many of these joins should ``spark.catalog.clearCache()``
    after consuming each result (bench.py does), or pass
    ``cache_tokens=False`` to trade the re-computed token shuffles for
    zero storage footprint.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(
            word_shingles(F.col(text_col), shingle_words)
        ).alias("__sh"),
    ).where(F.size("__sh") > 0)
    if cache_tokens:
        # the shingle build feeds BOTH the document-frequency count and
        # the ordered-token probe below — one materialization instead
        # of two corpus shingle passes (the minhash_dedup_pairs cache)
        sh = sh.cache()

    # r11 (guide §2.5 — the count-Window de-skew): document frequency
    # is a groupBy count on the 8-byte shingle HASH with map-side
    # partial aggregation, joined back shuffled-hash — not the r10
    # count Window over the shingle string. A window has no partial
    # aggregation and AQE cannot split a window partition, so one
    # boilerplate shingle would serialize its whole row set into a
    # single task's sort buffer at 100 TB; here hot shingles collapse
    # map-side, the probe join is AQE-skew-splittable, the df exchange
    # carries 16-byte (hash, count) rows instead of shingle strings,
    # and the token stream's per-partition window SORT disappears.
    tok = sh.select("__id", F.explode("__sh").alias("__t")).withColumn(
        "__th", F.xxhash64("__t")
    )
    dfreq = tok.groupBy("__th").agg(F.count(F.lit(1)).alias("__df"))
    tok = tok.join(dfreq.hint("shuffle_hash"), "__th")
    # rare-first global order: (hash-merged document frequency,
    # shingle) — a deterministic TOTAL order over distinct shingles
    # (both components are pure functions of the shingle, ties broken
    # by the string itself), which is all the prefix-filter theorem
    # requires of the global order; a hash collision merely merges two
    # shingles' df counts, nudging where they sort — candidates can
    # shift, the verified output cannot. sort_array on (df, shingle)
    # structs implements the order JVM-side.
    ordered = (
        tok.groupBy("__id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__df", "__t"))
            ).alias("__ord")
        )
        .select(
            "__id",
            F.transform("__ord", lambda s: s["__t"]).alias("__toks"),
        )
    )
    if cache_tokens:
        ordered = ordered.cache()
    n = F.size("__toks")
    # ADVICE r10: every PRUNE below derives from t_eff, not threshold.
    # The emit filter is round(jaccard, 6) >= threshold, so a pair with
    # exact Jaccard in [threshold − 5e-7, threshold) rounds UP and is
    # emittable — pruning with the unrounded threshold could drop such
    # a rounding-edge pair before the exact verify ever sees it. The
    # guard-banded prunes admit (at most a handful of) extra
    # candidates; the final exact filter is unchanged.
    t_eff = max(1e-9, threshold - 5e-7)
    prefix_len = n - F.ceil(F.lit(t_eff) * n).cast("int") + 1
    # carry set size and 1-based prefix position for the two classic
    # prunes applied INSIDE the candidate join (before any dedup or
    # verification): length filter (J >= t forces t*|A| <= |B| <= |A|/t)
    # and PPJoin's positional filter (the overlap upper bound from the
    # match positions must reach the equivalent-overlap threshold
    # alpha = ceil(t/(1+t) * (|A|+|B|)))
    # prefix tokens join as xxhash64 LONGS, not 3-word shingle strings:
    # the candidate join's shuffle carries 8-byte keys instead of
    # ~25-40-byte text (same trick as the deletion-neighborhood fuzzy
    # join) — a hash collision can only ADD a candidate pair, which the
    # exact Jaccard verify below removes, so recall is untouched
    prefixes = ordered.select(
        F.col("__id"),
        n.alias("__n"),
        F.posexplode(F.slice("__toks", 1, prefix_len)).alias("__pos0", "__p"),
    ).withColumn("__p", F.xxhash64("__p"))
    na, nb = F.col("a.__n"), F.col("b.__n")
    # the 1e-9 slack keeps a one-ulp-high t/(1+t) product from pushing
    # ceil past the true integer alpha (over-pruning would LOSE pairs;
    # an epsilon of under-pruning only admits a few extra candidates)
    alpha = F.ceil(
        F.lit(t_eff / (1.0 + t_eff)) * (na + nb) - F.lit(1e-9)
    )
    ubound = 1 + F.least(na - 1 - F.col("a.__pos0"), nb - 1 - F.col("b.__pos0"))
    cand = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), "__p")
        .where(
            (F.col("a.__id") < F.col("b.__id"))
            & (nb * t_eff <= na)
            & (na * t_eff <= nb)
            & (ubound >= alpha)
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .distinct()
    )
    # r10 TWO-STAGE verify (guide §2.3 — shuffle hashes, not payloads;
    # measured at sf1 the one-stage verify was 12.8 s of the query's
    # 14.9 s because every candidate row carried BOTH full
    # shingle-STRING arrays through two joins):
    #
    # Stage 1 certifies the overlap bound on 8-byte-element hash
    # arrays (~5× fewer join bytes, long equality instead of string):
    # a pair with Jaccard ≥ t needs overlap ≥ α = ⌈t/(1+t)·(na+nb)⌉
    # over the DISTINCT shingle sets. Hashing can only miscount by
    # MERGING distinct shingles (within-doc collisions), and each
    # merge shrinks a doc's hash set by exactly one, so
    # |A∩B| ≤ |ha∩hb| + (na−|ha|) + (nb−|hb|) — the stage-1 keep
    # condition uses that EXACT upper bound, hence no true pair is
    # ever dropped, collisions or not. Stage 2 re-attaches the string
    # arrays for the (output-sized) survivor set only and computes the
    # exact Jaccard that the result reports.
    ha = ordered.select(
        F.col("__id").alias("id_a"),
        F.size("__toks").alias("__na"),
        F.array_distinct(
            F.transform("__toks", lambda t: F.xxhash64(t))
        ).alias("__ha"),
    )
    hb = ordered.select(
        F.col("__id").alias("id_b"),
        F.size("__toks").alias("__nb"),
        F.array_distinct(
            F.transform("__toks", lambda t: F.xxhash64(t))
        ).alias("__hb"),
    )
    pair_alpha = F.ceil(
        F.lit(t_eff / (1.0 + t_eff))
        * (F.col("__na") + F.col("__nb"))
        - F.lit(1e-9)
    )
    overlap_ub = (
        F.size(F.array_intersect("__ha", "__hb"))
        + (F.col("__na") - F.size("__ha"))
        + (F.col("__nb") - F.size("__hb"))
    )
    survivors = (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .where(overlap_ub >= pair_alpha)
        .select("id_a", "id_b")
    )
    a = ordered.select(
        F.col("__id").alias("id_a"), F.col("__toks").alias("__sh_a")
    )
    b = ordered.select(
        F.col("__id").alias("id_b"), F.col("__toks").alias("__sh_b")
    )
    return (
        survivors.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard_sim",
            F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6),
        )
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components via the alternating LARGE-STAR / SMALL-STAR
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the O(log n)-round replacement for
    :func:`neardup_clusters`'s min-label propagation, whose round count
    is the graph DIAMETER (a 10k-node chain needs 10k shuffles; this
    kernel collapses it in ~log₂ rounds by rewiring edges toward
    component minima instead of propagating one hop per round).

    Per round, two edge rewrites, each ONE groupBy-join pair over the
    (symmetric) edge list:

    * large-star: every node points its LARGER neighbors at the
      minimum of its closed neighborhood;
    * small-star: every node and its smaller-or-equal neighbors all
      point at that neighborhood's minimum.

    Both preserve connectivity (every rewired edge stays inside the
    component) and monotonically shrink parent pointers, so the edge
    set converges to per-component stars rooted at the component
    minimum. Convergence = the round changed nothing (checked on edge
    counts + a hash of the edge multiset — one tiny aggregate).

    Output: (doc_id, cluster_id) for every id appearing in ``pairs`` —
    identical contract (and identical result: min reachable id) to
    ``neardup_clusters``, property-tested equivalent in
    ``tests/test_dedup_clusters.py``.
    """
    import warnings

    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_ids = (
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(e):
        return e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _fingerprint(e):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _large_star(e):
        sym = _sym(e)
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e):
        # orient every edge small←large first: (u, v) with v <= u
        directed = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = directed.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        with_min = directed.join(m, "u")
        rewired = with_min.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(
            with_min.select(F.col("u"), F.col("m").alias("v"))
        )
        return rewired.where(F.col("u") != F.col("v")).distinct()

    fp = _fingerprint(edges)
    converged = False
    for i in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_fp = _fingerprint(edges)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    if not converged:
        warnings.warn(
            f"connected_components_star: edge set still changing after "
            f"{max_iter} rounds — components may be split",
            RuntimeWarning,
            stacklevel=2,
        )
    # stars point u -> root; roots never appear as u
    parents = edges.select(
        F.col("u").alias("id"), F.col("v").alias("label")
    )
    return (
        all_ids.join(parents, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("label", "id").alias("cluster_id"),
        )
    )


def minhash_band_keys(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """Public band-key table for a corpus: ``(doc_id, band_key)`` rows,
    one 64-bit LSH band key per band per document — the thing you
    PERSIST at 100 TB. Written bucketed on ``band_key``
    (``sources/bucketing.py::write_bucketed``), every future increment
    joins its own band keys against the corpus table with NO exchange
    on the corpus side (locked by ``tests/test_bucketing.py``); the
    corpus pays its shuffle once, at write time.

    Band keys are only comparable across calls made with the SAME
    ``(shingle_words, num_hashes, bands)`` — persist them alongside the
    table (:func:`write_band_table` records them as table properties
    and :func:`incremental_pairs_vs_band_table` validates against them).
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_words).alias("__shingles"),
    ).where(F.size("__shingles") > 0)
    return _band_keys(sh, "doc_id", "__shingles", num_hashes, bands).select(
        F.col("__id").alias("doc_id"), "band_key"
    )


def _norm_token(t: Column) -> Column:
    """Near-verbatim token normalization: lowercase, ASCII
    alphanumerics only (punctuation/symbols stripped). ASCII classes
    on purpose — the DuckDB oracle twin uses the identical pattern and
    Java/RE2 unicode classes do not agree."""
    return F.regexp_replace(F.lower(t), "[^a-z0-9]", "")


def _pos_gram_hashes(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    normalize: bool = False,
) -> DataFrame:
    """Positional hashed k-gram table ``(id, pos, gh)`` — one row per
    token window, 1-based positions, 8-byte xxhash64 keys on the wire.
    The shared first stage of every substring-level operator
    (:func:`substring_dup_spans`, :func:`substring_dedup_clean`,
    ``decontam.decontaminate_spans``).

    ``normalize=True`` switches from exact-verbatim to NEAR-VERBATIM
    windows: tokens are case-folded and punctuation-stripped in place
    (positions preserved) before gram construction, so windows that
    differ only in case/punctuation collide."""
    from common_survey_data_pipeline_spark.functions.text import _bind, tokens

    toks = tokens(F.col(text_col))
    if normalize:
        toks = F.transform(toks, _norm_token)
    # _bind: Catalyst does no CSE across HOF lambda boundaries — an
    # unbound `toks` re-tokenizes the document PER GRAM POSITION
    # (O(len²) per doc; the r7 bench regression gate caught exactly
    # this: substring_dup_spans 1.7s → 7.3s)
    grams = _bind(
        toks,
        lambda t: F.when(
            F.size(t) < k, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, k)),
            )
        ),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(grams).alias("pos0", "gram"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64("gram").alias("gh"),
    )


def _dup_gram_hits(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    normalize: bool = False,
) -> DataFrame:
    """(id, pos) of every k-gram window that recurs in at least one
    OTHER document — the shared candidate stage of
    :func:`substring_dup_spans` and :func:`substring_dedup_clean`.
    Duplicate detection is one hash-keyed groupBy with two-long state
    (min≠max id). Every verbatim duplicate window is a normalized
    duplicate window, hence verbatim hits ⊆ normalized hits
    (property-tested).

    r10: the positional gram table is CACHED — it feeds both the
    duplicate-gram aggregate and the join probe, and rebuilding it
    means re-running the O(len·k) per-position gram concat + hash over
    the whole corpus (the dominant narrow compute of every substring
    operator). Rows are three fixed-width columns (id, pos, 64-bit
    hash) — far smaller than the text they derive from — and blocks
    are LRU-evictable; same contract as prefix_filter_jaccard_pairs
    (long-lived sessions clearCache() after consuming)."""
    g = _pos_gram_hashes(docs, text_col, id_col, k, normalize).cache()
    dup = (
        g.groupBy("gh")
        .agg(F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx"))
        .where(F.col("__mn") != F.col("__mx"))
        .select("gh")
    )
    return g.join(dup, "gh").select(id_col, "pos")


def substring_dedup_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 6,
) -> DataFrame:
    """The ACTIONABLE form of :func:`substring_dup_spans`: remove every
    token covered by a cross-document duplicate k-gram window (the
    aggressive cut-all-occurrences policy of Lee et al.) and re-emit
    the cleaned text. Output ``(id_col, n_tokens, n_removed,
    cleaned_text)`` for every document; untouched docs round-trip with
    ``n_removed = 0``.

    Scale shape: the duplicate-window stage is the shared hashed-
    shingle pipeline (:func:`_dup_gram_hits`); the cut set explodes
    each hit to its k covered positions (O(hits·k), distinct on
    (doc, pos)); the rebuild anti-joins the token table against the
    cut set and reassembles per document with a bounded
    ``array_sort(collect_list(struct(pos, token)))`` — per-doc state
    is the document's own length, and the only corpus-wide shuffles
    are doc-keyed. Reconstruction necessarily moves the text once; at
    100 TB you run it only over docs with hits (the span report
    prunes the rest).
    """
    hits = _dup_gram_hits(docs, text_col, id_col, k)
    return cut_spans_rebuild(docs, hits, text_col, id_col, k)


def cut_spans_rebuild(
    docs: DataFrame,
    hits: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Shared rebuild stage: remove every token covered by a hit
    window ``(pos .. pos+k-1)`` and re-emit the cleaned text — used by
    :func:`substring_dedup_clean` (hits = cross-document duplicate
    windows) and ``decontam.decontaminate_spans`` (hits = windows
    shared with an eval set). ``hits`` must be ``(id_col, pos)`` with
    1-based window positions over the whitespace tokenization of
    ``text_col``. Output ``(id_col, n_tokens, n_removed,
    cleaned_text)`` for every document in ``docs``.

    Scale shape: O(hits·k) cut-set explode (distinct on (doc, pos)),
    anti-join rebuild, per-doc-bounded ``array_sort(collect_list)`` —
    per-doc state is the document's own length, corpus-wide shuffles
    are doc-keyed only."""
    from common_survey_data_pipeline_spark.functions.text import tokens

    cut = hits.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("tpos"),
    ).distinct()
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    tok = base.select(
        id_col, F.posexplode(F.col("__toks")).alias("pos0", "token")
    ).select(id_col, (F.col("pos0") + 1).alias("tpos"), "token")
    kept = tok.join(cut, [id_col, "tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("tpos", "token"))
                ),
                lambda x: x["token"],
            ),
            " ",
        ).alias("__cleaned"),
    )
    return (
        base.select(id_col, F.size("__toks").cast("long").alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
            F.coalesce(F.col("__cleaned"), F.lit("")).alias("cleaned_text"),
        )
    )


def substring_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 6,
    normalize: bool = False,
) -> DataFrame:
    """Substring-level exact dedup: per-document MAXIMAL token spans
    whose every k-token window appears verbatim in at least one OTHER
    document — the "repeated 50-token run" class of Lee et al.
    (Deduplicating Training Data Makes Language Models Better), i.e.
    duplicated *passages* inside otherwise-unique documents, which
    doc-level dedup (exact / MinHash) cannot see. This generalizes
    ``decontam.ngram_decontaminate`` from cross-corpus to intra-corpus.

    Output one row per maximal run: ``(id_col, span_start, span_end,
    span_tokens, n_dup_grams)`` with 1-based inclusive token indices;
    ``span_tokens = span_end - span_start + 1 = n_dup_grams + k - 1``.

    100 TB shape — equi-joins on hashed shingles, NEVER suffix arrays
    in memory and never an all-pairs stage:

    1. positional k-gram table ``(doc, pos, xxhash64(gram))`` — one
       explode, O(corpus tokens) rows, 8-byte keys on the wire;
    2. cross-document duplicate grams via one hash-keyed groupBy; the
       ≥2-distinct-docs test is ``min(doc) != max(doc)`` (two longs of
       map-side-combinable state — no count-distinct);
    3. hash-keyed equi-join of positions against the duplicate-gram
       set (AQE broadcasts it when small, skew-splits when not);
    4. gaps-and-islands run merge: hit positions within one document
       collapse to maximal runs via ``pos - row_number()`` over a
       per-document window — per-partition state is bounded by max
       DOCUMENT length, not corpus size.

    The 64-bit hash keeps shuffle rows narrow; a collision would need
    ~2³² distinct grams per Birthday bound to appear at all and is
    shared with the prefix-filter/minhash operators' key design.
    """
    hits = _dup_gram_hits(docs, text_col, id_col, k, normalize)
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return runs.groupBy(id_col, "grp").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
        (F.max("pos") + F.lit(k - 1) - F.min("pos") + F.lit(1))
        .cast("long")
        .alias("span_tokens"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    ).drop("grp")


def incremental_pairs_vs_band_table(
    spark,
    band_table: str,
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Incremental near-dup pairs of a fresh ``batch`` against a corpus
    whose band-key table was ALREADY PERSISTED (bucketed on
    ``band_key`` via :func:`minhash_band_keys` +
    ``sources.bucketing.write_bucketed``) — the continuous-ingestion
    fast path :func:`minhash_incremental_pairs` documents: corpus
    signatures are NOT recomputed; candidate generation reads the
    stored table, and because it is bucketed on the join key the
    corpus side joins with NO Exchange (the corpus paid its one
    shuffle at write time). Per-increment cost is O(batch) + the
    candidate verification — never O(corpus).

    ``corpus`` is still needed for the exact-Jaccard VERIFY step, but
    a semi-join on candidate ids filters it BEFORE the shingle
    projection, so per-increment compute is O(candidates) — the corpus
    is scanned (unavoidable without an id index) but never re-shingled
    wholesale.
    Output ``(batch_id, corpus_id, jaccard_sim)`` — identical to
    :func:`minhash_incremental_pairs` by construction.

    ``shingle_words``/``num_hashes``/``bands`` MUST equal the values the
    persisted table was built with — batch band keys computed under any
    other parameters are incompatible with the stored corpus keys and
    would silently miss every pair. Tables written by
    :func:`write_band_table` carry the build parameters as table
    properties and a mismatch raises ``ValueError`` here; for tables
    written another way the caller owns the invariant.

    Caching contract: two intermediates (the batch shingles and the
    candidate-pair set) are ``.cache()``-d because each is consumed
    twice in this one plan; both are O(batch)/O(candidates), never
    O(corpus). As with :func:`minhash_incremental_pairs`, a long-lived
    session that calls this repeatedly should
    ``spark.catalog.clearCache()`` after consuming the result.
    """
    from common_survey_data_pipeline_spark.sources.bucketing import read_bucketed

    stored = band_table_props(spark, band_table)
    if stored:
        asked = {
            "shingle_words": shingle_words,
            "num_hashes": num_hashes,
            "bands": bands,
        }
        diff = {k: (asked[k], stored[k]) for k in stored if asked[k] != stored[k]}
        if diff:
            raise ValueError(
                f"band table {band_table!r} was built with {stored}; "
                "incompatible call parameters: "
                + ", ".join(
                    f"{k}={a} (table has {s})" for k, (a, s) in sorted(diff.items())
                )
            )

    corpus_bands = read_bucketed(spark, band_table)
    sh_b = batch.select(
        F.col(id_col).alias("__id"),
        word_shingles(F.col(text_col), shingle_words).alias("__shingles"),
    ).where(F.size("__shingles") > 0).cache()
    bands_b = _band_keys(sh_b, "__id", "__shingles", num_hashes, bands)
    cand = (
        bands_b.select(F.col("__id").alias("batch_id"), "band_key")
        .join(
            corpus_bands.select(
                F.col("doc_id").alias("corpus_id"), "band_key"
            ),
            "band_key",
        )
        .select("batch_id", "corpus_id")
        .distinct()
        .cache()  # consumed twice (semi-filter + pair join); O(candidates)
    )
    # O(candidates) VERIFY, not O(corpus): semi-join the corpus down to
    # candidate ids BEFORE shingling, so the expensive shingle/array
    # projection runs only for docs a band actually matched (the 64×
    # probe in SCALING.md measured the pre-filter form re-shingling the
    # whole corpus and growing with it)
    cand_ids = cand.select("corpus_id").distinct()
    sh_c = (
        corpus.select(F.col(id_col).alias("corpus_id"), F.col(text_col))
        .join(cand_ids, "corpus_id", "left_semi")
        .select(
            "corpus_id",
            word_shingles(F.col(text_col), shingle_words).alias("__sh_b"),
        )
    )
    a = sh_b.select(
        F.col("__id").alias("batch_id"), F.col("__shingles").alias("__sh_a")
    )
    return (
        cand.join(a, "batch_id")
        .join(sh_c, "corpus_id")
        .withColumn(
            "jaccard_sim",
            F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6),
        )
        .where(F.col("jaccard_sim") >= threshold)
        .select("batch_id", "corpus_id", "jaccard_sim")
    )


# ---------------------------------------------------------------------------
# Band-table lifecycle: write once, append per ingest batch, compact
# periodically — continuous ingestion for the persisted incremental-
# dedup index. At 100 TB the band table is the only state the dedup
# service keeps; these three functions are its entire storage contract.
# ---------------------------------------------------------------------------

_BAND_PROP_KEYS = ("shingle_words", "num_hashes", "bands")


def write_band_table(
    spark,
    corpus: DataFrame,
    table: str,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> None:
    """Build the corpus band-key table and persist it bucketed on
    ``band_key``, recording the LSH build parameters as table
    properties so appends and queries can never drift: band keys are
    only comparable under identical ``(shingle_words, num_hashes,
    bands)``, and :func:`append_band_table` /
    :func:`incremental_pairs_vs_band_table` read the stored values
    back instead of trusting caller-passed knobs.
    """
    from common_survey_data_pipeline_spark.sources.bucketing import (
        write_bucketed,
    )

    write_bucketed(
        minhash_band_keys(
            corpus, text_col, id_col, num_hashes, bands, shingle_words
        ),
        table,
        buckets,
        "band_key",
    )
    props = ", ".join(
        f"'dedup.{k}'='{v}'"
        for k, v in (
            ("shingle_words", shingle_words),
            ("num_hashes", num_hashes),
            ("bands", bands),
        )
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({props})")


def band_table_props(spark, table: str) -> dict:
    """The LSH build parameters stored on a band table by
    :func:`write_band_table` (``{}`` for tables that carry none —
    pre-lifecycle tables stay readable, the caller owns the invariant
    then)."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    raw = {r["key"]: r["value"] for r in rows}
    return {
        k: int(raw[f"dedup.{k}"]) for k in _BAND_PROP_KEYS if f"dedup.{k}" in raw
    }


def _band_table_buckets(spark, table: str) -> int:
    """Bucket count from the catalog (DESCRIBE FORMATTED)."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r["col_name"].strip() == "Num Buckets":
            return int(r["data_type"].strip())
    raise ValueError(f"table {table!r} is not bucketed")


def append_band_table(
    spark,
    batch: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append one ingest batch's band keys to the persisted table.

    The batch's keys are computed with the table's OWN stored build
    parameters (read back from table properties — there is no caller
    knob to get wrong), and written through the same
    ``bucketBy(band_key)`` spec, so the bucketed layout — and with it
    the no-corpus-Exchange join property — survives every append. Cost
    is O(batch): the existing table is not read, only its catalog
    metadata. Each append adds up to ``tasks × buckets`` small files;
    run :func:`compact_band_table` when file counts accumulate.
    """
    props = band_table_props(spark, table)
    if not props:
        raise ValueError(
            f"band table {table!r} carries no dedup.* build properties; "
            "append requires a table written by write_band_table"
        )
    buckets = _band_table_buckets(spark, table)
    df = minhash_band_keys(
        batch,
        text_col,
        id_col,
        props["num_hashes"],
        props["bands"],
        props["shingle_words"],
    )
    (
        df.write.mode("append")
        .bucketBy(buckets, "band_key")
        .sortBy("band_key")
        .saveAsTable(table)
    )


def compact_band_table(spark, table: str) -> None:
    """Rewrite the band table in place, collapsing the small files N
    appends accumulated into exactly ONE file per bucket, preserving
    the bucket spec and the stored build properties.

    Mechanics — a shuffle-FREE per-bucket file merge: with
    ``autoBucketedScan`` pinned off for the read, the scan yields one
    task per bucket (each reading that bucket's accumulated files),
    every task's rows belong to a single bucket by the write-side
    invariant, so the bucketed re-write emits one file per bucket with
    no Exchange anywhere. (A plain read would let the planner pack
    small files across buckets into mixed tasks and fan back out to
    file-per-(task, bucket) — measured 14 files for 8 buckets; an
    explicit ``repartition(buckets, key)`` gets silently elided by the
    planner because the bucketed scan already satisfies the
    partitioning, then auto-bucketed-scan turns the bucketed scan OFF,
    which is how that 14 happens.) The rewrite lands in a shadow table
    and swaps in via catalog rename. The no-corpus-Exchange JOIN
    property is untouched afterwards (test-locked in
    ``tests/test_band_table_lifecycle.py``).
    """
    props = band_table_props(spark, table)
    buckets = _band_table_buckets(spark, table)
    tmp = f"{table}__compacting"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto_key, None)
    spark.conf.set(auto_key, "false")
    try:
        (
            spark.table(table)
            .write.mode("overwrite")
            .bucketBy(buckets, "band_key")
            .sortBy("band_key")
            .saveAsTable(tmp)
        )
    finally:
        if prev is None:
            spark.conf.unset(auto_key)
        else:
            spark.conf.set(auto_key, prev)
    if props:
        kv = ", ".join(f"'dedup.{k}'='{v}'" for k, v in sorted(props.items()))
        spark.sql(f"ALTER TABLE {tmp} SET TBLPROPERTIES ({kv})")
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
