"""Scaling-exponent probe for the heavy operators (dev tool).

Amplifies the sf0.1 corpus k× (k = 1, 4, 16) with an injective per-copy
token remap — copies share NO shingles with each other or the original,
so the duplicate-pair structure (and therefore candidate volume) grows
LINEARLY in k, which is what a real corpus does. An operator that is
linear-ish in the data then shows runtime ratios ≈ k; a hidden
quadratic stage shows ≈ k².

Usage: python tools_scalebench.py   (writes SCALING.md in the repo root)
       python tools_scalebench.py --only op1,op2 [--ks 1,16]
           (targeted re-measurement; prints the rows but does NOT
           rewrite SCALING.md — partial runs must never clobber the
           full table)
       python tools_scalebench.py --skew
           (hot-key stress: times the same join as a naive shuffle
           join, with AQE skew-split, and with salted_join; prints
           the rows for the SCALING.md skew section)
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.operators.dedup import (
    connected_components_star,
    exact_dedup_groups,
    minhash_dedup_pairs,
    prefix_filter_jaccard_pairs,
    simhash_dedup_pairs,
    substring_dup_spans,
)
from common_survey_data_pipeline_spark.operators.bpe import bpe_train
from common_survey_data_pipeline_spark.operators.graph import pagerank
from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    qgram_edit_pairs,
    strdist_neardup_pairs,
)
from common_survey_data_pipeline_spark.operators.sketches import (
    heavy_hitter_tokens,
)
from common_survey_data_pipeline_spark.operators.similarity import cosine_topk
from common_survey_data_pipeline_spark.operators.temporal_joins import asof_join
from common_survey_data_pipeline_spark.workload import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplified_docs(spark, k: int):
    """k disjoint injectively-remapped copies of the documents table."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n = 1 << 32
    copies = []
    for i in range(k):
        if i == 0:
            copies.append(base)
        else:
            remapped = base.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"_{i}")),
                    ),
                    " ",
                ).alias("text"),
            )
            copies.append(remapped)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def amplified_docs_chars(spark, k: int):
    """k copies of documents under a per-copy INJECTIVE CHARACTER remap
    (rotated alphabet): within-copy q-gram/edit structure is preserved
    exactly while copies share NO character q-grams — the right
    amplification for gram-prefix candidate generation. (The word-level
    ``_i``-suffix remap of :func:`amplified_docs` leaves interior
    character grams identical across copies, so every base doc's k
    variants become candidate pairs of each other — k² candidate growth
    that the edit-distance verify rejects; that is real template-corpus
    behavior, but it measures candidate pathology, not operator
    scaling.)"""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    alpha = "abcdefghijklmnopqrstuvwxyz"
    n = 1 << 32
    copies = [base]
    for i in range(1, k):
        rot = alpha[i % 26 :] + alpha[: i % 26]
        copies.append(
            base.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                F.translate("text", alpha, rot).alias("text"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def amplified_embeddings(spark, k: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = 1 << 32
    out = base
    for i in range(1, k):
        out = out.unionByName(
            base.select(
                (F.col("vec_id") + i * n).alias("vec_id"), "embedding"
            )
        )
    return out


def amplified_keys(spark, k: int):
    """k copies of the order-key string pool, each with a copy-unique
    2-char suffix: cross-copy Levenshtein distance is >= 2, so at
    max_dist=1 the true-match structure is exactly k disjoint copies
    of the 1x pool's (linear growth)."""
    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("key")
    )
    out = None
    for i in range(k):
        tag = chr(97 + i) * 2
        c = base.select(F.concat(F.col("key"), F.lit("_" + tag)).alias("key"))
        out = c if out is None else out.unionByName(c)
    return out


def amplified_events(spark, k: int):
    base = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = 1 << 32
    out = base
    for i in range(1, k):
        out = out.unionByName(
            base.select(
                (F.col("event_id") + i * n).alias("event_id"),
                "ts",
                (F.col("user_id") + i * n).alias("user_id"),
                "event_type",
                "value",
            )
        )
    return out


def amplified_part_dir(spark, k: int) -> str:
    """Writes a k×-amplified `part` + `documents` dir under /tmp so the
    REGISTRY queries (which take an sf_dir) run on amplified data.
    p_name gets a 3-char per-copy tag → cross-copy Levenshtein ≥ 3, so
    the true ER-match structure grows linearly (matches stay within a
    copy at the ≤2 threshold)."""
    out = f"/tmp/csdp_scale_k{k}"
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_partkey", "p_name"
    )
    n = 1 << 32
    copies = []
    for i in range(k):
        tag = chr(97 + i) * 3
        copies.append(
            part.select(
                (F.col("p_partkey") + i * n).alias("p_partkey"),
                F.concat(F.col("p_name"), F.lit(" " + tag)).alias("p_name"),
            )
        )
    amp = copies[0]
    for c in copies[1:]:
        amp = amp.unionByName(c)
    amp.write.mode("overwrite").parquet(f"{out}/part.parquet")
    amplified_docs(spark, k).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def synthetic_graph(spark, k: int, chain: int = 2000, star: int = 5000):
    """k disjoint copies of (chain + star) as SYMMETRIC directed edges:
    the chain stresses diameter (CC round count must stay ~log, not
    O(chain)), the star stresses hub skew; per-copy node offsets keep
    components disjoint so true structure grows linearly in k."""
    off = 1 << 32
    ch = spark.range(chain - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    st = spark.range(star).select(
        F.lit(0).cast("long").alias("u"), (F.col("id") + chain).alias("v")
    )
    base = ch.unionByName(st)
    ks = spark.range(k).select((F.col("id") * off).alias("koff"))
    und = base.crossJoin(ks).select(
        (F.col("u") + F.col("koff")).alias("u"),
        (F.col("v") + F.col("koff")).alias("v"),
    )
    sym = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return und, sym


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def hamming_hub_probe(
    ns=(20_000, 80_000, 320_000), cap: int = 1024, uncapped_max: int = 100_000
) -> None:
    """Hub-bucket stress for ``hamming_band_pairs`` (VERDICT r7 item 2):
    EVERY signature shares chunk 0 (the all-same-background-image /
    template-text shape), so the uncapped within-bucket self-join is
    quadratic in N while the capped secondary sub-split should stay
    ~linear. 10% of rows are planted near-dups (<= 3 flips in the upper
    bits) so both variants chase identical true pairs; counts are
    asserted equal — the cap is recall-exact at max_hamming 3.
    """
    from common_survey_data_pipeline_spark.operators.dedup import (
        hamming_band_pairs,
    )

    spark = get_spark(
        app_name="csdp-hub-probe",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "24g", "spark.ui.enabled": "false"},
    )
    print(f"| N (all in ONE 16-bit bucket) | uncapped (s) | cap={cap} (s) | pairs |")
    print("|---|---|---|---|")
    for n in ns:
        base = spark.range(n).select(
            F.col("id"),
            # upper 47 bits from a hash, low 16 pinned to the hub value
            F.shiftleft(
                F.abs(F.xxhash64("id")) % F.lit(1 << 47), 16
            ).bitwiseOR(F.lit(0xBEEF)).alias("sig"),
        )
        planted = base.where(F.col("id") < n // 10).select(
            (F.col("id") + n).alias("id"),
            # flip 1-3 upper bits, deterministic per id
            F.col("sig")
            .bitwiseXOR(F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                " 16 + CAST(pmod(xxhash64(id, 1), 47) AS INT))"
            ))
            .bitwiseXOR(F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                " 16 + CAST(pmod(xxhash64(id, 2), 47) AS INT))"
            ))
            .alias("sig"),
        )
        sigs = base.unionByName(planted).localCheckpoint()
        t_cap = timed(
            lambda: hamming_band_pairs(
                sigs, "id", "sig", 64, 3, bucket_cap=cap
            ).count()
        )
        n_cap = hamming_band_pairs(
            sigs, "id", "sig", 64, 3, bucket_cap=cap
        ).count()
        if n <= uncapped_max:
            t_un = timed(
                lambda: hamming_band_pairs(sigs, "id", "sig", 64, 3).count()
            )
            n_un = hamming_band_pairs(sigs, "id", "sig", 64, 3).count()
            assert n_cap == n_un, f"recall drift at N={n}: {n_cap} != {n_un}"
            shown = f"{t_un:.1f}"
        else:
            # N²/2 candidate rows — the quadratic this cap exists to
            # avoid; skipped rather than burning minutes proving it
            shown = "skipped (quadratic)"
        print(f"| {n:,} | {shown} | {t_cap:.1f} | {n_cap:,} |")


def bpe_delta_probe() -> None:
    """Per-iteration cost probe for delta-maintained BPE training
    (VERDICT r8 item 3): vocab size and affected-word count scale
    INDEPENDENTLY, and per-iteration time must track the affected
    count, not the vocab.

    Corpus construction pins every argmax to a planted structure:
    ``P`` planted words share an alternating core ``("ab")*256`` (each
    framed by a per-word unique codepoint so the words are distinct),
    giving the round-j merged pair a count ≥ P — while the ``V`` noise
    words are unique 2-codepoint strings whose single pair has count
    exactly 1, so noise can never win a merge and the affected set is
    exactly the P planted words, every round. The expected merge
    sequence ((a,b) → (ab,ab) → ...) is asserted, so a probe whose
    corpus drifted off-plan fails instead of measuring the wrong thing.

    Per-iteration time = (t(k=8) − t(k=1)) / 7, isolating the loop from
    the shared corpus pass + initial pair build. Delta vs recount
    (:func:`_train_recount`) at each point.
    """
    import functools

    from common_survey_data_pipeline_spark.operators.bpe import bpe_train

    train_delta = functools.partial(bpe_train, strategy="delta")
    train_recount = functools.partial(bpe_train, strategy="recount")

    spark = get_spark(
        app_name="csdp-bpe-delta-probe",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g", "spark.ui.enabled": "false"},
    )

    core = "ab" * 256

    def corpus(P: int, V: int):
        words = [
            chr(0x3000 + i) + core + chr(0x5000 + i) for i in range(P)
        ] + [
            chr(0x1100 + i // 2048) + chr(0x6000 + i % 2048)
            for i in range(V)
        ]
        docs = [
            (d, " ".join(words[d * 100 : (d + 1) * 100]))
            for d in range((len(words) + 99) // 100)
        ]
        return spark.createDataFrame(
            docs, "doc_id long, text string"
        ).repartition(32).localCheckpoint(eager=True)

    def per_iter(train, docs) -> float:
        m8 = None

        def run8():
            nonlocal m8
            m8 = train(docs, k=8)

        t8 = timed(run8)
        # the probe is only meaningful while every merge stays planted
        assert [m[1:3] for m in m8[:2]] == [("a", "b"), ("ab", "ab")], m8
        assert len(m8) == 8, m8
        t1 = timed(lambda: train(docs, k=1))
        return (t8 - t1) / 7

    # codegen/JIT warmup on a throwaway corpus: the first training in a
    # fresh JVM pays the generated-class compile for every plan shape,
    # which would otherwise land entirely on the first table row
    warm = corpus(16, 5_000)
    per_iter(train_delta, warm)
    per_iter(train_recount, warm)
    warm.unpersist()

    print("| experiment | P (affected) | V (vocab noise) | delta s/iter | recount s/iter |")
    print("|---|---|---|---|---|")
    for P, V, tag in (
        (64, 50_000, "A: vocab 16x, affected fixed"),
        (64, 200_000, "A"),
        (64, 800_000, "A"),
        (256, 200_000, "B: affected 16x, vocab fixed"),
        (1_024, 200_000, "B"),
        (4_096, 200_000, "B"),
    ):
        docs = corpus(P, V)
        d = per_iter(train_delta, docs)
        r = per_iter(train_recount, docs)
        print(f"| {tag} | {P} | {V} | {d:.2f} | {r:.2f} |")
        docs.unpersist()
        spark.catalog.clearCache()


def skew_probe() -> None:
    """Hot-key join stress: 16M-row fact where ONE key holds 50% of the
    rows, joined to a 100k-row dim, feeding a per-row transform (sha2)
    + global aggregate — the shape of a real pipeline stage (join then
    compute per joined row). Broadcast is disabled for the probe (the
    100 TB scenario it models is a dim too big to broadcast), so the
    naive plan shuffles both sides and the hot key's 8M rows land on a
    single reducer — the classic straggler.

    The PRIMARY evidence is deterministic: the per-reducer row
    distribution under Spark's actual partitioning function (Murmur3
    ``F.hash`` == ``hashpartitioning``). On one box wall-clock is a
    weak skew signal — a straggler core still runs at full local memory
    bandwidth, and this sandbox's timing noise (GC of a 24g heap,
    external tenants) swamps the effect; on a 1000-executor cluster the
    max/avg reducer-load ratio IS the wall-clock ratio, because the
    straggler holds the stage open while 999 executors idle. Wall times
    are printed as a secondary, caveated signal. Three plans over the
    SAME inputs, all verified to return the same aggregate value:

    * naive      — shuffle join, AQE skew-split OFF (what a non-adaptive
                   engine, or a skewed key feeding a WINDOW, does)
    * aqe_skew   — shuffle join, AQE skew-split ON (Spark's runtime fix;
                   only fires for SMJ/SHJ when the hot partition exceeds
                   its size thresholds)
    * salted(32) — ``temporal_joins.salted_join``: right side replicated
                   32x, left rows spread by row hash; works even where
                   AQE can't kick in (window feeds, non-SMJ plans)
    """
    from common_survey_data_pipeline_spark.operators.temporal_joins import (
        salted_join,
    )

    n_fact, n_dim, n_keys = 16_000_000, 100_000, 100_000
    spark = get_spark(
        app_name="csdp-skewprobe",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
            # the modeled dim does NOT fit in a broadcast at 100 TB —
            # force the shuffle path the probe exists to stress
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    fact = (
        spark.range(n_fact)
        .select(
            F.when(F.pmod("id", F.lit(2)) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .cast("long")
            .alias("user_id"),
            F.col("id").alias("value"),
        )
        .localCheckpoint()
    )
    dim = (
        spark.range(n_dim)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("seg_"), F.pmod("id", F.lit(7))).alias("segment"),
        )
        .localCheckpoint()
    )
    expected = None

    def run(name: str, skew_flag: str, fn) -> None:
        nonlocal expected
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
        counts = []

        def once() -> float:
            dt_box = []

            def act():
                t0 = time.time()
                counts.append(fn())
                dt_box.append(time.time() - t0)

            act()
            return dt_box[0]

        once()  # warm-up (codegen + checkpoint reads)
        best = round(min(once() for _ in range(2)), 2)
        got = set(counts)
        if expected is None:
            expected = got.pop()
            got = {expected}
        assert got == {expected}, f"{name}: row count drifted {got}"
        print(f"| {name} | {best} |")

    def digest(joined) -> int:
        # per-joined-row transform + one-row aggregate: the transform
        # runs INSIDE the join's reduce task, so a hot partition does
        # its share serially — exactly what a downstream per-row
        # compute (tokenize, score, featurize) does to a skewed join
        return joined.select(
            F.sha2(F.concat_ws("_", "value", "segment"), 256).alias("h")
        ).agg(F.sum(F.ascii("h")).alias("s")).collect()[0]["s"]

    hot = n_fact // 2
    print(
        f"Skew probe: fact {n_fact:,} rows ({hot:,} on ONE key), dim "
        f"{n_dim:,} rows, broadcast disabled, 64 shuffle partitions; "
        "join feeds a per-row sha2 + global sum."
    )

    # ---- primary evidence: deterministic reducer-load distribution ----
    # reducer id under Spark's hashpartitioning = pmod(murmur3, n); the
    # salted variant partitions on (key, __salt) with __salt exactly as
    # salted_join computes it (xxhash64 of the whole left row mod 32)
    n_part = 64

    def load_stats(reducer_col) -> tuple[int, int, float]:
        dist = (
            fact.select(F.pmod(reducer_col, F.lit(n_part)).alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("rows"))
            .agg(
                F.max("rows").alias("mx"),
                F.expr("percentile(rows, 0.5)").alias("md"),
                F.avg("rows").alias("av"),
            )
            .collect()[0]
        )
        return int(dist["mx"]), int(dist["md"]), float(dist["av"])

    naive_mx, naive_md, naive_av = load_stats(F.hash("user_id"))
    salt_col = F.pmod(F.xxhash64("user_id", "value"), F.lit(32)).cast("int")
    salt_mx, salt_md, salt_av = load_stats(F.hash("user_id", salt_col))
    print("\nReducer-load distribution (rows per reduce task, 64 tasks):")
    print("| plan | max | median | max/avg |\n|---|---|---|---|")
    print(
        f"| naive (hash on key) | {naive_mx:,} | {naive_md:,} | "
        f"{naive_mx / naive_av:.1f}x |"
    )
    print(
        f"| salted (hash on key+salt32) | {salt_mx:,} | {salt_md:,} | "
        f"{salt_mx / salt_av:.1f}x |"
    )

    # ---- secondary evidence: single-box wall time (noisy, caveated) ----
    print(
        "\nWall time (best-of-2 after warm-up; single-box, noisy — the "
        "distribution above is the scale signal):"
    )
    print("| plan | t (s) |\n|---|---|")
    run(
        "naive shuffle join (AQE skew-split off)",
        "false",
        lambda: digest(fact.join(dim, fact.user_id == dim.c_custkey)),
    )
    run(
        "AQE skew-split",
        "true",
        lambda: digest(fact.join(dim, fact.user_id == dim.c_custkey)),
    )
    run(
        "salted_join(salt=32)",
        "false",
        lambda: digest(
            salted_join(
                fact, dim, left_on="user_id", right_on="c_custkey", salt=32
            )
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated operator names; targeted runs print rows "
        "but do not rewrite SCALING.md",
    )
    ap.add_argument(
        "--ks",
        default="1,4,16",
        help="comma-separated amplification factors (default 1,4,16)",
    )
    ap.add_argument(
        "--skew",
        action="store_true",
        help="run the hot-key join stress probe instead of the "
        "amplification sweep",
    )
    ap.add_argument(
        "--hamming-hub",
        action="store_true",
        help="run the hamming_band_pairs hub-bucket stress probe "
        "(capped vs uncapped on an all-one-bucket signature corpus)",
    )
    ap.add_argument(
        "--bpe-delta",
        action="store_true",
        help="run the delta-vs-recount BPE per-iteration probe "
        "(vocab and affected-word count scaled independently)",
    )
    ap.add_argument(
        "--partitions",
        type=int,
        default=64,
        help="shuffle partitions (default 64; the standard SCALING.md "
        "table is measured at 64 — raise for k>16 probes the way a "
        "real deployment grows partitions with data, e.g. 256 at 64x, "
        "or shuffled-hash build sides outgrow per-task memory)",
    )
    cli = ap.parse_args()
    if cli.skew:
        skew_probe()
        return
    if cli.bpe_delta:
        bpe_delta_probe()
        return
    if cli.hamming_hub:
        hamming_hub_probe()
        return
    only = set(cli.only.split(",")) if cli.only else None
    ks = tuple(int(x) for x in cli.ks.split(","))
    # every lambda receives lazy GETTERS (below), not DataFrames, so a
    # targeted --only run only builds the datasets its operators touch
    ops = {
        "exact_dedup_groups": lambda d, e: exact_dedup_groups(
            d(), "text", "doc_id"
        ).count(),
        "dedup_minhash": lambda d, e: minhash_dedup_pairs(
            d(), "text", "doc_id"
        ).count(),
        "dedup_simhash": lambda d, e: simhash_dedup_pairs(
            d(), "text", "doc_id"
        ).count(),
        "dedup_prefix_filter": lambda d, e: prefix_filter_jaccard_pairs(
            d(), "text", "doc_id", 0.5
        ).count(),
        "substring_dup_spans": lambda d, e: substring_dup_spans(
            d(), "text", "doc_id", k=6
        ).count(),
        # fixed 8 merges isolates the PER-ITERATION scaling of the BPE
        # training loop: the amplified copies' injective token remap
        # grows the word-vocab table ~linearly in k, so per-iteration
        # pair counting should too (the one corpus pass amortizes over
        # the 8 rounds)
        "bpe_train_8iter": lambda d, e: len(bpe_train(d(), k=8)),
        "similarity_topk": lambda d, e: cosine_topk(
            e(),
            e().limit(8).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=10,
        ).count(),
    }
    key_ops = {
        "fuzzy_deletion_bigjoin": lambda kk: strdist_neardup_pairs(
            kk(), "key", max_dist=1
        ).count(),
    }
    event_ops = {
        "asof_join": lambda ev: asof_join(
            ev().where(F.col("event_type") == "purchase"),
            ev().where(F.col("event_type") == "view"),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
        ).count(),
        "token_heavy_hitters": lambda d: heavy_hitter_tokens(
            d().select(
                F.explode(F.split(F.col("text"), " ")).alias("token")
            ),
            d().select(
                F.sum(F.size(F.split(F.col("text"), " "))).alias("total")
            ),
        ).count(),
    }
    import warnings as _w

    def _pagerank_3iter(sym):
        # fixed 3 rounds isolates the PER-ITERATION scaling; the
        # exhaustion warning is expected and suppressed here
        with _w.catch_warnings():
            _w.simplefilter("ignore", RuntimeWarning)
            return pagerank(sym, tol=0.0, max_iter=3, src="u", dst="v").count()

    all_names = (
        list(ops)
        + list(key_ops)
        + list(event_ops)
        + [
            "pagerank_3iter",
            "cc_star_chain",
            "er_sorted_neighborhood",
            "bm25_top_docs",
            "text_fingerprints",
            "inverted_index_postings",
            "j14_qgram_longtext",
        ]
    )
    if only:
        # validate BEFORE the (24g local[32]) session pays JVM startup
        unknown = only - set(all_names)
        if unknown:
            raise SystemExit(f"unknown operators: {sorted(unknown)}")
        all_names = [o for o in all_names if o in only]
    spark = get_spark(
        app_name="csdp-scalebench",
        shuffle_partitions=cli.partitions,
        extra_conf={
            # the driver IS the executor in local mode; the 16x corpus's
            # shingle explosions need real heap
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
            # AQE coalescing re-merges shuffle partitions to the 64MB
            # advisory size, silently overriding --partitions — at 64x a
            # 64MB-on-wire partition decompresses into a >256MB hash
            # relation, which exceeds a task's FAIR-SHARE execution
            # memory in this 32-thread/24g layout (pool/(2*32) ≈ 225MB)
            # and kills pinned shuffled-hash builds. Scale the advisory
            # with the requested partition count so --partitions 256
            # really yields ~4x smaller reduce partitions.
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                max(4 * 1024**3 // cli.partitions, 4 * 1024**2)
            ),
        },
    )
    results: dict[str, dict[int, float]] = {o: {} for o in all_names}
    rows: dict[int, int] = {}

    def lazy(build):
        # memoized dataset getter: built at most once per k, during the
        # untimed warm-up run of the first operator that touches it
        # (localCheckpoint survives the per-run clearCache, so timed
        # runs never pay the build)
        box: list = []

        def get():
            if not box:
                box.append(build())
            return box[0]

        return get

    import gc as _gc

    for k in ks:
        docs = lazy(lambda k=k: amplified_docs(spark, k).localCheckpoint())
        docs_ch = lazy(
            lambda k=k: amplified_docs_chars(spark, k).localCheckpoint()
        )
        embs = lazy(lambda k=k: amplified_embeddings(spark, k).localCheckpoint())
        keys = lazy(lambda k=k: amplified_keys(spark, k).localCheckpoint())
        events = lazy(lambda k=k: amplified_events(spark, k).localCheckpoint())
        graph = lazy(
            lambda k=k: tuple(
                g.localCheckpoint() for g in synthetic_graph(spark, k)
            )
        )
        scaled_dir = lazy(lambda k=k: amplified_part_dir(spark, k))
        # drop the PREVIOUS k's checkpointed datasets deterministically:
        # the rebinds ABOVE released the only Python refs to the prior
        # k's boxes, so this gc (AFTER rebinding — before it, the old
        # getters would still pin the blocks) pushes py4j to free the
        # JVM-side handles and the ContextCleaner unpersists them
        # BEFORE the next k's (memory-hungry) measurements, not at
        # some later GC whim
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        if only is None:
            rows[k] = docs().count()  # SCALING.md header (full runs only)
        thunks = {name: (lambda fn=fn: fn(docs, embs)) for name, fn in ops.items()}
        thunks.update({name: (lambda fn=fn: fn(keys)) for name, fn in key_ops.items()})
        thunks["asof_join"] = lambda: event_ops["asof_join"](events)
        thunks["token_heavy_hitters"] = lambda: event_ops["token_heavy_hitters"](docs)
        thunks["pagerank_3iter"] = lambda: _pagerank_3iter(graph()[1])
        thunks["j14_qgram_longtext"] = lambda: qgram_edit_pairs(
            docs_ch().select(
                "doc_id", F.col("text").substr(1, 160).alias("s")
            ),
            "s",
            "doc_id",
            max_dist=12,
        ).count()
        thunks["cc_star_chain"] = lambda: connected_components_star(
            graph()[0].select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
        ).count()
        thunks["er_sorted_neighborhood"] = lambda: REGISTRY[
            "er_sorted_neighborhood"
        ].fn(spark, scaled_dir()).count()
        thunks["bm25_top_docs"] = lambda: REGISTRY["bm25_top_docs"].fn(
            spark, scaled_dir()
        ).count()

        def _floored_registry_count(name: str) -> int:
            # VERDICT r4 item 7: the two queries that apply
            # parallelism_floor, run on the amplified corpus — verify
            # the floor's guard on whichever branch this k's corpus
            # exercises: a multi-file scan (amplified k >= ~4) already
            # has >= cores partitions and MUST come back unchanged (no
            # extra exchange ever reaches a real corpus); the 1x
            # rewrite is still one part file, where the floor fires
            # exactly as it does on the raw sf tables.
            from common_survey_data_pipeline_spark.sources.tables import (
                load_table,
                parallelism_floor,
            )

            docs = load_table(spark, scaled_dir(), "documents")
            have = docs.rdd.getNumPartitions()
            want = spark.sparkContext.defaultParallelism
            is_noop = parallelism_floor(docs) is docs
            assert is_noop == (have >= want), (
                f"parallelism_floor guard mismatch: {have} scan "
                f"partitions vs want {want}, noop={is_noop}"
            )
            print(
                f"    [{name}] scan partitions={have}, floor "
                + ("NO-OP (multi-file path)" if is_noop else "ACTIVE")
            )
            return REGISTRY[name].fn(spark, scaled_dir()).count()

        thunks["text_fingerprints"] = lambda: _floored_registry_count(
            "text_fingerprints"
        )
        thunks["inverted_index_postings"] = lambda: _floored_registry_count(
            "inverted_index_postings"
        )
        for name, thunk in thunks.items():
            if name not in results:
                continue

            def isolated(t=thunk):
                # same isolation as bench.py: operators that .cache()
                # shared subtrees (prefix filter, minhash) must pay the
                # cache build INSIDE every measured run — Spark dedupes
                # identical cached plans across calls, so without the
                # clear the 1x timed runs ride the warm-up's cache while
                # the 16x runs partially evict, inflating the exponent
                dt = timed(t)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                return dt

            isolated()  # warm the plan/codegen, then drop its cache
            results[name][k] = round(min(isolated() for _ in range(2)), 2)
    klo, khi = min(ks), max(ks)

    def table_rows() -> list[str]:
        body = []
        for name, ts in results.items():
            # clamp to the 10ms timing floor so sub-resolution runs read
            # as "too fast to measure", never as a log(0) crash or fake
            # exponent
            t1, t16 = max(ts[klo], 0.01), max(ts[khi], 0.01)
            # a single-k targeted run has no scale span — no exponent
            exp = (
                f"{math.log(t16 / t1) / math.log(khi / klo):.2f}"
                if khi > klo
                else "n/a"
            )
            cells = " | ".join(str(ts[k]) for k in ks)
            body.append(f"| {name} | {cells} | {exp} |")
        return body

    if only or ks != (1, 4, 16):
        # targeted / non-standard run: print, never rewrite SCALING.md
        hdr = " | ".join(f"t({k}x) s" for k in ks)
        print(f"| operator | {hdr} | exp |")
        print("\n".join(table_rows()))
        return
    lines = [
        "# SCALING — measured scaling exponents of the heavy operators",
        "",
        "Generated by `python tools_scalebench.py`: the sf0.1 corpus is",
        "amplified 4x and 16x with an injective per-copy token remap (no",
        "cross-copy shingle overlap, so true-duplicate structure grows",
        "linearly — the honest amplification; naive row duplication would",
        "grow candidate pairs quadratically by construction). `exp` is",
        "log(t_16x / t_1x) / log 16 — ~1.0 = linear data scaling, ~2.0 = a",
        "hidden quadratic stage. Sub-linear exponents mean fixed overheads",
        "(JVM job scheduling, broadcast builds) still dominate at this",
        "corpus size.",
        "",
        f"Corpus: documents {rows[1]} / {rows[4]} / {rows[16]} rows; "
        "local[32]; times are best-of-2 after a warm-up run.",
        "",
        "Graph probes run on k disjoint copies of a 2000-node chain +",
        "5000-leaf star (chain stresses CC round count — must stay ~log,",
        "never O(diameter); star stresses hub skew); pagerank is pinned",
        "to 3 iterations so the exponent reflects per-round cost.",
        "er_sorted_neighborhood / bm25_top_docs run the REGISTRY query",
        "code on k×-amplified part/documents parquet (per-copy name tags",
        "keep cross-copy Levenshtein ≥ 3 → match structure grows",
        "linearly).",
        "",
        "Measurement is cache-isolated (clearCache + GC after every",
        "run, matching bench.py): operators that .cache() shared",
        "subtrees pay the cache build inside each measured run — prior",
        "rounds' prefix-filter exponent (0.51) rode the warm-up's",
        "surviving cache at 1x while the 16x cache partially evicted,",
        "understating the exponent. Shuffle partitions are FIXED at 64",
        "across k; a scale-aware deployment grows them with data, so",
        "the 16x points include partition-pressure cost a real cluster",
        "would shed.",
        "",
        "| operator | t(1x) s | t(4x) s | t(16x) s | exp |",
        "|---|---|---|---|---|",
    ]
    lines.extend(table_rows())
    lines.append("")
    with open(
        os.path.join(os.path.dirname(__file__), "SCALING.md"), "w"
    ) as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
