"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE final JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

The harness that records this run keeps only a bounded stdout TAIL
(~2000 chars), so the final line is a COMPACT summary kept under 1400
chars: totals, sf, the slowest queries that fit, and the sf1 spot-check
total. The complete per-query breakdown (all queries + the full sf1
section) is written to ``BENCH_LOCAL.json`` next to this script —
round 4's driver bench record was lost to a >2000-char single line.

Each query executes fully (noop sink — no driver-side collect) so the
measured time is plan execution, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.workload import REGISTRY

BENCH_QUERIES = (
    "s1_scan_filter_project",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q6_revenue_delta",
    "q10_returned_revenue",
    "j1_fuzzy_brand_join",
    "j10_fuzzy_bigjoin",
    "j2_best_item_per_order",
    "j6_asof_join",
    "j7_interval_join",
    "j8_salted_skew_join",
    "w1_latest_orders_per_customer",
    "w3_rolling_avg",
    "pivot_event_counts",
    "json_props_stats",
    "text_stats",
    "text_fingerprints",
    "text_pii_redact",
    "text_unigram_logprob",
    "corpus_mix_rebalance",
    "dedup_exact_groups",
    "dedup_minhash",
    "similarity_topk",
    "events_tumbling_1h",
    "events_sessions_30m",
    "q4_order_priority_exists",
    "q7_nation_trade_volume",
    "q9_profit_by_nation_year",
    "q13_order_count_distribution",
    "q22_idle_rich_customers",
    "grouping_sets_revenue",
    "w6_trailing_7d_revenue",
    "locf_gap_fill",
    "decontaminate_ngrams",
    "text_repetition",
    "scd2_user_history",
    "zorder_layout_stats",
    "epoch_shuffle",
    "crossdoc_dup_rate",
    "embedding_kmeans_sizes",
    "j11_attribution_join",
    "quality_weighted_sample",
    "pagerank_parts_2iter",
    "bm25_top_docs",
    "inverted_index_postings",
    "rrf_hybrid_search",
    "token_heavy_hitters",
    "session_transitions",
    "dedup_prefix_filter",
    "embedding_covariance",
    "skyline_parts",
    "zipf_fit",
    "funnel_windowed_3step",
    "er_sorted_neighborhood",
    "multitouch_attribution",
    "embedding_random_projection",
    "j13_jw_blocked_pairs",
    # round 6 additions
    "substring_dup_spans",
    "url_normalize",
    "host_rollup",
    "quantile_error_certificate",
    "events_late_data_accounting",
    "ngram_lm_counts",
    "bpe_pair_counts",
    "quality_logit_score",
    # round 7 additions
    "substring_dup_spans_k12",
    "substring_dup_spans_norm",
    "events_stateful_sessions",
    "multimodal_phash_neardup",
    "host_quality_rollup",
    "similarity_pq",
    "decontaminate_spans_clean",
    "similarity_ivfpq",
    "lm_perplexity_buckets",
    "mix_temperature_weights",
    "vocab_coverage_curve",
    "seqlen_truncation_stats",
    "line_dedup_keep_first",
    "stratified_sample_exact",
    "skew_key_stats",
    "ngram_entropy_diversity",
    "pack_efficiency",
    "split_contamination_matrix",
    "embedding_drift_stats",
    "quality_score_calibration",
    "events_join_state_accounting",
    "doc_language_confusion",
    "winnowing_containment",
    # round 8 additions. The two lifecycle queries whose cost is
    # dominated by INDEX BUILDS (similarity_ivf_rebalanced: write +
    # append + rebalance = three table rewrites + two quantizer
    # trainings; stream_dedup_ingest: band-table build + append + two
    # corpus parquet writes) stay out of the headline set, matching the
    # r7 precedent for similarity_ivf_persisted/dedup_band_table_appended
    # — bench times query PLANS; the build costs are probed in
    # SCALING.md and the correctness gate still runs them per round.
    "bpe_train_merges",
    "bpe_encode_tokens",
    "dedup_simhash_capped",
    "profile_appended",
    "j14_qgram_longtext_join",
    # round 9 additions. similarity_ivfpq_persisted / similarity_pq_
    # rebalanced / stream-ingest stay out (index-build/lifecycle-
    # dominated, the r7/r8 precedent); j15 is a real query plan.
    "j15_editdist_mixed_lengths",
)

# sf1 (10×) leg: the FULL headline set (VERDICT r6 item 6 — the top-10
# spot-check could not separate env drift from growth), minus queries
# whose registered form embeds a deliberately quadratic CONTRACT branch
# (the production operator is banded; the all-pairs twin exists only to
# oracle it and is O(n²) by design — 1.25B pairs at sf1).
SF1_EXCLUDE = frozenset({"multimodal_phash_neardup"})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # local mode: the driver IS the executor — give it real memory so
    # broadcast builds (HashedRelation amplification) never thrash
    spark = get_spark(
        app_name="csdp-bench",
        extra_conf={"spark.driver.memory": "16g"},
    )
    # warm the JVM/codegen/parquet-reader/noop-writer paths so per-query
    # numbers measure the plans, not first-use initialization
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    # JMH-style per-plan warmup at the smallest SF: whole-stage codegen
    # compiles each query's generated classes once (~0.5-1s of javac/JIT
    # per distinct plan) so the timed sf run measures steady-state plan
    # execution, not first-compile latency. Cost is paid on tiny data.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in BENCH_QUERIES:
            REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    def timed_best(fn, d: str, force_samples: int = 0) -> float:
        # best-of-2: a single sample is hostage to one GC pause or a
        # noisy-neighbor blip; the min of two runs is the plan's cost.
        # If the two samples disagree by >30% the environment was noisy
        # during at least one of them, so spend ONE extra sample —
        # dedup_prefix_filter measured 2.3s isolated (fresh JVM AND
        # after a full 57-query prelude: no structural heap debt) yet
        # recorded 4.6-5.5s in whole-bench runs, i.e. sustained
        # external contention can poison both of two samples; a third
        # draw makes the recorded number far more likely to be the
        # plan's cost.
        samples = []
        while True:
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            # operators that cache shared subtrees (prefix join,
            # minhash) must not let those blocks age into later
            # measurements' heap — each run is self-contained, and the
            # GC nudge drains freed blocks NOW so a heavy query's
            # garbage is not collected inside the next query's timing.
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            if force_samples:
                if len(samples) >= force_samples:
                    return min(samples)
                continue
            if len(samples) >= 3 or (
                len(samples) == 2
                and abs(samples[0] - samples[1]) <= 0.3 * min(samples)
            ):
                return min(samples)

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        times[name] = round(timed_best(REGISTRY[name].fn, sf_dir), 3)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }

    # sf1 (10×) leg: one measured point beyond sf0.1 to back the
    # 100×-design claims, now over the FULL headline set. The sf1
    # parquet is built once (duplicate-structure-preserving 10×
    # amplification of sf0.1 — see tools_gen_sf1.py) under /tmp;
    # variance-adaptive best-of-2/3 per query (single-shot sf1 samples
    # vary up to 3× on GC/page-cache luck, which would read as a fake
    # super-linear stage in the ratio column). A query whose
    # sf1/sf0.1 ratio materially exceeds the 10× data ratio has a
    # super-linear stage. Disable with SPARK_GRAFT_SF1=0.
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        from tools_gen_sf1 import ensure_sf1

        sf1_dir = ensure_sf1(spark, src_dir=sf_dir)
        sf1_names = [n for n in BENCH_QUERIES if n not in SF1_EXCLUDE]
        sf1_times: dict[str, float] = {}
        for name in sf1_names:
            sf1_times[name] = round(
                timed_best(REGISTRY[name].fn, sf1_dir), 3
            )
        out["sf1_full"] = {
            "sf": 1.0,
            "total": round(sum(sf1_times.values()), 3),
            "n_queries": len(sf1_names),
            "excluded": sorted(SF1_EXCLUDE),
            "queries": sf1_times,
            "ratio_vs_sf0.1": {
                name: round(sf1_times[name] / max(times[name], 0.001), 1)
                for name in sf1_names
            },
        }

    # regression gate: compare each query to the PREVIOUS committed
    # local record (read before overwriting) so every bench run —
    # including the driver's — self-reports drift. >1.5× on a ≥0.05s
    # query is "regressed"; sub-50ms timings are pure noise. Worst 5
    # by ratio keep the compact line inside its budget; the full map
    # is in BENCH_LOCAL.json.
    here = os.path.dirname(os.path.abspath(__file__))
    prev_times: dict[str, float] = {}
    prev_sf1: dict[str, float] = {}
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
            prev_rec = json.load(f)
        prev_times = prev_rec.get("queries", {})
        prev_sf1 = prev_rec.get("sf1_full", {}).get("queries", {})
    except (OSError, ValueError):
        pass

    def _gate(now: dict[str, float], prev: dict[str, float]):
        return {
            name: {"prev": prev[name], "now": t}
            for name, t in now.items()
            if prev.get(name, 0) >= 0.05 and t > 1.5 * prev[name]
        }

    # auto re-time before recording a regression (VERDICT r8 item 2):
    # every regression flagged in rounds 7-8 turned out to be same-box
    # contention (GC/page-cache debt from the surrounding batch), each
    # manually cleared by an isolated quiet-box best-of-3 — so that
    # protocol now runs INSIDE the bench. After the batch finishes the
    # JVM is idle; a flagged query is re-timed best-of-3 with a full GC
    # + settle pause before each sample. The isolated number replaces
    # the batch number whenever it is SMALLER — min over more samples
    # is strictly closer to the plan's cost — which drops the flag
    # when it also clears the 1.5× gate; the raw batch time is
    # preserved in "retimed" so drift stays auditable either way
    # (ADVICE r9: comment aligned with the unconditional-min code).
    def _retime(flagged, d, times_map, prev):
        notes = {}
        for name in sorted(flagged):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)
            iso = round(timed_best(REGISTRY[name].fn, d, force_samples=3), 3)
            notes[name] = {
                "batch": times_map[name],
                "isolated": iso,
                "prev": prev[name],
            }
            if iso < times_map[name]:
                times_map[name] = iso
        return notes

    regressed = _gate(times, prev_times)
    out["retimed"] = _retime(regressed, sf_dir, times, prev_times)
    regressed = _gate(times, prev_times)
    out["regressions"] = regressed
    out["value"] = round(sum(times.values()), 3)
    # VERDICT r7 item 6: the gate also covers the sf1 leg — a stage
    # that only turns super-linear at 10× data regressed nowhere else
    if "sf1_full" in out:
        sf1_times = out["sf1_full"]["queries"]
        sf1_flagged = _gate(sf1_times, prev_sf1)
        out["sf1_full"]["retimed"] = _retime(
            sf1_flagged, sf1_dir, sf1_times, prev_sf1
        )
        out["sf1_full"]["regressions"] = _gate(sf1_times, prev_sf1)
        out["sf1_full"]["total"] = round(sum(sf1_times.values()), 3)
        out["sf1_full"]["ratio_vs_sf0.1"] = {
            name: round(sf1_times[name] / max(times[name], 0.001), 1)
            for name in sf1_times
        }

    # full breakdown to a file (unbounded size there)
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        json.dump(out, f, indent=1)

    # final stdout line: compact summary that survives a 2000-char tail
    # capture. Greedily include the slowest queries until the line would
    # exceed the budget; the rest live in BENCH_LOCAL.json.
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(times),
        "detail": "BENCH_LOCAL.json",
        "queries": {},
    }
    if "sf1_full" in out:
        compact["sf1_total"] = out["sf1_full"]["total"]
        compact["sf1_n"] = out["sf1_full"]["n_queries"]
        compact["sf1_regressions"] = dict(
            sorted(
                out["sf1_full"]["regressions"].items(),
                key=lambda kv: -(kv[1]["now"] / kv[1]["prev"]),
            )[:3]
        )
    compact["regressions"] = dict(
        sorted(
            regressed.items(),
            key=lambda kv: -(kv[1]["now"] / kv[1]["prev"]),
        )[:5]
    )
    if out["retimed"]:
        compact["retimed_n"] = len(out["retimed"])
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        trial = dict(compact)
        trial["queries"] = {**compact["queries"], name: t}
        if len(json.dumps(trial, separators=(",", ":"))) > 1400:
            break
        compact = trial
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
