"""Regenerate PLANS.md — formatted physical plans of the representative
queries with the scale commentary each plan shape is meant to prove.

Usage: python tools_gen_plans.py   (writes PLANS.md in the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.workload import REGISTRY

COMMENT = {
    "q5_region_nation_revenue": (
        "Star join: every dimension (region, nation, customer filtered by the\n"
        "dims above it, supplier) broadcasts; the only shuffle join is\n"
        "fact-to-fact lineitem-orders. One exchange per aggregation level."
    ),
    "q3_top_revenue_orders": (
        "Fact-fact shuffle join (orders-lineitem) with the segment-filtered\n"
        "customer left to AQE; the global top-10 is TakeOrderedAndProject --\n"
        "no full sort, no single-task Window."
    ),
    "dedup_minhash": (
        "Shingle explode -> minhash aggregate -> banded equi-join on 64-bit\n"
        "band keys. No all-pairs stage: candidate volume is O(N x bands)."
    ),
    "j6_asof_join": (
        "As-of via union-then-window: both sides tagged and unioned, one\n"
        "shuffle on (key), one in-partition sort, last(ignoreNulls) carries\n"
        "the right payload forward. Equivalent cost to one sort-merge join."
    ),
    "embedding_kmeans_sizes": (
        "Centroid literals baked into a closed-form argmin expression: the\n"
        "assignment is a NARROW map (zero exchanges before the final 8-group\n"
        "census with map-side partials)."
    ),
    "j11_attribution_join": (
        "Stream-ready attribution: one left-outer equi-join on user_id with\n"
        "the time-range predicate applied in-stage, then one purchase-keyed\n"
        "count. The same operator runs under Structured Streaming with\n"
        "watermarked state."
    ),
    "pagerank_parts_2iter": (
        "Iterative link analysis: the checkpointed edge list (lineage cut --\n"
        "no FileScan) is joined ONCE per iteration against the rank/degree\n"
        "node table via a pinned shuffle-HASH join (no edge-list sort, no\n"
        "optimizer broadcast of a data-proportional side), then a dst-keyed\n"
        "sum with map-side partials."
    ),
    "triangle_count_strong_ties": (
        "Degree-ordered triangle counting: orientation bounds wedge fanout\n"
        "to O(m^1.5); the wedge join and the closing-edge probe are node-\n"
        "keyed equi-joins over the checkpointed oriented edge list; five\n"
        "1-row aggregates broadcast into the final summary row."
    ),
    "token_heavy_hitters": (
        "Misra-Gries candidate pruning: the mapInPandas summary stage is\n"
        "NARROW (k counters per partition); the only shuffle carries the\n"
        "O(k x partitions) candidate tokens (broadcast semi-join + grouped\n"
        "count), never the full vocabulary. The 1-row total broadcasts into\n"
        "the threshold filter."
    ),
    "semantic_dedup_clustered": (
        "SemDeDup cluster pruning: centroid argmin is a zero-shuffle narrow\n"
        "map (literals baked into the plan); the pair search is ONE\n"
        "cluster-keyed equi self-join - cost sum(n_c^2), tuned by k, with no\n"
        "global cross join anywhere."
    ),
    "session_transitions": (
        "One user-keyed shuffle for the lag window; the transition count's\n"
        "output is bounded by |event_type|^2, so the normalizing window\n"
        "runs over a trivially small frame."
    ),
    "bloom_filtered_revenue": (
        "Explicit Bloom runtime filter: the getbit probe over the baked\n"
        "word-array literal sits in the Filter DIRECTLY above the fact\n"
        "FileScan -- ~96% of rows die before any exchange; the LeftSemi\n"
        "join then removes the Bloom's false positives, so the result\n"
        "equals the plain semi join."
    ),
    "dedup_prefix_filter": (
        "SSJoin prefix filtering: rare-first prefix tokens bound the\n"
        "candidate equi-join fanout; length + positional filters prune\n"
        "inside the join; exact Jaccard verification restores precision.\n"
        "Equi-joins only -- no cartesian/nested-loop node anywhere. The\n"
        "shingle DF attaches via a count Window on the ONE token-keyed\n"
        "exchange, and the checkpointed shingling feeds the token path\n"
        "and both verification sides without rescanning."
    ),
    "er_sorted_neighborhood": (
        "Sorted-neighborhood blocking: the global sort order comes from\n"
        "the range-partitioned rank kernel (no single-task Window); the\n"
        "w-row slide is an EQUI-join -- each row explodes to its w\n"
        "successor positions and hash-joins on rn, so candidates are\n"
        "O(N x w) with no range-condition nested loop; Levenshtein runs\n"
        "only on survivors."
    ),
    "embedding_random_projection": (
        "JL projection as a zero-shuffle narrow map: the 64x16 sign\n"
        "matrix is plan literals, each output dim a zip_with+fold inside\n"
        "whole-stage codegen; the only exchange is the |label|-group\n"
        "rollup of the distortion ratios."
    ),
    "substring_dup_spans": (
        "Substring-level exact dedup (round 6): positional 6-gram hashes\n"
        "explode once, the cross-doc duplicate set is a hash-keyed\n"
        "aggregate (min!=max doc — two longs of map-combinable state), hits\n"
        "equi-join back on the 64-bit key, and the maximal-run merge is a\n"
        "doc-partitioned gaps-and-islands window. No suffix structures, no\n"
        "all-pairs stage at any corpus size. The round-robin leaf exchange\n"
        "is the parallelism_floor (round-7: the single-row-group test file\n"
        "serialized the gram explode on one task — 7.4s -> 1.2s at sf0.1;\n"
        "no-op on multi-file corpora)."
    ),
    "line_dedup_keep_first": (
        "Unit-level keep-first dedup (round 7): unit explode -> ONE\n"
        "unit-hash groupBy whose state is a single (doc, idx) struct-min\n"
        "(map-side combinable; duplicate-heavy units collapse before the\n"
        "shuffle) -> equi-join back -> per-document bounded rebuild. No\n"
        "windows, no all-pairs. The tokenized and exploded frames are\n"
        "cached (InMemoryRelation leaves): each feeds two plan branches,\n"
        "so the tokenizer/slicer pipeline runs once per call."
    ),
    "lm_perplexity_buckets": (
        "Bigram-LM perplexity tertiles (round 7): the count tables are\n"
        "vocabulary-sized and AQE-broadcast against the bigram stream; the\n"
        "per-doc score is an exact int64 nano-nat sum, and the tertile is\n"
        "the range-partitioned global_ntile kernel — range exchange +\n"
        "per-partition rank + offset map, NO single-task Window."
    ),
    "quality_logit_score": (
        "Linear quality-classifier inference (round 6): the literal\n"
        "micro-weight lexicon is a LocalRelation under a BroadcastExchange\n"
        "(provably bounded in-plan), joined against the exploded token\n"
        "stream; the logit is one doc-keyed exact-integer sum. Model\n"
        "inference without a UDF — the corpus never shuffles on the join."
    ),
    "text_fingerprints": (
        "Winnowing fingerprints: scan -> narrow hash/window-min map ->\n"
        "explode, with NO keyed exchange ((doc_id, fp) pairs are unique\n"
        "by construction, so a global distinct would be a vacuous\n"
        "all-fingerprint shuffle). The one round-robin exchange is the\n"
        "leaf parallelism_floor: this test layout is a single parquet\n"
        "row group, which caps the leaf at ONE task no matter\n"
        "maxPartitionBytes; the floor rebalances raw rows before the\n"
        "md5-per-char compute (6x at sf0.1) and provably no-ops on\n"
        "multi-file production corpora (guard: scan partitions >= cores)."
    ),
    "j14_qgram_longtext_join": (
        "Ed-Join q-gram prefix filter (round 8): candidate generation is\n"
        "an equi-join on rare-first prefix gram hashes with the length\n"
        "filter applied in-join; the verify is the BANDED\n"
        "levenshtein(_, _, d) on candidates only. No cartesian/nested-\n"
        "loop anywhere; the gram table is cached once and feeds the\n"
        "prefix side and both verify sides."
    ),
    "bpe_encode_tokens": (
        "BPE corpus encode (round 8): the 32 learned merges fold into ONE\n"
        "nested literal-replace expression over the word-frequency table —\n"
        "a single whole-stage-codegen map between the vocab aggregation\n"
        "and the token-frequency aggregation. No UDF, no per-merge pass,\n"
        "no extra corpus scan at encode time (training paid its one\n"
        "corpus pass before this plan was built)."
    ),
    "j15_editdist_mixed_lengths": (
        "Mixed-length edit-distance self-join (round 9): the pool splits\n"
        "at q*(d+1) chars — long strings through the Ed-Join prefix-gram\n"
        "equi-join, short strings (plus the d-wide boundary band) through\n"
        "hashed deletion-variant equi-joins, exact-duplicate ids through a\n"
        "text-keyed equi self-join. Every candidate stage is equi-keyed;\n"
        "the closing pair-key dedup absorbs the band's double coverage."
    ),
}


def main() -> None:
    spark = get_spark(
        shuffle_partitions=8, extra_conf={"spark.ui.enabled": "false"}
    )
    out = [
        "# PLANS — headline physical plans (sf0.01, local, AQE on)",
        "",
        "Auto-generated by `python tools_gen_plans.py` — `.explain`-style",
        "formatted plans for eighteen representative queries, with the scale",
        "commentary the plan shape is meant to prove. Regenerate after any",
        "plan-affecting change.",
        "",
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, comment in COMMENT.items():
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().explainString(mode)
        tree = plan.split("\n\n")[0]  # keep the tree, drop node details
        out += [f"## {name}", "", comment, "", "```", tree, "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
