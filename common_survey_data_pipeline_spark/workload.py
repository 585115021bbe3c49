"""The engine's driver-facing workload: every operator from SURVEY.md §2
plus the large-scale extension operators, each as a named query over the
driver's synthetic tables with (where expressible) a DuckDB oracle SQL
string kept RIGHT NEXT to the Spark plan so the two stay in sync.

Contract (``/root/repo/__spark_entry__.py``): every query callable takes
``(spark, sf_dir)`` and returns a DataFrame; oracle SQL runs on DuckDB
views named after the parquet tables. Column names AND dtypes are
aligned between both sides (counts → BIGINT, ratios → DOUBLE, ranks →
INT) because the driver hash-compares values after sorting columns by
name.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions import text as T
from common_survey_data_pipeline_spark.operators.coalesce_join import coalesce_left_join
from common_survey_data_pipeline_spark.operators.cdc import merge_upsert, snapshot_diff
from common_survey_data_pipeline_spark.operators.curation import curate_corpus
from common_survey_data_pipeline_spark.operators.clustering import (
    assign_clusters,
)
from common_survey_data_pipeline_spark.operators.decontam import (
    boilerplate_spans,
    crossdoc_duplication,
    ngram_decontaminate,
    repetition_metrics,
)
from common_survey_data_pipeline_spark.operators.dedup import (
    append_band_table,
    compact_band_table,
    hamming_band_pairs,
    incremental_pairs_vs_band_table,
    minhash_incremental_pairs,
    substring_dup_spans,
    write_band_table,
    exact_dedup_groups,
    minhash_dedup_pairs,
    neardup_clusters,
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
    simhash_dedup_pairs,
)
from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    jaro_winkler,
    strdist_neardup_pairs,
    stringdist_left_join,
)
from common_survey_data_pipeline_spark.operators.graph import (
    basket_pairs,
    triangle_stats,
)
from common_survey_data_pipeline_spark.operators.joins import (
    anti_join,
    bloom_semi_join,
    semi_join,
)
from common_survey_data_pipeline_spark.operators.layout import zorder_bucket_stats
from common_survey_data_pipeline_spark.operators.temporal_joins import (
    asof_join,
    interval_join,
    salted_join,
)
from common_survey_data_pipeline_spark.operators.ranking import (
    global_cumsum,
    global_ntile,
    global_row_number,
)
from common_survey_data_pipeline_spark.operators.multimodal import (
    attach_audio_payload,
    attach_binary_payload,
    decode_audio,
    decode_images,
    phash_images,
    resize_images,
    sample_frames,
    synthetic_luma_payloads,
)
from common_survey_data_pipeline_spark.operators.sketches import (
    heavy_hitter_tokens,
)
from common_survey_data_pipeline_spark.operators.skyline import skyline_2d
from common_survey_data_pipeline_spark.operators.linalg import (
    embedding_covariance,
)
from common_survey_data_pipeline_spark.operators.similarity import (
    cosine,
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    pq_topk,
    recall_vs_exact,
    signlsh_topk,
)
from common_survey_data_pipeline_spark.sources.tables import (
    load_table,
    parallelism_floor,
    scaled_partitions,
)
from common_survey_data_pipeline_spark.streaming.events import (
    attribution_join,
    dedup_events,
    session_stats,
    tumbling_counts,
    windowed_unique_users,
)
from common_survey_data_pipeline_spark.streaming.stateful import (
    threshold_alerts as threshold_alerts_batch,
)


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.1/2.2 — scans, projections, filters, predicates
# ---------------------------------------------------------------------------

# Money arithmetic runs on DECIMAL on BOTH sides: the source doubles hold
# 2-decimal business values, so a decimal(12,2)/(4,2) cast is exact and the
# subsequent products/sums/rounds are bit-identical across engines —
# round(double,2) is NOT (Spark rounds the shortest decimal repr, DuckDB the
# binary value; they disagree on .xx5 ties).
_DISC_PRICE_DEC = (
    "l_extendedprice::DECIMAL(12,2) * ((1 - l_discount)::DECIMAL(4,2))"
)


def _disc_price_dec():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
    )


def _roundz(col, d: int):
    """Round to ``d`` decimals and canonicalize IEEE signed zero.

    A SIGNED metric whose value lands in (−0.5·10⁻ᵈ, 0) rounds to −0.0
    in DuckDB (IEEE round keeps the sign bit) but to +0.0 in Spark
    (``F.round`` goes through BigDecimal, which has no signed zero).
    The two print differently ('-0.0' vs '0.0'), so a representation-
    hashing comparator — the driver's value hash — flags a divergence
    even though the doubles compare numerically equal. That was round
    4's one red driver row (`user_value_trend`: user 27's raw slope
    −2.86e-08).

    ``x + 0.0`` is the standard IEEE canonicalization: −0.0 + 0.0 =
    +0.0 under round-to-nearest, and an exact identity for every other
    value (NULL and NaN included). Use this for EVERY rounded metric
    whose range includes negatives — slopes, intercepts, correlations,
    covariances, skewness, cosines, signed means, log-ratios — and
    mirror it as ``round(..., d) + 0`` in the paired oracle SQL so
    both engines emit +0.0. Non-negative metrics (prices, counts,
    ratios, stddevs, ranks) cannot produce −0.0 and stay on plain
    ``F.round``.
    """
    return F.round(col, d) + F.lit(0.0)


@register(
    "s1_scan_filter_project",
    f"""
    SELECT l_orderkey, l_linenumber,
           round({_DISC_PRICE_DEC}, 2)::DOUBLE AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def q_s1(spark, sf_dir):
    """Filter+project with parquet pushdown (SURVEY §2.1 S1, §2.2)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "l_orderkey",
        "l_linenumber",
        F.round(_disc_price_dec(), 2).cast("double").alias("net_price"),
    )


@register(
    "s3_metadata_transpose",
    """
    SELECT 'p_partkey' AS variable, p_partkey::VARCHAR AS first_value
      FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 1)
    UNION ALL SELECT 'p_name', p_name FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 1)
    UNION ALL SELECT 'p_brand', p_brand FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 1)
    UNION ALL SELECT 'p_type', p_type FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 1)
    UNION ALL SELECT 'p_size', p_size::VARCHAR FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 1)
    UNION ALL SELECT 'p_retailprice', round(p_retailprice, 2)::VARCHAR
      FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 1)
    """,
)
def q_s3(spark, sf_dir):
    """Wide→long metadata transpose (SURVEY §2.1 S3; varinfo-update.R:
    53-64): column names → rows, first row's values → a value column —
    the Qualtrics header-extraction trick over an arbitrary table."""
    p = _t(spark, sf_dir, "part")
    first = p.orderBy("p_partkey").limit(1)
    # round doubles before stringifying so both engines print '123.45'
    cols = [
        F.round(F.col(c), 2).cast("string") if t == "double" else F.col(c).cast("string")
        for c, t in first.dtypes
    ]
    row = first.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("variable"), v.alias("first_value"))
                    for (c, _), v in zip(first.dtypes, cols)
                ]
            )
        ).alias("e")
    )
    return row.select("e.variable", "e.first_value")


@register(
    "f2_digit_recency_key",
    """
    SELECT admin_label,
           CAST(list_aggregate(regexp_extract_all(admin_label, '\\d+'), 'string_agg', '')
                AS BIGINT) AS recency_key,
           count(*) AS n
    FROM (SELECT 'SurveyAdminTerm' || year(o_orderdate) || '-' ||
                 quarter(o_orderdate) AS admin_label
          FROM orders)
    GROUP BY admin_label
    """,
)
def q_f2(spark, sf_dir):
    """Digit-concat recency key as a COLUMN op (SURVEY §2.8 F2;
    varinfo-update.R:166-168): 'SurveyAdminTerm1997-2' → 19972. The
    driver-side analog (on column NAMES) lives in operators/recency.py."""
    o = _t(spark, sf_dir, "orders")
    label = F.concat(
        F.lit("SurveyAdminTerm"), F.year("o_orderdate"), F.lit("-"),
        F.quarter("o_orderdate"),
    )
    return (
        o.select(label.alias("admin_label"))
        .groupBy("admin_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "admin_label",
            F.concat_ws("", F.regexp_extract_all("admin_label", F.lit(r"(\d+)"), 1))
            .cast("long")
            .alias("recency_key"),
            "n",
        )
    )


@register(
    "p5_filter_r_na_semantics",
    """
    SELECT et, count(*) AS n
    FROM (SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et
          FROM events)
    WHERE NOT et IN ('click', 'view') OR et IS NULL
    GROUP BY et
    """,
)
def q_p5(spark, sf_dir):
    """R's `!x %in% set` keeps NA rows — the hand-translated NOT-IN +
    isNull escape (SURVEY §2.2 P5; varinfo-update.R:229)."""
    ev = _t(spark, sf_dir, "events")
    et = F.when(F.col("event_type") == "error", None).otherwise(F.col("event_type"))
    out = ev.select(et.alias("et")).where(
        (~F.col("et").isin("click", "view")) | F.col("et").isNull()
    )
    return out.groupBy("et").agg(F.count(F.lit(1)).alias("n"))


@register(
    "p6_conditional_map_rank",
    """
    SELECT l_returnflag,
           CASE WHEN l_returnflag = 'A' THEN 1
                WHEN l_returnflag = 'N' THEN 2
                WHEN l_returnflag = 'R' THEN 3
                ELSE -1 END AS flag_rank,
           count(*) AS n
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_p6(spark, sf_dir):
    """Conditional expression + literal-map lookup (SURVEY §2.2 P6, §2.8
    F9; varinfo-update.R:213-216)."""
    li = _t(spark, sf_dir, "lineitem")
    rank_map = F.create_map(
        F.lit("A"), F.lit(1), F.lit("N"), F.lit(2), F.lit("R"), F.lit(3)
    )
    flag_rank = (
        F.when(F.col("l_returnflag").isin("A", "N", "R"), rank_map[F.col("l_returnflag")])
        .otherwise(F.lit(-1))
        .cast("int")
    )
    return (
        li.select("l_returnflag", flag_rank.alias("flag_rank"))
        .groupBy("l_returnflag", "flag_rank")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------

@register(
    "j1_fuzzy_brand_join",
    """
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           levenshtein(a.p_brand, b.p_brand)::INTEGER AS string_distance
    FROM (SELECT DISTINCT p_brand FROM part) a
    JOIN (SELECT DISTINCT p_brand FROM part) b
      ON a.p_brand < b.p_brand AND levenshtein(a.p_brand, b.p_brand) <= 2
    """,
)
def q_j1(spark, sf_dir):
    """Levenshtein similarity join via the blocked strategy (SURVEY §2.3
    J1; varinfo-update.R:99-105)."""
    part = _t(spark, sf_dir, "part")
    a = part.select(F.col("p_brand").alias("brand_a")).distinct()
    b = part.select(F.col("p_brand").alias("brand_b")).distinct()
    out = stringdist_left_join(a, b, "brand_a", "brand_b", max_dist=2, strategy="blocked")
    return out.where(
        F.col("brand_b").isNotNull() & (F.col("brand_a") < F.col("brand_b"))
    ).select("brand_a", "brand_b", "string_distance")


@register(
    "j10_fuzzy_bigjoin",
    """
    SELECT a.key_a, b.key_b,
           levenshtein(a.key_a, b.key_b)::INTEGER AS string_distance
    FROM (SELECT DISTINCT o_orderkey::VARCHAR AS key_a FROM orders) a
    JOIN (SELECT DISTINCT o_orderkey::VARCHAR AS key_b FROM orders) b
      ON a.key_a < b.key_b
     AND abs(length(a.key_a) - length(b.key_b)) <= 1
     AND levenshtein(a.key_a, b.key_b) <= 1
    """,
)
def q_j10(spark, sf_dir):
    """Big×big fuzzy self-join on ID-like keys (dirty-record linkage
    shape) via deletion-neighborhood blocking
    (operators/fuzzy_join.py::strdist_neardup_pairs). The pool — every
    order key as a digit string, ~150k distinct at sf0.1 — is exactly
    where length banding degenerates (a handful of length bands →
    near-quadratic candidates) while deletion variants stay
    near-unique, keeping the equi-join's candidate volume proportional
    to TRUE matches; the symmetric pair form orders (a < b) BEFORE
    verify+dedup, so only true ordered pairs shuffle. This is the
    headline big×big entry in bench.py; at 100 TB every stage is an
    explode / equi-join / dedup partitioned on near-unique keys —
    nothing quadratic."""
    orders = _t(spark, sf_dir, "orders")
    pool = orders.select(F.col("o_orderkey").cast("string").alias("key"))
    return strdist_neardup_pairs(
        pool, "key", max_dist=1, out_a="key_a", out_b="key_b"
    ).select("key_a", "key_b", "string_distance")


@register(
    "j2_best_item_per_order",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS best_price
    FROM lineitem
    QUALIFY row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_extendedprice DESC, l_linenumber) = 1
    """,
)
def q_j2(spark, sf_dir):
    """Top-1-per-group window reduction (SURVEY §2.3 J2 / §2.5 W2)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("best_price"),
        )
    )


@register(
    "j3_coalesce_left_join",
    """
    SELECT x.c_custkey,
           COALESCE(x.segment, y.segment) AS segment,
           x.c_name
    FROM (SELECT c_custkey, CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
                                 ELSE c_mktsegment END AS segment, c_name
          FROM customer) x
    LEFT JOIN (SELECT c_custkey, 'RECOVERED' AS segment
               FROM customer WHERE c_custkey % 3 = 0) y
      ON x.c_custkey = y.c_custkey
    """,
)
def q_j3(spark, sf_dir):
    """Coalescing left join — x wins when non-null (SURVEY §2.3 J3;
    varinfo-update.R:67-90). The delta side here is a customer-
    proportional slice (every 3rd key), so it is NOT hint-broadcast —
    ``broadcast_right=True`` is reserved for genuinely small deltas
    (the reference's per-administration codebook updates); AQE promotes
    this one at runtime where it fits."""
    cust = _t(spark, sf_dir, "customer")
    x = cust.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", None)
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        "c_name",
    )
    y = cust.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", F.lit("RECOVERED").alias("segment")
    )
    return coalesce_left_join(x, y, "c_custkey")


@register(
    "j4_anti_join",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate < TIMESTAMP '1996-01-01')
    """,
)
def q_j4(spark, sf_dir):
    """Anti join: customers with no order before 1996 (SURVEY §2.3 J4;
    varinfo-update.R:142-145)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    return anti_join(cust, orders, "c_custkey", "o_custkey").select(
        "c_custkey", "c_name"
    )


@register(
    "j5_semi_join",
    """
    SELECT s.s_suppkey, s.s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
                  AND l.l_discount > 0.09)
    """,
)
def q_j5(spark, sf_dir):
    """Semi join (engine extension of §2.3's join taxonomy)."""
    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.09)
    return semi_join(sup, li, "s_suppkey", "l_suppkey").select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# §2.4 — aggregation
# ---------------------------------------------------------------------------

@register(
    "a1_conditional_counts",
    """
    SELECT count(*) FILTER (WHERE l_discount = 0) AS n_zero_disc,
           count(*) FILTER (WHERE l_returnflag = 'R' AND l_tax > 0.05) AS n_taxed_returns,
           count(*) AS n_total
    FROM lineitem
    """,
)
def q_a1(spark, sf_dir):
    """Conditional count aggregates (SURVEY §2.4 A1;
    varinfo-update.R:110-118)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.when(F.col("l_discount") == 0, 1)).alias("n_zero_disc"),
        F.count(
            F.when((F.col("l_returnflag") == "R") & (F.col("l_tax") > 0.05), 1)
        ).alias("n_taxed_returns"),
        F.count(F.lit(1)).alias("n_total"),
    )


@register(
    "a2_distinct_summary",
    """
    SELECT l_returnflag,
           count(DISTINCT l_linestatus) AS n_status,
           min(l_linestatus) AS min_status,
           max(l_linestatus) AS max_status
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_a2(spark, sf_dir):
    """Per-group distinct-value summary (SURVEY §2.4 A2;
    varinfo-update.R:172-185)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_linestatus").alias("n_status"),
        F.min("l_linestatus").alias("min_status"),
        F.max("l_linestatus").alias("max_status"),
    )


# ---------------------------------------------------------------------------
# §2.5/2.6 — windows, sorts, top-k
# ---------------------------------------------------------------------------

@register(
    "w1_latest_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, rk FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey)::INTEGER AS rk
      FROM orders)
    WHERE rk <= 2
    """,
)
def q_w1(spark, sf_dir):
    """Recency ranking per key — the survey 'most recent administration'
    pattern on the orders table (SURVEY §2.5 W1/W2)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rk")
    )


@register(
    "o1_sort_nulls_last",
    """
    SELECT rn, event_id, et FROM (
      SELECT row_number() OVER (ORDER BY et ASC NULLS LAST, event_id)::INTEGER AS rn,
             event_id,
             et
      FROM (SELECT event_id,
                   CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et
            FROM events))
    WHERE rn <= 100
    """,
)
def q_o1(spark, sf_dir):
    """NULLS-LAST ordering materialized as a rank (SURVEY §2.6 O1 — R
    arrange puts NA last; Spark's default is nulls-first).

    Scale note: top-k is computed with ``orderBy().limit(k)``, which
    compiles to TakeOrderedAndProject — a distributed partial top-k on
    every partition followed by a k-row merge on the driver. The rank
    is attached AFTER the limit, so the only Window in the plan runs
    over k rows, never over the full fact table (a partition-less
    Window funnels every row through one task)."""
    ev = _t(spark, sf_dir, "events")
    et = F.when(F.col("event_type") == "error", None).otherwise(F.col("event_type"))
    order = [F.col("et").asc_nulls_last(), F.col("event_id").asc()]
    top = ev.select("event_id", et.alias("et")).orderBy(*order).limit(100)
    w = Window.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w)).select("rn", "event_id", "et")


@register(
    "topk_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total, rk FROM (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)::INTEGER AS rk
      FROM orders)
    WHERE rk <= 10
    """,
)
def q_topk(spark, sf_dir):
    """Global top-k with deterministic tiebreak (SURVEY §2.6 O2).

    ``orderBy().limit(k)`` → TakeOrderedAndProject (each partition
    keeps its own top k, driver merges k·P candidate rows) instead of
    a partition-less row_number Window that would sort the whole fact
    table through a single task. Rank attached post-limit (k rows)."""
    orders = _t(spark, sf_dir, "orders")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    top = orders.select("o_orderkey", "o_totalprice").orderBy(*order).limit(10)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"), "rk")
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations
# ---------------------------------------------------------------------------

@register(
    "u1_union_by_name",
    """
    SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS bal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, round(c_acctbal, 2) AS bal
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def q_u1(spark, sf_dir):
    """Union with schema widening (SURVEY §2.7 U1; bind_rows parity)."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    b = cust.where(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "u2_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def q_u2(spark, sf_dir):
    """INTERSECT (engine extension of §2.7)."""
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    a = cust.where(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = sup.where(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return a.intersect(b)


@register(
    "u3_except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def q_u3(spark, sf_dir):
    """EXCEPT (engine extension of §2.7)."""
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    a = cust.where(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = sup.where(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return a.subtract(b)  # EXCEPT DISTINCT (set semantics, like SQL EXCEPT)


# ---------------------------------------------------------------------------
# TPC-H-style analytics (flagship / bench queries)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             l_quantity::BIGINT AS q,
             round(l_extendedprice * 100)::BIGINT AS cents,
             round((1 - l_discount) * 100)::BIGINT AS pct,
             round((1 + l_tax) * 100)::BIGINT AS taxpct,
             l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01')
    SELECT l_returnflag, l_linestatus,
           sum(q)::DOUBLE                                       AS sum_qty,
           sum(cents)::DOUBLE / 100.0                           AS sum_base_price,
           (((sum(cents * pct) + 50) // 100)::DOUBLE) / 100.0   AS sum_disc_price,
           (((sum(cents * pct * taxpct) + 5000) // 10000)::DOUBLE) / 100.0 AS sum_charge,
           round(avg(l_quantity), 4)                            AS avg_qty,
           round(avg(l_extendedprice), 4)                       AS avg_price,
           round(avg(l_discount), 6)                            AS avg_disc,
           count(*)                                             AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark, sf_dir):
    """TPC-H Q1-style pricing summary — map-side partial agg, one small
    shuffle, fully codegen'd.

    Money runs on the INTEGER-CENTS fast path instead of DECIMAL: the
    2-decimal business values become exact int64 cents (price×discount
    ×tax in 1e-6 units), so the hot aggregation loop is vectorized long
    arithmetic — sum(decimal>18 digits) falls off Spark's codegen fast
    path into per-row BigDecimal (~1.8× slower measured at sf0.1).
    Rounding back to 2 decimals is integer half-up ((x+50) div 100),
    identical by construction on both engines — no double-round ties.
    Headroom: ≤1e11 per row → int64 overflows past ~9e7 rows per
    group×1e11; at that scale split the sum into two columns or fall
    back to _DISC_PRICE_DEC decimals. The session pins
    spark.sql.ansi.enabled=true (session.py) so crossing that bound
    raises ARITHMETIC_OVERFLOW instead of silently wrapping —
    tests/test_overflow_canary.py proves it."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pct = F.round((F.lit(1.0) - F.col("l_discount")) * 100).cast("long")
    taxpct = F.round((F.lit(1.0) + F.col("l_tax")) * 100).cast("long")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"),
            (F.sum(cents).cast("double") / 100.0).alias("sum_base_price"),
            F.sum(cents * pct).alias("__s4"),
            F.sum(cents * pct * taxpct).alias("__s6"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "sum_disc_price",
            F.expr("cast((__s4 + 50) div 100 as double) / 100.0"),
        )
        .withColumn(
            "sum_charge",
            F.expr("cast((__s6 + 5000) div 10000 as double) / 100.0"),
        )
        .drop("__s4", "__s6")
    )


@register(
    "q3_top_revenue_orders",
    """
    SELECT l_orderkey,
           (((sum(round(l_extendedprice * 100)::BIGINT
                  * round((1 - l_discount) * 100)::BIGINT) + 50) // 100)::DOUBLE)
             / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    QUALIFY row_number() OVER (ORDER BY revenue DESC, l_orderkey) <= 10
    """,
)
def q_q3(spark, sf_dir):
    """TPC-H Q3-style: selective dim filter broadcast into the fact
    join, aggregate, top-k. Revenue runs on the integer-cents fast
    path (see q1): exact int64 arithmetic in the hot loop, integer
    half-up rounding back to 2 decimals — engine-identical and on the
    codegen fast path, unlike >18-digit decimal sums.

    Scale shape: NO broadcast hints on sf-scaled scans — the
    segment-filtered customer is still a constant FRACTION of a
    fact-proportional table (multi-GB at 100×), so customer ⋈ orders
    and lineitem ⋈ orders run as shuffle joins on their keys; AQE
    promotes either side to broadcast at runtime when stats allow.
    Top-k via orderBy().limit() → TakeOrderedAndProject, never a
    partition-less Window."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pct = F.round((F.lit(1.0) - F.col("l_discount")) * 100).cast("long")
    agg = (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents * pct).alias("__s4"))
        .withColumn(
            "revenue", F.expr("cast((__s4 + 50) div 100 as double) / 100.0")
        )
        .drop("__s4")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_region_nation_revenue",
    f"""
    SELECT n.n_name,
           round(sum(l.l_extendedprice::DECIMAL(12,2) * ((1 - l.l_discount)::DECIMAL(4,2))), 2)::DOUBLE AS revenue
    FROM region r JOIN nation n   ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o   ON o.o_custkey   = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey   = l.l_suppkey
                                 AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_q5(spark, sf_dir):
    """TPC-H Q5-style star join.

    Scale shape: only the constant-size dims (nation 25 rows, region
    5 rows) carry broadcast hints. customer and supplier are sf-scaled
    (SF×150k / SF×10k rows — multi-GB at 100×), so every join touching
    them runs as a shuffle join on its key; AQE promotes a side to
    broadcast at runtime when stats allow — that is its call, not a
    hard hint."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, F.col("o_custkey") == dims.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (sup.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_disc_price_dec()), 2).cast("double").alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Text analysis (extension surface)
# ---------------------------------------------------------------------------

_SQL_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"

@register(
    "text_stats",
    f"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           len({_SQL_TOKS})::BIGINT AS n_tokens,
           len(list_filter(regexp_split_to_array(
                 regexp_replace(regexp_replace(text, '(\\d+)', ' \\1 ', 'g'),
                                '([^\\w\\s]+)', ' \\1 ', 'g'),
                 '\\s+'), t -> t <> ''))::BIGINT AS n_bpe_tokens,
           round(list_aggregate(list_transform({_SQL_TOKS}, t -> length(t)), 'sum')::DOUBLE
                 / NULLIF(len({_SQL_TOKS}), 0), 4) AS mean_token_len
    FROM documents
    """,
)
def q_text_stats(spark, sf_dir):
    """Token/char counts + BPE-ish subword count + mean token length —
    all JVM built-ins (north-star text analysis)."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        T.char_count(c).cast("long").alias("n_chars"),
        T.token_count(c).cast("long").alias("n_tokens"),
        T.bpe_ish_token_count(c).cast("long").alias("n_bpe_tokens"),
        F.round(T.mean_token_length(c), 4).alias("mean_token_len"),
    )


_SQL_SW = {
    lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for lang, words in T.STOPWORDS.items()
}

_SQL_LOWER_TOKS = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"

_SQL_QUALITY_EXPR = f"""round(greatest(0.0,
                 0.5 * least(len({_SQL_TOKS})::DOUBLE / 64.0, 1.0)
               + 0.5 * least(COALESCE(
                     len(list_filter({_SQL_LOWER_TOKS},
                         t -> list_contains({_SQL_SW['en']}, t)))::DOUBLE
                     / NULLIF(len({_SQL_LOWER_TOKS}), 0), 0.0) * 4.0, 1.0)
               - 0.25 * least(COALESCE(
                     length(regexp_replace(text, '[\\w\\s]', '', 'g'))::DOUBLE
                     / NULLIF(length(text), 0), 0.0) * 2.0, 1.0)),
               6)"""


@register(
    "text_quality",
    f"""
    SELECT doc_id, {_SQL_QUALITY_EXPR} AS quality
    FROM documents
    """,
)
def q_text_quality(spark, sf_dir):
    """Deterministic quality heuristic (length/stopword/punctuation)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


def _sql_lang_score(lang: str) -> str:
    return (
        f"len(list_intersect(list_distinct({_SQL_LOWER_TOKS}), {_SQL_SW[lang]}))"
    )


@register(
    "text_lang_id",
    f"""
    SELECT doc_id,
           CASE WHEN best = 0 THEN 'unknown'
                WHEN s_de = best THEN 'de'
                WHEN s_en = best THEN 'en'
                WHEN s_es = best THEN 'es'
                WHEN s_fr = best THEN 'fr'
                ELSE 'unknown' END AS pred_lang
    FROM (SELECT doc_id,
                 {_sql_lang_score('de')} AS s_de,
                 {_sql_lang_score('en')} AS s_en,
                 {_sql_lang_score('es')} AS s_es,
                 {_sql_lang_score('fr')} AS s_fr,
                 greatest({_sql_lang_score('de')}, {_sql_lang_score('en')},
                          {_sql_lang_score('es')}, {_sql_lang_score('fr')}) AS best
          FROM documents)
    """,
)
def q_text_lang(spark, sf_dir):
    """Stopword-overlap language ID, alphabetical tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id(F.col("text")).alias("pred_lang"))


@register(
    "text_fingerprints",
    """
    SELECT DISTINCT doc_id, fp FROM (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM (SELECT doc_id, i, md5(substr(text, i::INTEGER, 8)) AS h
            FROM documents,
                 unnest(range(1, greatest(length(text) - 8 + 2, 1))) AS t(i)))
    """,
)
def q_text_fp(spark, sf_dir):
    """Winnowing document fingerprints: md5 over char 8-grams, min per
    4-gram sliding window, distinct (rolling-hash fingerprinting)."""
    # per-char md5 hashing dominates and runs BEFORE any exchange —
    # floor the leaf so a single-row-group input doesn't serialize it
    # (6.3x at sf0.1; no-op on multi-file corpora, see parallelism_floor)
    docs = parallelism_floor(_t(spark, sf_dir, "documents"))
    k, w = 8, 4
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(0))),
        lambda i: F.md5(F.substring(F.col("text"), i, k)),
    )
    # materialize the hash array as a column BEFORE the windowed min —
    # inlining it would re-evaluate the md5 transform per window position
    # (O(len²) md5 calls)
    hashed = docs.where(F.length("text") >= k).select(
        "doc_id", hashes.alias("__h")
    )
    # windowed min as least-of-element_at with end-clamping (same result
    # as array_min(slice(...)): the clamp repeats the last element, which
    # never changes a min) — avoids allocating a w-element array per
    # position, ~25% faster at sf0.1
    nmax = F.size("__h")
    fps = F.transform(
        F.sequence(F.lit(1), nmax),
        lambda j: F.least(
            *[F.element_at("__h", F.least(j + d, nmax)) for d in range(w)]
        ),
    )
    # NO global distinct: array_distinct already dedupes within a doc,
    # and doc_id is part of the output pair, so rows are globally
    # unique by construction — the explicit .distinct() this used to
    # carry only re-asserted that at the cost of shuffling EVERY
    # fingerprint (the query's sole exchange; at 100 TB, the dominant
    # cost). The oracle's SELECT DISTINCT is equally vacuous on its
    # side, so results are bit-identical.
    return hashed.select(
        "doc_id", F.explode(F.array_distinct(fps)).alias("fp")
    )


# ---------------------------------------------------------------------------
# Deduplication (extension surface)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS keeper_id
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "text", "doc_id")


_SQL_SHINGLES = """
CASE WHEN len(toks) < 3 THEN []
     ELSE list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         for i in range(1, len(toks) - 1)])
END
"""

def _sql_ngram_pairs(src: str = "documents") -> str:
    """Exact all-pairs word-3-gram Jaccard ≥ 0.5 over table/CTE ``src``
    — reused standalone and as the pair source of the clustering and
    curation oracles."""
    return f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM {src})
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / NULLIF(len(list_distinct(a.shingles || b.shingles)), 0), 6) AS jaccard_sim
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
      AND round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                / NULLIF(len(list_distinct(a.shingles || b.shingles)), 0), 6) >= 0.5
"""


_SQL_NGRAM_PAIRS = _sql_ngram_pairs()


@register("dedup_ngram_exact", _SQL_NGRAM_PAIRS)
def q_dedup_ngram(spark, sf_dir):
    """Exact all-pairs word-3-gram Jaccard ≥ 0.5 (oracle-grade)."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)


@register("dedup_prefix_filter", _SQL_NGRAM_PAIRS)
def q_dedup_prefix(spark, sf_dir):
    """Prefix-filtered EXACT set-similarity join (SSJoin/All-Pairs) —
    the deterministic scale path to the identical answer as
    `dedup_ngram_exact`: rare-first prefix tokens bound the candidate
    equi-join's fanout, exact verification restores precision, and no
    quadratic or probabilistic stage exists (contrast
    `dedup_minhash`, whose recall is probabilistic). See
    `operators/dedup.py::prefix_filter_jaccard_pairs`."""
    docs = _t(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)


@register("dedup_minhash", _SQL_NGRAM_PAIRS)
def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Oracled against the exact all-pairs SQL: with 32 bands × 4 rows the
    candidate-recall at j≥0.5 is ≥0.87 and at the dataset's actual
    near-dup band (j≥0.9) is 1-3e-15, and every candidate is verified
    exactly — so LSH output == exact output on data whose pair-Jaccard
    distribution has the usual bimodal gap (verified in tests)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)


@register(
    "dedup_minhash_certificate",
    f"""
    WITH pairs AS ({_sql_ngram_pairs()})
    SELECT id_a, id_b, jaccard_sim, TRUE AS within_tolerance FROM pairs
    """,
)
def q_dedup_minhash_certificate(spark, sf_dir):
    """MinHash sketch-error certificate
    (``operators/dedup.py::minhash_estimate_certificate``) — the dedup
    mirror of ``quantile_error_certificate``: per verified near-dup
    pair, the signature-implied Jaccard estimate must sit within 0.25
    of the exact Jaccard (4σ for 64 hashes — excursion odds ≈6e-5 per
    threshold-grade pair, so red means regression even on a corpus
    with pairs AT the threshold). The oracle re-derives
    the pair set and the exact values via the all-pairs SQL and PINS
    ``within_tolerance = TRUE`` — the Spark side computes the estimate
    for real, so a corrupted hash family / signature regression breaks
    the value hash instead of hiding until recall decays. The seeded
    family makes the certificate deterministic, not probabilistic."""
    from common_survey_data_pipeline_spark.operators.dedup import (
        minhash_estimate_certificate,
    )

    docs = _t(spark, sf_dir, "documents")
    return minhash_estimate_certificate(docs, "text", "doc_id", threshold=0.5)


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_SQL_NGRAM_PAIRS}),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    r AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Transitive near-duplicate clusters: connected components (min-
    label propagation) over the verified MinHash pair graph. Oracle:
    recursive-CTE transitive closure over the exact all-pairs graph."""
    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)
    return neardup_clusters(pairs)


@register(
    "dedup_clusters_star",
    f"""
    WITH RECURSIVE pairs AS ({_SQL_NGRAM_PAIRS}),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    r AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a
    """,
)
def q_dedup_clusters_star(spark, sf_dir):
    """Same clusters as `dedup_clusters` (shared oracle: recursive-CTE
    transitive closure), computed by the alternating large-star /
    small-star kernel (`operators/dedup.py::connected_components_star`,
    Kiveris et al. SoCC 2014) instead of min-label propagation — the
    O(log n)-round path for graphs whose DIAMETER makes per-hop
    propagation unaffordable (a 10k-node chain is 10k propagation
    shuffles but ~14 star rounds). Both kernels assign every node its
    minimum reachable id, so the driver hash-checks them against the
    identical SQL.
    """
    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)
    from common_survey_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    return connected_components_star(pairs)


# The curation-funnel CTEs (quality filter → language filter → exact
# dedup → MinHash near-dup cluster representatives), factored so the
# standalone `curate_corpus` oracle and the end-to-end
# `corpus_e2e_curation` chain share one copy of the algebra. Ends with
# `curated(doc_id, text, quality)` — the surviving corpus.
_SQL_CURATE_CTES = f"""
    WITH RECURSIVE scored AS (
      SELECT doc_id, text, {_SQL_QUALITY_EXPR} AS quality,
             CASE WHEN best = 0 THEN 'unknown'
                  WHEN s_de = best THEN 'de'
                  WHEN s_en = best THEN 'en'
                  WHEN s_es = best THEN 'es'
                  WHEN s_fr = best THEN 'fr'
                  ELSE 'unknown' END AS pred_lang
      FROM (SELECT doc_id, text,
                   {_sql_lang_score('de')} AS s_de,
                   {_sql_lang_score('en')} AS s_en,
                   {_sql_lang_score('es')} AS s_es,
                   {_sql_lang_score('fr')} AS s_fr,
                   greatest({_sql_lang_score('de')}, {_sql_lang_score('en')},
                            {_sql_lang_score('es')}, {_sql_lang_score('fr')}) AS best
            FROM documents)),
    kept AS (SELECT doc_id, text, quality FROM scored
             WHERE quality >= 0.3 AND pred_lang = 'en'),
    uniq AS (SELECT k.doc_id, k.text, k.quality FROM kept k
             JOIN (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)) u
               USING (doc_id)),
    pairs AS ({_sql_ngram_pairs('uniq')}),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    r AS (SELECT a, b FROM e
          UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
    labels AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a),
    curated AS (
      SELECT u.doc_id, u.text, u.quality
      FROM uniq u LEFT JOIN labels l ON u.doc_id = l.doc_id
      WHERE l.cluster_id IS NULL OR l.cluster_id = u.doc_id)
"""


@register(
    "curate_corpus",
    _SQL_CURATE_CTES + "SELECT doc_id, quality FROM curated",
)
def q_curate(spark, sf_dir):
    """The composed LLM corpus-curation pipeline: quality filter →
    language filter → exact dedup → MinHash near-dup clustering → keep
    cluster representatives (``operators/curation.py``). Oracle rebuilds
    the identical funnel in SQL with the exact all-pairs dedup."""
    docs = _t(spark, sf_dir, "documents")
    return curate_corpus(docs, min_quality=0.3, lang="en", neardup_threshold=0.5)


_SIMHASH_ALLPAIRS_ORACLE = f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents),
    th AS (SELECT doc_id, ('0x' || substring(md5(t), 1, 15))::BIGINT AS h FROM toks),
    bits AS (SELECT doc_id, r.i AS i,
                    sum(CASE WHEN (h >> r.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM th CROSS JOIN (SELECT unnest(range(60)) AS i) r
             GROUP BY 1, 2),
    sig AS (SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END)::BIGINT AS sim
            FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sim, b.sim))::INTEGER AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """


@register("dedup_simhash", _SIMHASH_ALLPAIRS_ORACLE)
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs, Hamming ≤ 3 via 4-chunk banding
    (complete by pigeonhole). The 60-bit md5-derived token hash is
    engine-portable, so the banding output hash-matches the all-pairs
    SQL oracle bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup_pairs(docs, "text", "doc_id", max_hamming=3)


@register("dedup_simhash_capped", _SIMHASH_ALLPAIRS_ORACLE)
def q_dedup_simhash_capped(spark, sf_dir):
    """The HUB-BUCKET-CAPPED banding path (VERDICT r7 item 2) under the
    SAME all-pairs oracle as ``dedup_simhash`` — the cap is recall-
    EXACT at max_hamming ≤ n_chunks-1: buckets above ``bucket_cap``
    rows sub-split on (other chunk, value) with a 1-bit-flip multiprobe
    (pigeonhole: a within-bucket pair's ≤3 differing bits spread over 3
    other chunks, so some chunk differs in ≤1 bit), bounding the
    within-bucket join fanout that goes quadratic on template-heavy /
    hub-signature corpora at ≥10⁸ signatures. bucket_cap=2 here forces
    essentially EVERY bucket through the sub-split, so a hash mismatch
    vs the exact oracle means the multiprobe lost or invented a pair.
    Hub-probe crossover (tools_scalebench.py --hamming-hub): uncapped
    15.1s at 80k hub signatures and quadratic beyond; capped 6.2s at
    80k, 20.3s at 320k."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup_pairs(
        docs, "text", "doc_id", max_hamming=3, bucket_cap=2
    )


# ---------------------------------------------------------------------------
# Embedding similarity search (extension surface)
# ---------------------------------------------------------------------------

@register(
    "similarity_topk",
    """
    SELECT q.vec_id AS query_id, e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) + 0 AS cosine_sim,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) + 0 DESC,
                                       e.vec_id)::INTEGER AS rank
    FROM embeddings e JOIN embeddings q ON q.vec_id < 5 AND e.vec_id <> q.vec_id
    QUALIFY rank <= 10
    """,
)
def q_sim_topk(spark, sf_dir):
    """Exact brute-force cosine top-10 for 5 query vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk(emb, queries, k=10)


_ANN_ORACLE = """
    SELECT q.vec_id AS query_id, 10 AS found_k, TRUE AS recall_ok
    FROM embeddings q WHERE q.vec_id < 5
"""


@register("similarity_signlsh", _ANN_ORACLE)
def q_sim_lsh(spark, sf_dir):
    """Approximate top-10 via sign-LSH multiprobe buckets, exported as a
    RECALL CONTRACT: per query, (found_k, recall_ok) with recall_ok =
    |lsh_top10 ∩ exact_top10| / 10 ≥ 0.9. The oracle pins found_k = 10
    and recall_ok = TRUE for every query — the Spark side computes both
    for real (exact side = full-scan cosine_topk), so an index
    regression (sparser buckets, lost neighbors) breaks the value hash
    instead of hiding behind a rows-only check. 8 tables × 4-bit
    multiprobe gives deterministic per-query recall 1.0 on this corpus
    (seeded hyperplanes)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = signlsh_topk(emb, queries, k=10, n_tables=8)
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_ivf", _ANN_ORACLE)
def q_sim_ivf(spark, sf_dir):
    """Approximate top-10 via an IVF index (KMeans coarse quantizer),
    exported as the same RECALL CONTRACT as ``similarity_signlsh``.
    These near-isotropic synthetic embeddings are IVF's worst case —
    neighbors spread across cells, so recall ≈ nprobe/nlist — hence
    nprobe=14/nlist=16 to deterministically clear the 0.9 bar at both
    driver SFs; on real (clustered) embeddings the same contract holds
    at nprobe ≪ nlist. The dial, not the constant, is the operator."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = ivf_topk(emb, queries, k=10, nlist=16, nprobe=14)
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_pq", _ANN_ORACLE)
def q_sim_pq(spark, sf_dir):
    """Approximate top-10 via PRODUCT QUANTIZATION + asymmetric
    distance (``operators/similarity.py::pq_topk``), exported as the
    same RECALL CONTRACT as ``similarity_signlsh``/``similarity_ivf``.
    PQ is the storage-bound regime's operator: the corpus persists as
    16×6-bit codes (12 bytes vs 256 — 21× compression) and queries
    scan codes with per-subspace lookup tables, exactly reranking only
    a 200-row shortlist. Codebooks train on a bounded id-ordered
    sample (the FAISS production shape — never O(corpus)). m=16
    subspaces × 64 centroids clears per-query recall 1.0 on this
    near-isotropic corpus from 500 up to 20,000 vectors (sf1) — the
    isotropy is PQ's worst case, same as IVF's; the shortlist size and
    (m, ksub) are the dials, not constants."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = pq_topk(emb, queries, k=10, m=16, ksub=64, shortlist=200)
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_ivfpq", _ANN_ORACLE)
def q_sim_ivfpq(spark, sf_dir):
    """Approximate top-10 via IVF-PQ — the FAISS ``IVF16,PQ16``
    composition (``operators/similarity.py::ivfpq_topk``) under the
    same RECALL CONTRACT as the other ANN queries. The coarse
    quantizer prunes to nprobe=14 of 16 cells AND the in-cell scan
    runs compressed (16×6-bit residual codes, asymmetric distance),
    exactly reranking a 200-row shortlist — multiplying the two
    savings the standalone ``similarity_ivf`` (prunes cells, reads
    floats) and ``similarity_pq`` (reads codes, scans everything)
    each capture alone; this is the billion-vector production
    default. Both quantizers train on one bounded id-ordered sample.
    nprobe=14/16 because this near-isotropic synthetic corpus is
    IVF's worst case (recall ≈ nprobe/nlist — see ``similarity_ivf``);
    the dials transfer to real clustered embeddings, the constants
    don't."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = ivfpq_topk(
        emb, queries, k=10, nlist=16, nprobe=14, m=16, ksub=64, shortlist=200
    )
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_ivf_persisted", _ANN_ORACLE)
def q_sim_ivf_persisted(spark, sf_dir):
    """The PERSISTED form of ``similarity_ivf`` — the ANN counterpart
    of ``dedup_incremental_persisted``'s write-once design: the KMeans
    coarse quantizer runs ONCE at ingest and the corpus lands
    PARTITIONED BY cell id (``operators/similarity.py::write_ivf_index``
    — the directory layout IS the inverted file; centroids in a tiny
    companion table). Query time does zero training or assignment:
    centroids rank driver-side (nlist rows), and the scan carries an
    IN-filter on the partition column, so only the probed cells'
    files are ever read — partition pruning is plan-locked in
    ``tests/test_similarity_persisted.py``. Same recall contract as
    the other ANN queries (nprobe=14/nlist=16 on this isotropic
    worst-case corpus; the dial transfers, not the constant)."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    table = _scoped_band_table(spark, sf_dir, "ivf_index")
    _reset_managed_table(spark, table)
    _reset_managed_table(spark, f"{table}__centroids")
    write_ivf_index(spark, emb, table, nlist=16)
    ann = ivf_topk_from_index(spark, table, queries, k=10, nprobe=14)
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_ivf_appended", _ANN_ORACLE)
def q_sim_ivf_appended(spark, sf_dir):
    """IVF index LIFECYCLE under the shared recall contract — the ANN
    mirror of ``dedup_band_table_appended``: the index is built from
    the first half of the corpus (quantizer trained once), the second
    half arrives later and is APPENDED with
    ``operators/similarity.py::append_ivf_index`` — assigned to the
    nearest STORED centroids (broadcast matrix, one argmin per Arrow
    batch; O(batch), the existing index files never read) and written
    through the same cell partitioning, so queries keep pruning to
    probed cells across appends. The recall contract then runs against
    the full appended index vs the exact scan of the full corpus —
    centroids trained on half the data must still clear 0.9 recall at
    nprobe=14/16 (they do: probe breadth, not centroid quality,
    dominates recall on this isotropic corpus)."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    first = emb.where(F.col("vec_id") % 2 == 0)
    later = emb.where(F.col("vec_id") % 2 == 1)
    table = _scoped_band_table(spark, sf_dir, "ivf_appended")
    _reset_managed_table(spark, table)
    _reset_managed_table(spark, f"{table}__centroids")
    write_ivf_index(spark, first, table, nlist=16)
    append_ivf_index(spark, later, table)
    ann = ivf_topk_from_index(spark, table, queries, k=10, nprobe=14)
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


def _drifted_corpus(emb):
    """Half-original / half-DRIFTED corpus for the rebalance lifecycle:
    odd vec_ids move to the positive orthant (|x| per dim) — high
    internal variance (a retrain CAN split them across cells) but
    concentrated relative to iso-trained frozen centroids (the append
    piles into few cells). Measured at sf0.001: max/median cell
    occupancy 3.58 before rebalance → 1.88 after."""
    first = emb.where(F.col("vec_id") % 2 == 0)
    later = emb.where(F.col("vec_id") % 2 == 1).withColumn(
        "embedding", F.transform("embedding", lambda x: F.abs(x))
    )
    return first, later


@register("similarity_ivf_rebalanced", _ANN_ORACLE)
def q_sim_ivf_rebalanced(spark, sf_dir):
    """The REBALANCE verb of the IVF lifecycle (VERDICT r7 item 3):
    build from the even half, append a DRIFTED odd half (squashed
    toward one direction — under the frozen centroids these pile into
    a few cells, degrading pruning), then
    ``operators/similarity.py::rebalance_ivf_index`` retrains the
    coarse quantizer on a bounded id-ordered sample of the CURRENT
    corpus and rewrites the cell layout in one corpus pass. The query
    path is untouched, and the recall contract runs post-rebalance
    against the exact scan of the drifted corpus — proving the healed
    index still clears 0.9 at nprobe=14/16. The skew evidence
    (max/median cell occupancy before vs after) is pytest-locked in
    ``tests/test_similarity_persisted.py``."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_from_index,
        rebalance_ivf_index,
        write_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    first, later = _drifted_corpus(emb)
    corpus = first.unionByName(later)
    queries = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    table = _scoped_band_table(spark, sf_dir, "ivf_rebalanced")
    _reset_managed_table(spark, table)
    _reset_managed_table(spark, f"{table}__centroids")
    write_ivf_index(spark, first, table, nlist=16)
    append_ivf_index(spark, later, table)
    rebalance_ivf_index(spark, table)
    ann = ivf_topk_from_index(spark, table, queries, k=10, nprobe=14)
    exact = cosine_topk(corpus, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_pq_persisted", _ANN_ORACLE)
def q_sim_pq_persisted(spark, sf_dir):
    """The PERSISTED form of ``similarity_pq`` — compression AT REST,
    which the fused ``pq_topk`` only simulates: the corpus is stored
    as 16 smallint codes per vector (``write_pq_index``; codebooks in
    a tiny companion table, build params as table properties), and the
    query-time ADC scan reads ONLY the codes table — zero float-vector
    reads until the exact rerank, which joins the ≤ queries×shortlist
    id set back to the vector store as a point lookup (plan-locked in
    ``tests/test_similarity_persisted.py``). Same recall contract as
    the other ANN queries."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        pq_topk_from_index,
        write_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    table = _scoped_band_table(spark, sf_dir, "pq_index")
    _reset_managed_table(spark, table)
    _reset_managed_table(spark, f"{table}__codebooks")
    write_pq_index(spark, emb, table, m=16, ksub=64)
    ann = pq_topk_from_index(spark, table, queries, emb, k=10, shortlist=200)
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_pq_appended", _ANN_ORACLE)
def q_sim_pq_appended(spark, sf_dir):
    """PQ index lifecycle under the shared recall contract — the codes
    mirror of ``similarity_ivf_appended``: codebooks train on the even
    half, the odd half arrives later and is ENCODED WITH THE STORED
    CODEBOOKS (``append_pq_index`` — O(batch), existing code files
    never read) and appended; the contract then runs against the full
    appended index vs the exact scan. Codebooks trained on half the
    data must still clear 0.9 recall — the 200-row shortlist absorbs
    the extra quantization error, which is the dial that matters."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_pq_index,
        pq_topk_from_index,
        write_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    first = emb.where(F.col("vec_id") % 2 == 0)
    later = emb.where(F.col("vec_id") % 2 == 1)
    table = _scoped_band_table(spark, sf_dir, "pq_appended")
    _reset_managed_table(spark, table)
    _reset_managed_table(spark, f"{table}__codebooks")
    write_pq_index(spark, first, table, m=16, ksub=64)
    append_pq_index(spark, later, table)
    ann = pq_topk_from_index(spark, table, queries, emb, k=10, shortlist=200)
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_ivfpq_persisted", _ANN_ORACLE)
def q_sim_ivfpq_persisted(spark, sf_dir):
    """The PERSISTED composed index (VERDICT r8 item 5) — the
    billion-vector production layout both standalone lifecycles only
    half-capture: residual PQ CODES at rest (m·2 bytes per vector),
    PARTITIONED BY coarse cell (the directory layout is the inverted
    file). ``operators/similarity.py::write_ivfpq_index`` trains both
    quantizers on one bounded id-ordered sample and writes the corpus
    in one pass; the second corpus half arrives later through
    ``append_ivfpq_index`` (stored centroids + stored codebooks,
    O(batch)). Query time (``ivfpq_topk_from_index``) prunes the scan
    to probed-cell partitions AND reads only codes — the multiplied
    savings — then point-looks-up the shortlist for the exact rerank.
    Probed-cell partition pruning and the codes-only scan are
    plan-locked in ``tests/test_similarity_persisted.py``; all three
    index tables share an epoch stamp (torn writes fail loudly). Same
    recall contract as every ANN query (nprobe=14/16 on this
    isotropic worst-case corpus)."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivfpq_index,
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    first = emb.where(F.col("vec_id") % 2 == 0)
    later = emb.where(F.col("vec_id") % 2 == 1)
    table = _scoped_band_table(spark, sf_dir, "ivfpq_index")
    for t in (table, f"{table}__centroids", f"{table}__codebooks"):
        _reset_managed_table(spark, t)
    write_ivfpq_index(spark, first, table, nlist=16, m=16, ksub=64)
    append_ivfpq_index(spark, later, table)
    ann = ivfpq_topk_from_index(
        spark, table, queries, emb, k=10, nprobe=14, shortlist=200
    )
    exact = cosine_topk(emb, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_pq_rebalanced", _ANN_ORACLE)
def q_sim_pq_rebalanced(spark, sf_dir):
    """The REBALANCE verb of the PQ lifecycle (VERDICT r8 item 6) —
    the codes mirror of ``similarity_ivf_rebalanced``: codebooks train
    on the even half, a DRIFTED odd half (positive-orthant squash)
    arrives and is encoded with the FROZEN codebooks
    (``append_pq_index`` — quantization error concentrates where the
    codebooks never trained), then
    ``operators/similarity.py::rebalance_pq_index`` retrains the
    codebooks on a bounded id-ordered sample of the CURRENT corpus and
    re-encodes everything in one pass under a bumped epoch. The recall
    contract runs post-rebalance against the exact scan of the drifted
    corpus; the healing evidence (ADC reconstruction MSE degraded by
    the drifted append, reduced by the rebalance, recall re-proved) is
    pytest-locked in ``tests/test_similarity_persisted.py``."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_pq_index,
        pq_topk_from_index,
        rebalance_pq_index,
        write_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    first, later = _drifted_corpus(emb)
    corpus = first.unionByName(later)
    queries = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    table = _scoped_band_table(spark, sf_dir, "pq_rebalanced")
    _reset_managed_table(spark, table)
    _reset_managed_table(spark, f"{table}__codebooks")
    write_pq_index(spark, first, table, m=16, ksub=64)
    append_pq_index(spark, later, table)
    rebalance_pq_index(spark, corpus, table)
    ann = pq_topk_from_index(spark, table, queries, corpus, k=10, shortlist=200)
    exact = cosine_topk(corpus, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register("similarity_ivfpq_rebalanced", _ANN_ORACLE)
def q_sim_ivfpq_rebalanced(spark, sf_dir):
    """The REBALANCE verb of the COMPOSED lifecycle (VERDICT r9 item
    1) — the last cell of the index-lifecycle grid: band table, IVF,
    and PQ each already rebalance, and the composed index accumulates
    BOTH drift modes at once (a drifted append piles into few cells,
    so partition pruning degrades, AND its residuals quantize badly
    against codebooks that never saw the new distribution). Build from
    the even half, append the DRIFTED odd half through the frozen
    geometry (``append_ivfpq_index``), then
    ``operators/similarity.py::rebalance_ivfpq_index`` retrains coarse
    quantizer + residual codebooks on one bounded id-ordered sample of
    the float corpus and re-encodes + re-partitions in ONE pass under
    a bumped shared ``ivfpq.epoch``. The recall contract runs
    post-rebalance against the exact scan of the drifted corpus; the
    healing evidence (cell skew AND ``ivfpq_adc_mse`` both degraded by
    the drifted append, both reduced by the one rebalance call, recall
    re-proved) is pytest-locked in
    ``tests/test_similarity_persisted.py``."""
    from common_survey_data_pipeline_spark.operators.similarity import (
        append_ivfpq_index,
        ivfpq_topk_from_index,
        rebalance_ivfpq_index,
        write_ivfpq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    first, later = _drifted_corpus(emb)
    corpus = first.unionByName(later)
    queries = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    table = _scoped_band_table(spark, sf_dir, "ivfpq_rebalanced")
    for t in (table, f"{table}__centroids", f"{table}__codebooks"):
        _reset_managed_table(spark, t)
    write_ivfpq_index(spark, first, table, nlist=16, m=16, ksub=64)
    append_ivfpq_index(spark, later, table)
    rebalance_ivfpq_index(spark, corpus, table)
    ann = ivfpq_topk_from_index(
        spark, table, queries, corpus, k=10, nprobe=14, shortlist=200
    )
    exact = cosine_topk(corpus, queries, k=10)
    return recall_vs_exact(ann, exact, k=10, min_recall=0.9)


@register(
    "embedding_neardup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
             AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
          >= 0.45
    """,
)
def q_emb_neardup(spark, sf_dir):
    """Embedding near-duplicate pairs at cosine ≥ 0.45, cost-based
    strategy: exact all-pairs below the corpus cutoff (the better plan
    at test scale — matches the oracle bit-for-bit), multi-table
    multiprobe sign-LSH + exact verification above it."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.45, strategy="auto")


@register(
    "embedding_dedup_keep",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 6) >= 0.45
    ),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    r AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
    ),
    lab AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id FROM r GROUP BY a)
    SELECT v.vec_id,
           coalesce(l.cluster_id, v.vec_id) AS cluster_id,
           (coalesce(l.cluster_id, v.vec_id) = v.vec_id) AS kept
    FROM embeddings v LEFT JOIN lab l USING (vec_id)
    """,
)
def q_emb_dedup_keep(spark, sf_dir):
    """End-to-end semantic dedup: near-dup pairs (cosine ≥ 0.45) →
    connected components → canonical keeper per cluster (min vec_id);
    singletons keep themselves. The downstream corpus is
    ``WHERE kept`` — exactly one representative per semantic cluster.

    100 TB shape: pair generation is the cost-based exact↔LSH switch of
    ``embedding_neardup``; clustering is min-label propagation (one
    equi-join shuffle per diameter round); the final keep decision is a
    broadcast-size label frame joined back to the corpus scan."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, threshold=0.45, strategy="auto").select(
        "id_a", "id_b"
    )
    labels = neardup_clusters(pairs).withColumnRenamed("doc_id", "vec_id")
    out = emb.select("vec_id").join(labels, "vec_id", "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col("vec_id"))
    return out.select(
        "vec_id",
        cluster.alias("cluster_id"),
        (cluster == F.col("vec_id")).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Event streams (batch-checkable forms of the streaming operators)
# ---------------------------------------------------------------------------

@register(
    "events_tumbling_1h",
    """
    SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
           (date_trunc('hour', ts) + INTERVAL 1 HOUR)::TIMESTAMP AS window_end,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_ev_tumbling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return tumbling_counts(ev, "1 hour")


@register(
    "events_sliding_2h_1h",
    """
    SELECT window_start,
           (window_start + INTERVAL 2 HOUR)::TIMESTAMP AS window_end,
           event_type, count(*) AS n_events
    FROM (SELECT event_type,
                 unnest([date_trunc('hour', ts)::TIMESTAMP,
                         (date_trunc('hour', ts) - INTERVAL 1 HOUR)::TIMESTAMP])
                   AS window_start
          FROM events)
    GROUP BY 1, 2, 3
    """,
)
def q_ev_sliding(spark, sf_dir):
    """Sliding windows (2h window, 1h slide): every event lands in two
    overlapping windows (F.window with slideDuration in Spark; explicit
    window-start expansion in the oracle)."""
    from common_survey_data_pipeline_spark.streaming.events import sliding_counts

    ev = _t(spark, sf_dir, "events")
    return sliding_counts(ev, "2 hours", "1 hour")


@register(
    "events_sessions_30m",
    """
    WITH ev AS (
      -- truncate ns → µs so the gap comparison sees exactly what Spark sees
      SELECT user_id, ts::TIMESTAMP AS ts, event_id FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM flagged)
    SELECT user_id, min(ts)::TIMESTAMP AS session_start, count(*) AS n_events,
           min(ts)::TIMESTAMP AS first_ts, max(ts)::TIMESTAMP AS last_ts
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_ev_sessions(spark, sf_dir):
    """Session windows (30 min inactivity gap) — F.session_window in
    Spark, gaps-and-islands in the oracle."""
    ev = _t(spark, sf_dir, "events")
    return session_stats(ev, "30 minutes")


@register(
    "events_stateful_sessions",
    """
    WITH ev AS (
      SELECT user_id, ts::TIMESTAMP AS ts, event_id,
             CAST(round_even(value * 100.0, 0) AS BIGINT) AS cents
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, cents,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM ev),
    sessions AS (
      SELECT user_id, ts, cents,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS session_id
      FROM flagged)
    SELECT user_id,
           min(ts)::TIMESTAMP AS session_start,
           max(ts)::TIMESTAMP AS session_end,
           count(*) AS n_events,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_ev_stateful_sessions(spark, sf_dir):
    """The stateful-streaming module's driver-visible parity row
    (VERDICT r6 item 3): per-user session aggregation with a 30-minute
    inactivity timeout, including per-session value totals — the
    custom per-key stateful operator
    (``streaming/stateful.py::session_stats_stateful``). The streaming
    form is ``applyInPandasWithState`` with four longs of per-user
    state; THIS registered path is its deterministic batch replay
    (gaps-and-islands twin inside the same function), and
    ``tests/test_stateful_sessions.py`` proves the two forms emit
    identical sessions over time-ordered micro-batch replay — the same
    pattern that made ``events_late_data_accounting`` driver-visible.

    HASH-STABLE BY CONSTRUCTION (r6 playbook): session boundaries are
    integer-microsecond comparisons, totals are exact integer cents
    (``rint ≡ round_even`` on the identical double product), so no
    float ever reaches the output."""
    from common_survey_data_pipeline_spark.streaming.stateful import (
        session_stats_stateful,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "cents", F.expr("CAST(rint(value * 100.0) AS BIGINT)")
    )
    return session_stats_stateful(ev, "30 minutes")


@register(
    "events_daily_dense",
    """
    WITH spans AS (
      SELECT user_id, date_trunc('day', min(ts))::TIMESTAMP AS d0,
             date_trunc('day', max(ts))::TIMESTAMP AS d1
      FROM events GROUP BY user_id),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::TIMESTAMP AS day
      FROM spans),
    daily AS (
      SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n_events
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q_ev_dense(spark, sf_dir):
    """Gap-filling date spine: every (user, day) between the user's
    first and last event, zero-filled — sequence+explode generates the
    spine (no driver loop), one left join attaches the sparse counts."""
    ev = _t(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("DAY", F.min("ts")).alias("d0"),
        F.date_trunc("DAY", F.max("ts")).alias("d1"),
    )
    spine = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce("n", F.lit(0)).alias("n_events")
    )


@register(
    "events_dedup_first",
    """
    SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts
    FROM (SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts FROM events)
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
    """,
)
def q_ev_dedup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return dedup_events(ev).select("user_id", "event_type", "event_id", "ts")


# ---------------------------------------------------------------------------
# Multimodal plumbing (extension surface)
# ---------------------------------------------------------------------------

@register(
    "multimodal_decode",
    """
    SELECT doc_id,
           strlen(text)::BIGINT AS payload_bytes,
           (16 + strlen(text) % 64)::INTEGER  AS width,
           (16 + (strlen(text) // 64) % 64)::INTEGER AS height
    FROM documents
    """,
)
def q_mm_decode(spark, sf_dir):
    """Arrow-batched mapInPandas decode stub over binary payloads; the
    deterministic fake's dims are mirror-computable in SQL (real decode
    is the clearly-marked NotImplementedError path)."""
    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "text", "doc_id")
    return decode_images(media).select("doc_id", "payload_bytes", "width", "height")


@register(
    "multimodal_resize",
    """
    SELECT doc_id, width, height,
           greatest(1, width * 128 // greatest(width, height, 1))::INTEGER AS out_width,
           greatest(1, height * 128 // greatest(width, height, 1))::INTEGER AS out_height
    FROM (SELECT doc_id,
                 (16 + strlen(text) % 64)::INTEGER AS width,
                 (16 + (strlen(text) // 64) % 64)::INTEGER AS height
          FROM documents)
    """,
)
def q_mm_resize(spark, sf_dir):
    """Decode → aspect-preserving resize chain (both mapInPandas
    stages); the fake kernel's integer geometry is mirrored in SQL."""
    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "text", "doc_id")
    return resize_images(decode_images(media), target=128)


@register(
    "multimodal_frames",
    """
    SELECT doc_id, i::INTEGER AS frame_idx, (i * 64)::BIGINT AS byte_offset
    FROM documents,
         unnest(range(0, least(strlen(text) // 64, 7) + 1)) AS t(i)
    """,
)
def q_mm_frames(spark, sf_dir):
    """Frame-sampling plumbing: one row per sampled byte offset."""
    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "text", "doc_id")
    return sample_frames(media).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )


@register(
    "multimodal_phash_neardup",
    "SELECT doc_id, TRUE AS banded_matches_exact FROM documents",
)
def q_mm_phash_neardup(spark, sf_dir):
    """Image perceptual near-dup — the bridge between the multimodal
    stack (pixels) and the dedup stack (Hamming banding): per-image
    DCT pHash (``operators/multimodal.py::phash_images`` — Arrow-
    batched mapInPandas, the whole batch's luma planes DCT'd in two
    batched matmuls) feeds ``operators/dedup.py::hamming_band_pairs``,
    the SAME 4-chunk pigeonhole banding engine text SimHash uses, so
    image near-dup candidates come from an equi-join, never all-pairs
    (plan-pinned in ``tests/test_phash.py``).

    The corpus: deterministic synthetic 32×32 raw-luma planes
    (``synthetic_luma_payloads`` — the container ships no image corpus
    or codecs) where each 5-image group holds jittered near-dup
    variants (Hamming 0-3ish) of a base image plus one far variant
    (Hamming ≥ 10, must not pair).

    Oracle = an engine-independent COMPLETENESS CONTRACT, the
    ``similarity_signlsh`` pattern: DuckDB cannot DCT, so the Spark
    side computes BOTH the banded pairs and the exact all-pairs
    Hamming ≤ 3 relation (the quadratic branch exists only inside this
    contract at driver scale — one long XOR+popcount per pair; the
    production operator is the banded path) and emits per doc whether
    the two pair sets agree on every pair touching that doc. The
    oracle pins TRUE for every document, so a banding regression
    (lost candidates, broken chunking) breaks the value hash instead
    of hiding behind a rows-only check. Driver-side hash parity — the
    identical pHash recomputed in pure numpy on collected payloads —
    is asserted in ``tests/test_phash.py``.
    """
    docs = _t(spark, sf_dir, "documents")
    hashes = phash_images(synthetic_luma_payloads(docs)).cache()
    banded = hamming_band_pairs(hashes, "doc_id", "phash", 64, 3)
    a = hashes.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("__pa"))
    b = hashes.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("__pb"))
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__pa").bitwiseXOR(F.col("__pb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )
    mismatch = banded.exceptAll(exact).unionAll(exact.exceptAll(banded))
    bad = (
        mismatch.select(F.col("id_a").alias("doc_id"))
        .unionAll(mismatch.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("__bad", F.lit(True))
    )
    return (
        docs.select("doc_id")
        .join(bad, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(~F.col("__bad"), F.lit(True)).alias(
                "banded_matches_exact"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Temporal / skew joins (engine extension of §2.3's join taxonomy)
# ---------------------------------------------------------------------------

@register(
    "j6_asof_join",
    """
    WITH o AS (  -- pre-reduce: one deterministic order per (custkey, orderdate)
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2),
    e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events)
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
    FROM e ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_j6(spark, sf_dir):
    """As-of join: each event picks the user's most recent order at or
    before the event time — union-then-window formulation, one shuffle
    (``temporal_joins.asof_join``)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate"))
        .agg(F.max("o_orderkey").alias("last_orderkey"))
        .select("user_id", F.col("o_orderdate").alias("ts"), "last_orderkey",
                F.col("o_orderdate").alias("last_orderdate"))
    )
    out = asof_join(ev, orders, on="user_id", left_ts="ts", direction="backward")
    return out.select("event_id", "user_id", "ts", "last_orderkey", "last_orderdate")


@register(
    "j9_asof_forward",
    """
    WITH ev AS (  -- pre-reduce: one deterministic event per (user, instant)
      SELECT user_id, ts::TIMESTAMP AS ts, min(event_id) AS next_event_id
      FROM events GROUP BY 1, 2)
    SELECT o.o_orderkey, o.user_id, o.ts, e.next_event_id, e.next_event_ts
    FROM (SELECT o_orderkey, o_custkey AS user_id, o_orderdate AS ts,
                 -epoch(o_orderdate) AS nts FROM orders) o
    ASOF LEFT JOIN (SELECT user_id, ts AS next_event_ts, next_event_id,
                           -epoch(ts) AS nts FROM ev) e
      ON o.user_id = e.user_id AND o.nts >= e.nts
    """,
)
def q_j9(spark, sf_dir):
    """FORWARD as-of join: each order picks the user's first event at or
    after the order instant (union-then-window with descending scan;
    oracle = DuckDB backward ASOF on negated epochs)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
    )
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("next_event_id"))
        .select("user_id", "ts", "next_event_id", F.col("ts").alias("next_event_ts"))
    )
    out = asof_join(orders, ev, on="user_id", left_ts="ts", direction="forward")
    return out.select("o_orderkey", "user_id", "ts", "next_event_id", "next_event_ts")


@register(
    "j7_interval_join",
    """
    SELECT p.promo_month, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o
    JOIN (SELECT DISTINCT date_trunc('month', o_orderdate)::TIMESTAMP AS promo_month,
                 (date_trunc('month', o_orderdate) - INTERVAL 15 DAY)::TIMESTAMP AS start_ts,
                 (date_trunc('month', o_orderdate) + INTERVAL 15 DAY)::TIMESTAMP AS end_ts
          FROM orders) p
      ON o.o_orderdate >= p.start_ts AND o.o_orderdate < p.end_ts
    GROUP BY 1
    """,
)
def q_j7(spark, sf_dir):
    """Pure range (interval) join via the theta→equi bucket rewrite:
    ±15-day promo windows around each month boundary, orders counted
    into every window containing them (``temporal_joins.interval_join``)."""
    orders = _t(spark, sf_dir, "orders")
    promos = (
        orders.select(
            F.date_trunc("MONTH", "o_orderdate").alias("promo_month")
        )
        .distinct()
        .select(
            "promo_month",
            (F.col("promo_month") - F.expr("interval 15 days")).alias("start_ts"),
            (F.col("promo_month") + F.expr("interval 15 days")).alias("end_ts"),
        )
    )
    joined = interval_join(
        orders, promos, left_ts="o_orderdate",
        right_start="start_ts", right_end="end_ts", bucket="month",
    )
    return joined.groupBy("promo_month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "j8_salted_skew_join",
    """
    SELECT c.c_mktsegment, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def q_j8(spark, sf_dir):
    """Deterministically salted equi join (skew mitigation) — result is
    bit-identical to the plain join, verified by the plain-join oracle."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(ev, cust, left_on="user_id", right_on="c_custkey", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Window-function extension surface (§2.5 beyond the reference)
# ---------------------------------------------------------------------------

@register(
    "w2_lead_lag_gaps",
    """
    SELECT event_id, user_id, ts,
           date_diff('second', prev_ts, ts)::BIGINT AS gap_seconds,
           next_type
    FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts,
                 lag(ts::TIMESTAMP)  OVER w AS prev_ts,
                 lead(event_type) OVER w AS next_type
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    """,
)
def q_w2(spark, sf_dir):
    """lead/lag over per-user event sequences: inter-event gap seconds
    and the next event's type."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias("gap_seconds"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "w3_rolling_avg",
    """
    SELECT o_orderkey, o_custkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS avg_last3
    FROM orders
    """,
)
def q_w3(spark, sf_dir):
    """Frame-spec rolling aggregate: 3-order moving average per customer
    (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("avg_last3"),
    )


@register(
    "w4_running_total",
    """
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice::DECIMAL(14,2))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING), 2)::DOUBLE AS lifetime_spend
    FROM orders
    """,
)
def q_w4(spark, sf_dir):
    """Running cumulative sum per customer (decimal-exact accumulation)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).over(w), 2)
        .cast("double")
        .alias("lifetime_spend"),
    )


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation (§2.4 extension: rollup / cube / percentiles)
# ---------------------------------------------------------------------------

@register(
    "w5_rank_family",
    """
    SELECT p_partkey, p_brand,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           dense_rank() OVER w::INTEGER AS drank,
           round(first_value(p_retailprice) OVER w, 2) AS cheapest,
           round(last_value(p_retailprice)
                 OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS priciest
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def q_w5(spark, sf_dir):
    """The rank-function family (percent_rank / cume_dist / dense_rank /
    first_value / full-frame last_value) per brand."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return p.select(
        "p_partkey",
        "p_brand",
        # RAW doubles, deliberately un-rounded (round-6 sf1 finding):
        # both are divisions of identical exact integers ((r-1)/(n-1),
        # k/n) so the doubles are bit-identical across engines, while
        # round(…, 6) DIVERGES exactly on decimal repr ties — at sf1
        # the 6400-row brand groups put cume on 0.xxxxxx5 (41/640),
        # where Spark's BigDecimal half-up and DuckDB's binary round
        # disagree (the shortest-repr tie class of the r5 playbook).
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.round(F.first("p_retailprice").over(w), 2).alias("cheapest"),
        F.round(F.last("p_retailprice").over(w_full), 2).alias("priciest"),
    )


@register(
    "a3_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)::INTEGER * 2 + grouping(l_linestatus)::INTEGER AS gid,
           count(*) AS n,
           round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_a3(spark, sf_dir):
    """ROLLUP with grouping_id to disambiguate subtotal rows from NULL
    group values."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@register(
    "a4_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus)::INTEGER * 2 + grouping(o_orderpriority)::INTEGER AS gid,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_a4(spark, sf_dir):
    """CUBE over two order dimensions."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().cast("int").alias("gid"), F.count(F.lit(1)).alias("n"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
    )


@register(
    "a5_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_a5(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`). At 100 TB swap in approx_percentile — kept
    exact here for oracle parity."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "a6_approx_count_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           (abs(approx_count_distinct(user_id)::DOUBLE
                / count(DISTINCT user_id) - 1) < 0.05) AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q_a6(spark, sf_dir):
    """HyperLogLog++ distinct-count sketch per event type — the
    100 TB-scale substitute for exact COUNT(DISTINCT) (single pass, no
    per-key state explosion). Raw sketch estimates are implementation-
    specific, so the CONTRACT each engine exports is (a) the exact
    distinct count — identical by definition — and (b) a boolean that
    its own sketch lands within 5% relative error of that exact count
    (Spark HLL++ at rsd=1%, DuckDB HLL). Hash-comparable without
    pinning either engine's sketch internals; at 100 TB you'd drop the
    exact column and keep only the sketch."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.01).cast("double")
                / F.count_distinct("user_id")
                - 1
            )
            < 0.05
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Reshaping: pivot / unpivot / explode (§1.2's wide↔long duality)
# ---------------------------------------------------------------------------

@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark, sf_dir):
    """Long→wide pivot with an explicit value list (no extra distinct
    pass; map-side partial agg on (user, type))."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "error", "purchase", "signup", "view"])
    )


@register(
    "unpivot_lineitem",
    """
    SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem)
    """,
)
def q_unpivot(spark, sf_dir):
    """Wide→long unpivot (melt) of three lineitem measures."""
    li = _t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "price")
        .otherwise("discount")
        .alias("measure"),
        F.round("val", 2).alias("val"),
    )


@register(
    "explode_token_counts",
    """
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    t -> t <> '')) AS tok
          FROM documents)
    GROUP BY tok
    HAVING count(*) >= 100
    """,
)
def q_explode(spark, sf_dir):
    """Lateral explode of tokens + frequency count (the vocabulary-build
    primitive; map-side combine keeps the shuffle at |vocab|)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 100)
    )


@register(
    "json_props_stats",
    """
    SELECT event_type,
           count(k) AS n_with_k,
           round(avg(k), 4) AS avg_k,
           min(k) AS min_k, max(k) AS max_k
    FROM (SELECT event_type,
                 TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          FROM events)
    GROUP BY event_type
    """,
)
def q_json(spark, sf_dir):
    """Semi-structured JSON column: extract props.k JVM-side
    (get_json_object) and aggregate."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-style bench queries
# ---------------------------------------------------------------------------

@register(
    "q6_revenue_delta",
    """
    SELECT round(sum(l_extendedprice::DECIMAL(12,2) * (l_discount::DECIMAL(4,2))), 2)::DOUBLE
             AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q_q6(spark, sf_dir):
    """TPC-H Q6-style: pure scan-filter-aggregate, zero shuffle beyond
    the final single-row reduce — the pushdown showcase."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue_delta")
        )
    )


@register(
    "q10_returned_revenue",
    f"""
    SELECT c_custkey, c_name, round(sum({_DISC_PRICE_DEC}), 2)::DOUBLE AS revenue,
           n_name
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    QUALIFY row_number() OVER (ORDER BY revenue DESC, c_custkey) <= 20
    """,
)
def q_q10(spark, sf_dir):
    """TPC-H Q10-style: returned-item revenue per customer, top 20 —
    fact filtered early at the scan.

    Scale shape: orders (date-filtered but still fact-proportional)
    and customer join as shuffle joins; only the 25-row nation dim is
    broadcast. Top-20 via orderBy().limit() → TakeOrderedAndProject
    instead of a partition-less Window over the aggregate."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_disc_price_dec()), 2).cast("double").alias("revenue"))
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


# ---------------------------------------------------------------------------
# Sampling, statistics, subquery patterns, scalar-function coverage
# ---------------------------------------------------------------------------

@register(
    "sample_deterministic",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE substr(md5(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR), 1, 2) < '1a'
    """,
)
def q_sample(spark, sf_dir):
    """Deterministic ~10% hash sample (md5 prefix < '1a' ≈ 26/256).
    Unlike TABLESAMPLE this is reproducible across engines, partitions
    and reruns — the right sampling primitive for data pipelines."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return li.where(F.substring(F.md5(key), 1, 2) < "1a").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@register(
    "stratified_sample",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_returnflag
        ORDER BY md5(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR),
                 l_orderkey, l_linenumber) <= 100
    """,
)
def q_stratified(spark, sf_dir):
    """Deterministic stratified sampling: at most k rows per stratum,
    chosen by hash order — reproducible across engines/partitionings,
    the per-source quota primitive of training-data pipelines."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.md5(F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")))
    w = Window.partitionBy("l_returnflag").orderBy(
        key, F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 100)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
    )


@register(
    "stats_moments",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) + 0 AS cov_qty_price,
           round(skewness(l_quantity), 4) + 0 AS skew_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats(spark, sf_dir):
    """Second/third-moment statistical aggregates per group."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        _roundz(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        _roundz(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
        _roundz(F.skewness("l_quantity"), 4).alias("skew_qty"),
    )


@register(
    "scalar_subquery_above_brand_avg",
    """
    SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price
    FROM part p
    WHERE p_retailprice > 1.05 * (SELECT avg(p_retailprice) FROM part p2
                                  WHERE p2.p_brand = p.p_brand)
    """,
)
def q_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery, decorrelated by hand into a
    broadcast join against the per-brand aggregate (what Catalyst does
    to the SQL form internally)."""
    part = _t(spark, sf_dir, "part")
    brand_avg = part.groupBy(F.col("p_brand").alias("__b")).agg(
        F.avg("p_retailprice").alias("__avg")
    )
    return (
        part.join(F.broadcast(brand_avg), part.p_brand == F.col("__b"))
        .where(F.col("p_retailprice") > 1.05 * F.col("__avg"))
        .select("p_partkey", "p_brand", F.round("p_retailprice", 2).alias("price"))
    )


@register(
    "q12_priority_by_status",
    """
    SELECT l_linestatus,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q_q12(spark, sf_dir):
    """TPC-H Q12-style: join + CASE-bucketed conditional counts.

    Scale shape: lineitem ⋈ orders is the canonical fact-to-fact
    shuffle join — orders is ~lineitem/4 and unfiltered here, so a
    broadcast hint would be a guaranteed OOM at 100×. Only the two
    projected columns of orders reach the join (column pruning)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(is_high, 1)).alias("high_count"),
            F.count(F.when(~is_high, 1)).alias("low_count"),
        )
    )


@register(
    "q14_promo_share",
    f"""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_DEC}
                                  ELSE 0::DECIMAL(12,2) END)
                 / sum({_DISC_PRICE_DEC}), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01' AND l.l_shipdate < TIMESTAMP '1997-09-01'
    """,
)
def q_q14(spark, sf_dir):
    """TPC-H Q14-style promo revenue share: ratio of conditional sums
    (decimal-exact). part is sf-scaled (SF×200k rows), so the join is
    an unhinted shuffle join — AQE promotes part to broadcast at small
    SF where it fits."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    disc = _disc_price_dec()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                ))
                / F.sum(disc),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey, o_orderdate, round(total_qty, 2) AS total_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_q18(spark, sf_dir):
    """TPC-H Q18-style: HAVING-filtered aggregate driving joins.

    Scale shape: the >150-qty aggregate is data-dependent (usually
    tiny, but not provably so) and customer is fact-proportional — no
    hard broadcast hints; AQE promotes either side to broadcast at
    runtime when its actual post-filter size allows."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@register(
    "string_functions",
    """
    SELECT p_partkey,
           regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g') AS slug,
           upper(left(p_name, 3)) AS prefix,
           length(p_name)::INTEGER AS name_len,
           reverse(p_name) AS rev,
           replace(p_name, ' ', '-') AS dashed,
           lpad(p_brand, 12, '.') AS padded
    FROM part
    """,
)
def q_string_funcs(spark, sf_dir):
    """Scalar string-function coverage (slugify/case/pad/reverse)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.lower("p_name"), "[^a-z0-9]+", "_").alias("slug"),
        F.upper(F.substring("p_name", 1, 3)).alias("prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.reverse(F.col("p_name")).alias("rev"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias("dashed"),
        F.lpad(F.col("p_brand"), 12, ".").alias("padded"),
    )


@register(
    "date_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate)::INTEGER AS yr,
           quarter(o_orderdate)::INTEGER AS qtr,
           month(o_orderdate)::INTEGER AS mth,
           day(o_orderdate)::INTEGER AS dom,
           last_day(o_orderdate)::DATE AS month_end,
           (o_orderdate + INTERVAL 30 DAY)::TIMESTAMP AS due_ts,
           date_diff('day', o_orderdate, TIMESTAMP '1999-01-01')::BIGINT AS days_to_cutoff
    FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    """Scalar date/time-function coverage."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.month("o_orderdate").cast("int").alias("mth"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.last_day("o_orderdate").alias("month_end"),
        (F.col("o_orderdate") + F.expr("interval 30 days")).alias("due_ts"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_cutoff"),
    )


# ---------------------------------------------------------------------------
# Behavioral analytics over the event stream (funnel, cohort, ntile)
# ---------------------------------------------------------------------------

@register(
    "funnel_signup_purchase",
    """
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'signup')   AS t_signup,
             min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id)
    SELECT count(*) FILTER (WHERE t_signup IS NOT NULL) AS n_signup,
           count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup) AS n_clicked,
           count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup
                              AND t_purchase > t_click) AS n_purchased
    FROM firsts
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered conversion funnel (signup → click → purchase): one
    groupBy computes each user's first-event times, then conditional
    counts — no self-joins, one shuffle total."""
    ev = _t(spark, sf_dir, "events")

    def first_of(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.when(signed, 1)).alias("n_signup"),
        F.count(F.when(clicked, 1)).alias("n_clicked"),
        F.count(F.when(purchased, 1)).alias("n_purchased"),
    )


@register(
    "cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort
      FROM events GROUP BY user_id)
    SELECT f.cohort,
           (date_diff('day', f.cohort, date_trunc('week', e.ts)) // 7)::INTEGER AS week_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort(spark, sf_dir):
    """Cohort retention: users grouped by first-seen week, activity
    counted per week offset.

    Scale shape: first_seen is one row PER USER — fact-proportional,
    not a dimension, so it must not broadcast. The shuffle join on
    user_id reuses the hash partitioning that the groupBy already
    produced on the first_seen side."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("WEEK", F.min("ts")).alias("cohort")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("WEEK", F.col("ts")), F.col("cohort"))
                / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "ntile_spend_quartiles",
    """
    SELECT quartile, count(*) AS n_customers,
           round(min(spend), 2) AS min_spend, round(max(spend), 2) AS max_spend
    FROM (SELECT o_custkey, sum(o_totalprice) AS spend,
                 ntile(4) OVER (ORDER BY sum(o_totalprice), o_custkey)::INTEGER AS quartile
          FROM orders GROUP BY o_custkey)
    GROUP BY quartile
    """,
)
def q_ntile(spark, sf_dir):
    """Quantile bucketing (ntile) for stratified sampling: customers
    into spend quartiles with per-bucket ranges.

    Scale shape: ``ntile(4) OVER (ORDER BY ...)`` as a partition-less
    Window funnels every customer through ONE task. ``global_ntile``
    (operators/ranking.py) keeps SQL-exact semantics but computes the
    bucket from a range-partitioned distributed row number — one range
    shuffle, no single-task stage."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    bucketed = global_ntile(
        spend, [F.col("spend"), F.col("o_custkey")], 4, name="quartile"
    )
    return (
        bucketed
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("spend"), 2).alias("min_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
        )
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term,
           round(tf * ln(n_docs / df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= 3
    """,
)
def q_tfidf(spark, sf_dir):
    """TF-IDF top-3 terms per document — term frequencies and document
    frequencies as two aggregations over one exploded token table, IDF
    broadcast back onto TF. The LLM-pipeline keyword-extraction
    primitive, fully relational."""
    docs = _t(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate (the sibling pattern in
    # unigram_logprob) — an eager docs.count() here would bake a full
    # extra corpus scan into PLAN CONSTRUCTION, firing a job even for
    # `query --explain`
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


# ---------------------------------------------------------------------------
# TPC-H-adapted decision-support suite (the synthetic schema lacks
# partsupp / commitdate / phone, so Q2/4/9/11/16/20-22 are adapted to the
# columns that exist while keeping each query's PLAN SHAPE: EXISTS /
# NOT EXISTS semi/anti joins, correlated scalar subqueries, HAVING
# against a global aggregate, disjunctive pushdown, two-level aggs).
# Money sums run on DECIMAL on both sides (see _DISC_PRICE_DEC note).
# ---------------------------------------------------------------------------

@register(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_q4(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a correlated non-equi condition →
    left-semi join (equi key + residual predicate), then count per
    priority. The date filter prunes orders before the join."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("interval 60 days")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_nation_trade_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate)::INTEGER AS l_year,
           round(sum({_DISC_PRICE_DEC}), 2)::DOUBLE AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
       OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
)
def q_q7(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    year. The nation filter is applied to BOTH dims before joining the
    facts, so supplier/customer shrink first — but a 2-of-25-nations
    slice is still a constant FRACTION of sf-scaled tables, so neither
    carries a broadcast hint; only the 25-row nation dim does. AQE
    promotes the filtered sides at runtime when they fit."""
    pair = ("NATION_3", "NATION_7")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        # the one fact-to-fact join: pin shuffled-HASH with orders as
        # the build side (r11, guide §3.1) — sort-merge sorted BOTH
        # fact streams to join on an equality a hash probe answers
        # directly; orders is the narrower side, per-partition builds
        # are bounded by shuffle.partitions (the deployment contract
        # j10's memory note documents), and AQE skew-split still
        # applies. The hint is consumed by THIS join; the dim joins
        # above/below stay broadcast (plan-pinned in
        # test_plan_quality).
        .join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_disc_price_dec()), 2).cast("double").alias("volume"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT year(l_shipdate)::INTEGER AS l_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_7' THEN {_DISC_PRICE_DEC}
                          ELSE 0::DECIMAL(12,2) END)::DOUBLE
                 / sum({_DISC_PRICE_DEC})::DOUBLE, 6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    GROUP BY 1
    """,
)
def q_q8(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's revenue per
    year. Region+part filters shrink the sides first, but customer /
    supplier / part are all sf-scaled, so none carries a broadcast
    hint (a region or p_type slice is a constant fraction — multi-GB
    at 100×); only frames derived purely from nation⋈region (≤25
    rows) are hinted. Both decimal sums convert to double only at the
    final ratio, so the boundary is engine-deterministic."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nat = _t(spark, sf_dir, "nation")
    cust_nat = nat.join(
        F.broadcast(region), nat.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem")
    disc = _disc_price_dec()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", disc).otherwise(
                        F.lit(0).cast("decimal(12,2)")
                    )
                ).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_profit_by_nation_year",
    f"""
    SELECT sn.n_name AS nation, year(l_shipdate)::INTEGER AS l_year,
           round(sum({_DISC_PRICE_DEC}
                     - p_retailprice::DECIMAL(12,2)
                       * (l_quantity * 0.5)::DECIMAL(8,1)), 2)::DOUBLE AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_q9(spark, sf_dir):
    """TPC-H Q9 shape: profit (revenue minus a cost proxy, all decimal
    so the sum is exact) per supplier nation and year, with a LIKE
    filter on part names. quantity*0.5 has exactly one decimal digit,
    so the double→decimal(8,1) cast is tie-free on both engines.
    part/supplier are sf-scaled, so their joins are unhinted shuffle
    joins (AQE promotes at runtime); only nation is hint-broadcast."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    nat = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cost = F.col("p_retailprice").cast("decimal(12,2)") * (
        F.col("l_quantity") * F.lit(0.5)
    ).cast("decimal(8,1)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.round(F.sum(_disc_price_dec() - cost), 2).cast("double").alias("profit")
        )
    )


@register(
    "q11_supplier_revenue_share",
    f"""
    WITH rev AS (SELECT l_suppkey, sum({_DISC_PRICE_DEC}) AS revenue
                 FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, round(revenue, 2)::DOUBLE AS revenue
    FROM rev
    WHERE revenue::DOUBLE > 0.011 * (SELECT sum({_DISC_PRICE_DEC})
                                     FROM lineitem)::DOUBLE
    """,
)
def q_q11(spark, sf_dir):
    """TPC-H Q11 shape: HAVING against a fraction of the GLOBAL
    aggregate — per-supplier revenue kept only above 1.1% of total.
    The scalar total is a 1-row broadcast cross join; both sums are
    exact decimals so the threshold comparison is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    disc = _disc_price_dec()
    rev = li.groupBy("l_suppkey").agg(F.sum(disc).alias("revenue"))
    total = li.agg(F.sum(disc).alias("__total"))
    return (
        rev.crossJoin(F.broadcast(total))
        .where(F.col("revenue").cast("double") > 0.011 * F.col("__total").cast("double"))
        .select("l_suppkey", F.round("revenue", 2).cast("double").alias("revenue"))
    )


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q_q13(spark, sf_dir):
    """TPC-H Q13: customer order-count histogram. Left join with an
    extra ON-clause predicate (kept in the join, NOT a where — rows
    must survive with count 0), then a second aggregation over the
    first's result."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (SELECT l_suppkey, sum({_DISC_PRICE_DEC}) AS total_rev
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1997-04-01'
                 GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_rev, 2)::DOUBLE AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q_q15(spark, sf_dir):
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue.
    The revenue CTE is computed once and reused for both the max scalar
    and the final join (decimal-exact equality). Scale shape: supplier
    is sf-scaled, so it gets NO hint — instead the max-filtered revenue
    frame (an aggregate filtered to its own max: a handful of rows,
    bounded regardless of SF) is the broadcast build side."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price_dec()).alias("total_rev"))
    max_rev = rev.agg(F.max("total_rev").alias("__max"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    best = rev.crossJoin(F.broadcast(max_rev)).where(
        F.col("total_rev") == F.col("__max")
    )
    return (
        supp.join(F.broadcast(best), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_rev", 2).cast("double").alias("total_rev"))
    )


@register(
    "q16_brand_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 5, 9, 13)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_q16(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part group with a
    NOT IN exclusion list → left-anti join (the excluded-key set is
    non-null, so anti-join ≡ NOT IN here). Scale shape: part and the
    acctbal-filtered supplier slice are both sf-scaled, so neither is
    hint-broadcast — AQE promotes them at runtime where they fit."""
    part = _t(spark, sf_dir, "part").where(F.col("p_size").isin(1, 5, 9, 13)).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO'
      AND l.l_quantity < (SELECT 0.4 * avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_q17(spark, sf_dir):
    """TPC-H Q17: revenue of small-quantity orders, correlated per-part
    average decorrelated into a join against the per-part aggregate.
    avg of integer-valued doubles is bit-identical across engines
    (exact sums below 2^53), so the 0.4*avg threshold is stable."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("__pk"))
        .where(F.col("l_quantity") < 0.4 * F.col("__avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT round(sum({_DISC_PRICE_DEC}), 2)::DOUBLE AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
    """,
)
def q_q19(spark, sf_dir):
    """TPC-H Q19: disjunction of conjunctive band predicates across
    both join sides. The brand/size disjunction is pre-applied to part
    (a valid implied filter Catalyst also derives) so only candidate
    parts reach the join; part is sf-scaled so the join is unhinted
    (AQE promotes the filtered side at runtime where it fits) and the
    full OR stays as the residual."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30))
    )
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(branch1 | branch2)
        .agg(F.round(F.sum(_disc_price_dec()), 2).cast("double").alias("revenue"))
    )


@register(
    "q22_idle_rich_customers",
    """
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal::DECIMAL(12,2)), 2)::DOUBLE AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q_q22(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders — uncorrelated scalar average (broadcast cross join) + NOT
    EXISTS (left-anti join on the filtered order keys), grouped by
    nation. (Every synthetic customer has ≥1 order, so the anti-join
    target is the urgent subset to keep the result non-trivial.)"""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    order_keys = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(order_keys, cust.c_custkey == order_keys.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT n_name, o_orderpriority,
           grouping(n_name)::INTEGER AS g_nation,
           grouping(o_orderpriority)::INTEGER AS g_prio,
           round(sum(o_totalprice::DECIMAL(12,2)), 2)::DOUBLE AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS (neither rollup nor cube): two independent
    one-dimension aggregates plus the grand total in ONE shuffle via
    Expand, not three scans. Runs through the engine's SQL surface —
    same Catalyst plan the DataFrame API would build."""
    from common_survey_data_pipeline_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, o_orderpriority,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        """
    )


@register(
    "w6_trailing_7d_revenue",
    """
    WITH daily AS (
      SELECT n_name, o_orderdate::DATE AS day,
             sum(o_totalprice::DECIMAL(12,2)) AS day_rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY 1, 2)
    SELECT n_name, day,
           round(sum(day_rev) OVER (
             PARTITION BY n_name ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2)::DOUBLE
             AS trailing_7d
    FROM daily
    """,
)
def q_w6_range_frame(spark, sf_dir):
    """Time-RANGE window frame (not ROWS): per-nation 7-day trailing
    revenue over the daily aggregate. The window partitions by nation,
    so the sort is per-nation, never a single global partition; the
    frame key is epoch seconds to express the interval range. Decimal
    sums keep the frame totals exact."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("day_rev"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "n_name",
        "day",
        F.round(F.sum("day_rev").over(w), 2).cast("double").alias("trailing_7d"),
    )


@register(
    "median_order_value",
    """
    SELECT o_orderpriority,
           round(median(o_totalprice), 2) AS med_price,
           round(avg(o_totalprice), 4) AS avg_price,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_median(spark, sf_dir):
    """Exact median per group (interpolating percentile, matching
    DuckDB's numeric median) alongside mean and count."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 2).alias("med_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "locf_gap_fill",
    """
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events)
    """,
)
def q_locf(spark, sf_dir):
    """Last-observation-carried-forward: error events' readings are
    treated as missing and filled from the user's previous valid
    reading (IGNORE NULLS running last_value) — the standard
    time-series sensor-repair primitive, one window, no self-join."""
    from common_survey_data_pipeline_spark.operators.timeseries import locf_fill

    ev = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    filled = locf_fill(
        ev, v, partition_cols=["user_id"], order_cols=["ts", "event_id"]
    )
    return filled.select("event_id", "user_id", "value_filled")


@register(
    "scd2_user_history",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS version
    FROM changes
    """,
)
def q_scd2(spark, sf_dir):
    """Type-2 slowly-changing-dimension build: compress each user's
    event-type sequence into versioned validity intervals
    (valid_from/valid_to, NULL while current) — the warehouse primitive
    behind point-in-time dimension snapshots and as-of feature joins.
    One shuffle on the user key; both windows share its sort
    (``operators/timeseries.py::scd2_compress``)."""
    from common_survey_data_pipeline_spark.operators.timeseries import (
        scd2_compress,
    )

    ev = _t(spark, sf_dir, "events")
    return scd2_compress(
        ev, key_col="user_id", attr_col="event_type",
        ts_col="ts", tiebreak_col="event_id",
    )


@register(
    "embedding_centroids",
    """
    SELECT label, i::INTEGER AS pos,
           round(sum(CAST(round_even(embedding[i]::DOUBLE
                                     * 1000000000000.0, 0) AS BIGINT))::DOUBLE
                 / count(*)::DOUBLE / 1000000000000.0, 6) + 0
             AS centroid_val
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY 1, 2
    """,
)
def q_embedding_centroids(spark, sf_dir):
    """Per-label centroid of the embedding vectors — the distributed
    vector-mean at the core of IVF/k-means training, expressed
    relationally (posexplode → groupBy(label, pos) → sum/count) so it
    scales to any vector count with one shuffle and stays JVM-side.

    HASH-STABLE BY CONSTRUCTION (round-5 guard-band finding: raw
    centroid means at sf0.1 sit 2.9e-10 from a rounding half-boundary,
    inside partial-aggregation float noise): each element is quantized
    to an INTEGER at 1e-12 (nearest-even: Spark `rint` ≡ DuckDB
    `round_even` ≡ IEEE roundTiesToEven, on the identical
    float32→double product), the per-group SUM is exact int64
    arithmetic (|q| ≤ 5.3e11, Σ over millions of rows still < 2⁶³),
    and the mean is one fixed double division sequence — so both
    engines produce bit-identical values regardless of partition
    order. The 1e-12 quantization is 10⁶× below the 6-decimal output
    round, so the contract value equals the float mean for every
    practical purpose. The group sum runs in decimal(38,0) — Spark's
    bare long sum wraps silently past 2⁶³ (≈1.6e7 unit-scale vectors
    per group at this quantization) while DuckDB's sum(BIGINT)
    promotes to HUGEINT; the decimal cast keeps both exact at any
    group size."""
    emb = _t(spark, sf_dir, "embeddings")
    q = F.expr(
        "CAST(CAST(rint(CAST(v AS DOUBLE) * 1000000000000.0) AS BIGINT)"
        " AS DECIMAL(20,0))"
    )
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(
            _roundz(
                F.sum(q).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1000000000000.0),
                6,
            ).alias("centroid_val")
        )
    )


@register(
    "embedding_norms",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> x::DOUBLE * x::DOUBLE))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q_embedding_norms(spark, sf_dir):
    """Per-vector L2 norm via higher-order functions — pure map-side
    expression (no explode, no shuffle), the normalization step every
    cosine-similarity pipeline runs first. Elements widen to double
    inside the fold so the sum is order-independent (F.aggregate folds
    left-to-right on both engines: bit-identical)."""
    emb = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id", F.round(F.sqrt(sq_sum), 6).alias("l2_norm")
    )


@register(
    "events_hypertable_rollup",
    """
    SELECT date_trunc('day', ts)::TIMESTAMP AS day_bucket,
           CASE WHEN grouping(date_trunc('hour', ts)) = 0
                THEN date_trunc('hour', ts)::TIMESTAMP END AS hour_bucket,
           grouping(date_trunc('hour', ts))::INTEGER + grouping(date_trunc('day', ts))::INTEGER AS lvl,
           count(*) AS n_events,
           round(sum(value::DECIMAL(10,2)), 2)::DOUBLE AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
)
def q_hypertable_rollup(spark, sf_dir):
    """Hypertable-style multi-resolution time rollup: hourly, daily,
    and grand-total aggregates of the event stream in ONE Expand-based
    shuffle (rollup over the truncation hierarchy), instead of three
    scans — the batch form of a continuous aggregate. lvl 0=hour,
    1=day, 2=total."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    b = ev.select(
        day.alias("day_bucket"),
        hour.alias("hour_bucket"),
        F.col("value").cast("decimal(10,2)").alias("v"),
    )
    return (
        b.rollup("day_bucket", "hour_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("total_value"),
            (
                F.grouping("hour_bucket").cast("int")
                + F.grouping("day_bucket").cast("int")
            ).alias("lvl"),
        )
        .select("day_bucket", "hour_bucket", "lvl", "n_events", "total_value")
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q_q21(spark, sf_dir):
    """TPC-H Q21 shape (adapted: 'late' = shipped >90 days after order
    date): lineitems of the ONLY late supplier in a multi-supplier
    order. The oracle keeps the correlated EXISTS/NOT-EXISTS form; the
    Spark plan decorrelates both subqueries into ONE pass of per-order
    aggregates — n_suppliers ≥ 2 ∧ n_late_suppliers = 1 — instead of
    two self-joins of the fact table (at scale: two shuffles on
    l_orderkey total, no O(rows²) correlation)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 90 days"))
        .select("l_orderkey", "l_suppkey")
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("__n_supp")
    )
    late_per_order = late.groupBy(F.col("l_orderkey").alias("__lk")).agg(
        F.countDistinct("l_suppkey").alias("__n_late")
    )
    qualifying = (
        per_order.where(F.col("__n_supp") >= 2)
        .join(late_per_order, F.col("__ok") == F.col("__lk"))
        .where(F.col("__n_late") == 1)
        .select("__ok")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(qualifying, late.l_orderkey == F.col("__ok"))
        .join(supp, late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q2_best_supplier_per_part",
    """
    WITH unit AS (SELECT l_partkey, l_suppkey,
                         min(l_extendedprice / l_quantity) AS best
                  FROM lineitem GROUP BY 1, 2)
    SELECT u.l_partkey, u.l_suppkey, u.best AS best_price
    FROM unit u
    WHERE u.best = (SELECT min(u2.best) FROM unit u2
                    WHERE u2.l_partkey = u.l_partkey)
    """,
)
def q_q2(spark, sf_dir):
    """TPC-H Q2 shape: the supplier(s) offering each part's minimum
    unit price — correlated per-part min decorrelated into a window
    min over the (part, supplier) aggregate: ONE extra shuffle on
    l_partkey, no join-back. Per-row double division is deterministic
    and min is order-independent, so the equality keeps ties
    identically on both engines. best_price ships un-rounded: the
    doubles are bit-identical across engines, while an explicit
    round(double, 4) would diverge on .xxxx5 ties (Spark rounds the
    shortest decimal repr, DuckDB the binary value)."""
    li = _t(spark, sf_dir, "lineitem")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("best")
    )
    w = Window.partitionBy("l_partkey")
    return (
        unit.withColumn("__best_all", F.min("best").over(w))
        .where(F.col("best") == F.col("__best_all"))
        .select("l_partkey", "l_suppkey", F.col("best").alias("best_price"))
    )


@register(
    "q20_dominant_suppliers",
    """
    WITH sp AS (SELECT l_partkey, l_suppkey, sum(l_quantity::BIGINT) AS qty
                FROM lineitem GROUP BY 1, 2),
         tot AS (SELECT l_partkey, sum(qty) AS total, count(*) AS n_supp
                 FROM sp GROUP BY 1)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT sp.l_suppkey FROM sp
                        JOIN tot ON sp.l_partkey = tot.l_partkey
                        WHERE sp.qty * tot.n_supp > 3 * tot.total)
    """,
)
def q_q20(spark, sf_dir):
    """TPC-H Q20 shape: suppliers shipping >3× a part's average
    per-supplier volume — nested aggregation (per part-supplier, then
    per part) feeding an IN-subquery → left-semi join. The share-vs-
    average form is scale-stable (an absolute majority threshold goes
    empty as supplier counts grow) and all-integer, so the comparison
    is exact."""
    li = _t(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )
    tot = sp.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("qty").alias("total"), F.count(F.lit(1)).alias("n_supp")
    )
    dominant = (
        sp.join(tot, sp.l_partkey == F.col("__pk"))
        .where(F.col("qty") * F.col("n_supp") > 3 * F.col("total"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return supp.join(
        dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Training-data corpus management (extension surface): source/language
# re-weighting, PII scrubbing, corpus shape profiling
# ---------------------------------------------------------------------------

@register(
    "corpus_mix_rebalance",
    """
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         quota AS (SELECT min(n) AS q FROM counts)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN counts c USING (lang)
    CROSS JOIN quota
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::UBIGINT
          / 4294967296.0 < q::DOUBLE / c.n
    """,
)
def q_corpus_mix(spark, sf_dir):
    """Language-rebalanced corpus: deterministically downsample each
    language to ~the smallest language's row count (per-lang keep
    fraction = min(n)/n, membership decided by an md5 hash of the doc
    id). This is the source/language re-weighting primitive of a
    training-data mixer: reproducible across engines, reruns and
    partitionings, one scan + one constant-size broadcast join.

    100 TB shape: the per-lang count frame is |distinct langs| rows —
    broadcast is bounded by vocabulary, not data size; the sample itself
    is a stateless filter in the scan stage (no shuffle of the corpus).
    """
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    quota = counts.agg(F.min("n").alias("q"))
    frac = counts.crossJoin(F.broadcast(quota)).select(
        "lang", (F.col("q").cast("double") / F.col("n")).alias("__keep")
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(frac), "lang")
        .where(u < F.col("__keep"))
        .select("doc_id", "lang", "source")
    )


_SQL_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_SQL_PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_SQL_PII_PHONE = "\\+\\d[\\d-]{7,}\\d"
_SQL_PII_DOC = (
    "text || ' user' || doc_id::VARCHAR || '@mail.example.com ip 10.0.' || "
    "(doc_id % 200)::VARCHAR || '.7 tel +1-555-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0')"
)


@register(
    "text_pii_redact",
    f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(raw,
               '{_SQL_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_SQL_PII_IP}', '<IP>', 'g'),
               '{_SQL_PII_PHONE}', '<PHONE>', 'g') AS redacted,
           (len(regexp_extract_all(raw, '{_SQL_PII_EMAIL}'))
            + len(regexp_extract_all(regexp_replace(raw, '{_SQL_PII_EMAIL}', ' ', 'g'),
                                     '{_SQL_PII_IP}'))
            + len(regexp_extract_all(
                  regexp_replace(regexp_replace(raw, '{_SQL_PII_EMAIL}', ' ', 'g'),
                                 '{_SQL_PII_IP}', ' ', 'g'),
                  '{_SQL_PII_PHONE}')))::BIGINT AS n_pii
    FROM (SELECT doc_id, {_SQL_PII_DOC} AS raw FROM documents)
    """,
)
def q_pii_redact(spark, sf_dir):
    """PII scrubbing over the document corpus: emails, IPv4 addresses and
    phone numbers replaced with typed tags, plus a per-doc span count.
    The synthetic corpus carries no PII, so the query first plants
    deterministic spans derived from ``doc_id`` (same construction in the
    oracle) and then proves the scrubber removes exactly those spans.

    All JVM-side ``regexp_replace``/``regexp_extract_all`` (patterns are
    restricted to the Java-regex ∩ RE2 common subset) — a pure map stage,
    no shuffle, safe to run inside the 100 TB ingest scan."""
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ip 10.0."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".7 tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id",
        T.redact_pii(raw).alias("redacted"),
        T.pii_count(raw).cast("long").alias("n_pii"),
    )


@register(
    "text_unigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    freqs AS (
      SELECT tok, count(*) AS tf, sum(count(*)) OVER () AS total
      FROM toks GROUP BY tok
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(sum(CAST(round_even(ln(f.tf / f.total) * 1000000000.0, 0)
                          AS BIGINT))::DOUBLE
                 / count(*)::DOUBLE / 1000000000.0, 4) + 0 AS avg_logprob
    FROM toks t JOIN freqs f USING (tok)
    GROUP BY t.doc_id
    """,
)
def q_unigram_logprob(spark, sf_dir):
    """Unigram LM scoring — the cheap perplexity proxy used to quality-
    filter pretraining corpora: score each document by the mean log
    corpus-frequency of its tokens (rare-token soup scores low, fluent
    common-word text scores high).

    Two aggregations over one exploded token frame: corpus term
    frequencies, then a token→frequency equi-join back and a per-doc
    mean. At 100 TB the frequency table is vocabulary-sized (≪ corpus);
    Spark's AQE broadcasts it at runtime, so the corpus shuffles once
    (the per-doc group-by), never on the join. The windowed total is a
    1-row aggregate, not a data-wide window.

    HASH-STABLE BY CONSTRUCTION (round-5 sf1 guard-band finding: with
    560k output docs the closest raw mean sits 2.3e-10 from a rounding
    half-boundary — a 50k-row output ALWAYS puts some value near a
    boundary, so per-doc float-averaging order must not matter): each
    token's log-probability is quantized to integer NANO-NATS
    (nearest-even `rint` ≡ `round_even` on the identical
    `log(tf/total)` double), the per-doc sum is exact int64, and the
    mean is one fixed double division sequence. The only residual
    cross-engine surface is libm log itself, whose last-ulp wobble
    lands on a rint boundary with probability ~1e-7 per distinct
    (tf, total) pair — and then moves one doc's mean by 1e-9/n, eight
    orders below the 4-decimal round.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    freqs = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    total = freqs.agg(F.sum("tf").alias("total"))
    scored = toks.join(freqs, "tok").crossJoin(F.broadcast(total))
    qnat = F.expr(
        "CAST(rint(ln(tf / total) * 1000000000.0) AS BIGINT)"
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        _roundz(
            F.sum(qnat).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000000.0),
            4,
        ).alias("avg_logprob"),
    )


@register(
    "embedding_quantize",
    """
    SELECT vec_id, scale,
           list_aggregate(codes, 'sum')::BIGINT AS sum_codes,
           list_aggregate(codes, 'min')::BIGINT AS min_code,
           list_aggregate(codes, 'max')::BIGINT AS max_code,
           len(codes)::BIGINT AS n_dims
    FROM (
      SELECT vec_id, scale,
             list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
                 ELSE floor(x::DOUBLE / scale + 0.5)::BIGINT END) AS codes
      FROM (SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                   / 127.0 AS scale
            FROM embeddings))
    """,
)
def q_embedding_quantize(spark, sf_dir):
    """Per-vector symmetric int8 quantization — the storage/bandwidth
    path for ANN at 100 TB (4× smaller than float32, SIMD-friendly
    integer dot products). code_i = floor(v_i/scale + 0.5) with
    scale = max|v|/127; ``floor(x+0.5)`` instead of ``round`` because
    round's half-tie direction differs across engines for negatives
    while floor is universal. All JVM higher-order functions on the
    embedding array — one scan, no shuffle, no UDF. The contract row is
    (scale, sum/min/max of codes, dims): engine-independent integers
    plus a double both engines derive identically from the float input.
    """
    emb = _t(spark, sf_dir, "embeddings")
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    scale = (absmax / F.lit(127.0)).alias("scale")
    with_scale = emb.select("vec_id", "embedding", scale)
    codes = F.transform(
        F.col("embedding"),
        lambda x: F.when(F.col("scale") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x.cast("double") / F.col("scale") + F.lit(0.5))
        ),
    )
    with_codes = with_scale.select("vec_id", "scale", codes.alias("codes"))
    return with_codes.select(
        "vec_id",
        "scale",
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("sum_codes"),
        F.array_min("codes").cast("long").alias("min_code"),
        F.array_max("codes").cast("long").alias("max_code"),
        F.size("codes").cast("long").alias("n_dims"),
    )


@register(
    "doc_pack_assignment",
    f"""
    SELECT doc_id, n_tokens,
           cum_tokens::BIGINT AS cum_tokens,
           ((cum_tokens - n_tokens) // 2048)::BIGINT AS pack_id
    FROM (SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_tokens
          FROM (SELECT doc_id, len({_SQL_TOKS})::BIGINT AS n_tokens
                FROM documents))
    """,
)
def q_doc_pack(spark, sf_dir):
    """Token-offset sequence packing: assign each document to the
    ~2048-token training shard its start offset falls in (pack_id =
    floor(tokens_before / budget) over the doc_id order). The global
    running token count comes from the distributed prefix-sum kernel
    (``operators/ranking.py::global_cumsum``) — one range shuffle, no
    partition-less Window, so the corpus never funnels through one task.
    """
    docs = _t(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    cum = global_cumsum(with_tok, ["doc_id"], "n_tokens", "cum_tokens")
    return cum.select(
        "doc_id",
        "n_tokens",
        "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 2048)
        .cast("long")
        .alias("pack_id"),
    )


@register(
    "doc_token_histogram",
    f"""
    SELECT floor(n_tokens / 8.0)::BIGINT AS bucket,
           count(*) AS n_docs,
           min(n_tokens)::BIGINT AS min_tokens,
           max(n_tokens)::BIGINT AS max_tokens,
           sum(n_chars)::BIGINT AS total_chars
    FROM (SELECT len({_SQL_TOKS})::BIGINT AS n_tokens, n_chars
          FROM documents)
    GROUP BY 1
    """,
)
def q_token_hist(spark, sf_dir):
    """Corpus shape profile: histogram of per-document token counts in
    fixed-width buckets — the length-distribution report every pretraining
    data pipeline runs before choosing sequence lengths / packing. One
    scan, map-side partial aggregation into |buckets| groups."""
    docs = _t(spark, sf_dir, "documents")
    tok = T.token_count(F.col("text")).cast("long")
    return (
        docs.select(tok.alias("n_tokens"), "n_chars")
        .groupBy(F.floor(F.col("n_tokens") / 8.0).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_SQL_ORDER_COLS = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
    "o_orderpriority"
)

# the synthetic change batch both CDC queries share: keys %97 get a 5%
# price bump (exact decimal arithmetic — see the money note at the top),
# keys %193 are re-inserted under key+100000000
_SQL_CDC_UPDATES = f"""
  SELECT o_orderkey, o_custkey, o_orderstatus,
         (o_totalprice::DECIMAL(12,2) * (1.05)::DECIMAL(4,2))::DOUBLE
           AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 193 = 0
"""


def _cdc_updates(orders):
    bumped = orders.where(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_totalprice",
        (
            F.col("o_totalprice").cast("decimal(12,2)")
            * F.lit(1.05).cast("decimal(4,2)")
        ).cast("double"),
    )
    inserted = orders.where(F.col("o_orderkey") % 193 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100000000)
    )
    return bumped.unionByName(inserted)


@register(
    "merge_upsert_orders",
    f"""
    WITH updates AS ({_SQL_CDC_UPDATES})
    SELECT {_SQL_ORDER_COLS} FROM updates
    UNION ALL
    SELECT {_SQL_ORDER_COLS} FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO (upsert) over the orders snapshot: a change batch of
    price updates and late-arriving inserts applied in one left-anti
    join + union (``operators/cdc.py::merge_upsert``) — no per-column
    coalesce over the untouched majority, one key shuffle that AQE
    turns into a broadcast when the batch is small."""
    orders = _t(spark, sf_dir, "orders")
    return merge_upsert(orders, _cdc_updates(orders), ["o_orderkey"])


@register(
    "cdc_snapshot_diff",
    f"""
    WITH updates AS ({_SQL_CDC_UPDATES}),
    new_snap AS (
      SELECT * FROM (
        SELECT {_SQL_ORDER_COLS} FROM updates
        UNION ALL
        SELECT {_SQL_ORDER_COLS} FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates))
      WHERE o_orderkey % 89 <> 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'I'
                WHEN n.o_orderkey IS NULL THEN 'D'
                WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  OR o.o_custkey IS DISTINCT FROM n.o_custkey
                  OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                THEN 'U' END AS op
    FROM orders o FULL OUTER JOIN new_snap n USING (o_orderkey)
    WHERE (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR o.o_custkey IS DISTINCT FROM n.o_custkey
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
    """,
)
def q_cdc_diff(spark, sf_dir):
    """Snapshot diff (CDC extract): compare the orders snapshot against
    its next version (upserts applied, %89 keys deleted) and emit one
    (key, op ∈ I/U/D) row per changed key — one full-outer key join
    with null-safe column comparison
    (``operators/cdc.py::snapshot_diff``)."""
    orders = _t(spark, sf_dir, "orders")
    new_snap = merge_upsert(orders, _cdc_updates(orders), ["o_orderkey"]).where(
        F.col("o_orderkey") % 89 != 0
    )
    return snapshot_diff(
        orders,
        new_snap,
        ["o_orderkey"],
        ["o_totalprice", "o_custkey", "o_orderstatus"],
    )


@register(
    "length_p99_outliers",
    f"""
    WITH t AS (
      SELECT doc_id, len({_SQL_TOKS})::BIGINT AS n_tokens FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id)::BIGINT AS tail_rank,
             count(*) OVER ()::BIGINT AS n_total
      FROM t
    )
    SELECT doc_id, n_tokens, tail_rank
    FROM r WHERE tail_rank > ceil(0.99 * n_total)
    """,
)
def q_length_outliers(spark, sf_dir):
    """EXACT global-quantile outlier filter: documents beyond the
    rank-based P99 token-count cut (rank > ceil(0.99·N) under the total
    order (n_tokens, doc_id)) — the length-cap step of corpus curation,
    computed exactly rather than with approx_percentile. The global
    rank comes from the distributed ranking kernel
    (``operators/ranking.py``), not a partition-less Window, and N is a
    1-row broadcast aggregate — so the exact quantile costs one range
    shuffle at any scale."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    ranked = global_row_number(t, ["n_tokens", "doc_id"], name="tail_rank")
    n = t.agg(F.count("*").alias("n_total"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .where(F.col("tail_rank") > F.ceil(F.lit(0.99) * F.col("n_total")))
        .select("doc_id", "n_tokens", F.col("tail_rank").cast("long").alias("tail_rank"))
    )


@register(
    "dedup_incremental",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    )
    SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
           round(len(list_intersect(b.shingles, c.shingles))::DOUBLE
                 / NULLIF(len(list_distinct(b.shingles || c.shingles)), 0),
                 6) AS jaccard_sim
    FROM sh b JOIN sh c
      ON (b.doc_id % 10 = 0) AND (c.doc_id % 10 <> 0)
    WHERE len(b.shingles) > 0 AND len(c.shingles) > 0
      AND round(len(list_intersect(b.shingles, c.shingles))::DOUBLE
                / NULLIF(len(list_distinct(b.shingles || c.shingles)), 0),
                6) >= 0.5
    """,
)
def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup — each incoming batch (doc_id % 10 == 0 stands
    in for the new shard) checked against the accepted corpus via
    two-sided banded MinHash-LSH
    (``operators/dedup.py::minhash_incremental_pairs``); oracled against
    the exact batch×corpus all-pairs Jaccard. Same recall argument as
    ``dedup_minhash`` (whose oracle equality over the SUPERSET of these
    pairs passes): every j≥0.5 pair in this corpus is found and
    exact-verified."""
    docs = _t(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return minhash_incremental_pairs(
        corpus, batch, "text", "doc_id", threshold=0.5
    )


@register(
    "doc_chunking",
    f"""
    SELECT doc_id,
           ((start - 1) // 24)::BIGINT AS chunk_idx,
           start::BIGINT AS chunk_start,
           len(chunk)::BIGINT AS n_chunk_tokens,
           array_to_string(chunk, ' ') AS chunk_text
    FROM (
      SELECT doc_id, start,
             list_slice(toks, start, least(start + 31, len(toks))) AS chunk
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
           unnest(generate_series(1, greatest(len(toks) - 8, 1), 24))
             AS t(start)
    )
    """,
)
def q_doc_chunking(spark, sf_dir):
    """Sequence chunking for training: split each document into
    32-token windows with stride 24 (8-token overlap) — the standard
    long-document → fixed-context-window preprocessing step. One
    explode over per-doc chunk starts; map-only otherwise, no shuffle
    at any scale."""
    docs = _t(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    with_toks = docs.select("doc_id", toks.alias("__toks"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__toks") - 8, F.lit(1)),
        F.lit(24),
    )
    chunked = with_toks.select(
        "doc_id",
        F.col("__toks"),
        F.explode(starts).alias("chunk_start"),
    ).select(
        "doc_id",
        F.floor((F.col("chunk_start") - 1) / 24).cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.slice(F.col("__toks"), F.col("chunk_start"), F.lit(32)).alias("__chunk"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.size("__chunk").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
    )


@register(
    "vocab_oov_rate",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS tf FROM toks GROUP BY tok
        ORDER BY tf DESC, tok LIMIT 16)
    ),
    per AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS in_vocab
      FROM toks t LEFT JOIN vocab v USING (tok)
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens::BIGINT AS n_tokens,
           round(1.0 - in_vocab / n_tokens::DOUBLE, 6) AS oov_rate
    FROM per
    """,
)
def q_vocab_oov(spark, sf_dir):
    """Tokenizer-vocabulary coverage: per-document out-of-vocabulary
    rate against the corpus's top-16 tokens (ties broken by token
    string — deterministic across engines). The vocabulary is a
    vocabulary-sized aggregate (≪ corpus) that AQE broadcasts; the
    corpus shuffles once for the per-doc group-by."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), "tok")
        .limit(16)
        .select("tok")
    )
    joined = toks.join(
        vocab.withColumn("__in", F.lit(1)), "tok", "left"
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.sum(F.coalesce(F.col("__in"), F.lit(0))) / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


@register(
    "text_normalize",
    """
    SELECT doc_id, norm_text, length(norm_text)::BIGINT AS n_chars_norm
    FROM (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents
    )
    """,
)
def q_text_normalize(spark, sf_dir):
    """Canonical text normalization for dedup/tokenizer pre-passes:
    lowercase, replace non-alphanumerics with spaces, collapse runs,
    trim. Pure JVM string expressions in one codegen stage — a map-only
    scan with no shuffle at any scale."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


@register(
    "epoch_shuffle",
    """
    WITH e AS (
      SELECT doc_id, epoch
      FROM documents, unnest([0, 1, 2]) AS t(epoch)
    ),
    k AS (
      SELECT doc_id, epoch,
             md5(epoch::VARCHAR || ':' || doc_id::VARCHAR) AS skey
      FROM e
    )
    SELECT doc_id, epoch::BIGINT AS epoch,
           row_number() OVER (ORDER BY epoch, skey, doc_id)::BIGINT
             AS shuffle_rank
    FROM k
    """,
)
def q_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training-order shuffle: each document's
    position in epoch e is its rank under md5(e:doc_id) — reproducible
    across runs and cluster sizes, different every epoch, no RNG state.
    The global order comes from the distributed ranking kernel
    (``operators/ranking.py::global_row_number``: range partition +
    local ranks + offsets), NOT a partition-less Window — at 100 TB the
    corpus never funnels through one task, which is exactly what a
    naive row_number() OVER (ORDER BY ...) would do."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    e = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in (0, 1, 2)])).alias("epoch"),
    )
    keyed = e.select(
        "doc_id",
        F.col("epoch").cast("long").alias("epoch"),
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("skey"),
    )
    ranked = global_row_number(
        keyed, ["epoch", "skey", "doc_id"], name="shuffle_rank"
    )
    return ranked.select(
        "doc_id", "epoch", F.col("shuffle_rank").cast("long").alias("shuffle_rank")
    )


_SQL_ZTERMS = " + ".join(
    f"(((cust_b >> {j}) & 1) * {1 << (2 * j)}) + "
    f"(((day_b >> {j}) & 1) * {1 << (2 * j + 1)})"
    for j in range(16)
)


@register(
    "zorder_layout_stats",
    f"""
    WITH raw AS (
      SELECT o_custkey AS cust,
             date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS day
      FROM orders
    ),
    bounds AS (
      SELECT min(cust) AS cmn, max(cust) AS cmx,
             min(day) AS dmn, max(day) AS dmx
      FROM raw
    ),
    proj AS (
      -- scale each dim to the full 16-bit range; all-integer arithmetic
      -- (// is floor division, identical to Spark's `div` on
      -- non-negative values) so both engines agree bit-for-bit
      SELECT ((cust - cmn) * 65535) // greatest(cmx - cmn, 1) AS cust_b,
             ((day - dmn) * 65535) // greatest(dmx - dmn, 1) AS day_b
      FROM raw, bounds
    ),
    z AS (SELECT cust_b, day_b, ({_SQL_ZTERMS}) AS zval FROM proj)
    SELECT (zval >> 26)::BIGINT AS z_bucket, count(*) AS n_rows,
           min(cust_b)::BIGINT AS min_cust_b, max(cust_b)::BIGINT AS max_cust_b,
           min(day_b)::BIGINT AS min_day_b, max(day_b)::BIGINT AS max_day_b
    FROM z GROUP BY 1
    """,
)
def q_zorder(spark, sf_dir):
    """Z-order (Morton) layout report over orders: min/max-normalize
    (customer, order-day) to 16 bits each, interleave into one Z-value,
    group rows by the file-sized Z-prefix an ordered write would
    produce, and report each bucket's per-dimension min/max spread — the
    multi-column data-skipping quality a ``ZORDER BY`` rewrite of a
    100 TB table would deliver. The Z-value is a flat codegen'd integer
    expression (no shuffle, no UDF); the bounds are a 1-row broadcast
    aggregate; the report is one aggregation into 64 groups
    (``operators/layout.py``)."""
    orders = _t(spark, sf_dir, "orders")
    raw = orders.select(
        F.col("o_custkey").alias("cust"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    bounds = raw.agg(
        F.min("cust").alias("cmn"),
        F.max("cust").alias("cmx"),
        F.min("day").alias("dmn"),
        F.max("day").alias("dmx"),
    )
    scaled = raw.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            "((cust - cmn) * 65535) div greatest(cmx - cmn, 1)"
        ).alias("cust_b"),
        F.expr("((day - dmn) * 65535) div greatest(dmx - dmn, 1)").alias(
            "day_b"
        ),
    )
    return zorder_bucket_stats(scaled, ["cust_b", "day_b"], bits=16, bucket_bits=6)


def _sql_word_grams(n: int, distinct: bool = True) -> str:
    """DuckDB expression for word n-grams of a ``toks`` list column —
    the SQL twin of ``functions.text.word_shingles`` (distinct=True) /
    ``word_ngrams`` (distinct=False)."""
    idx = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    lst = f"[{idx} for i in range(1, len(toks) - {n} + 2)]"
    if distinct:
        lst = f"list_distinct({lst})"
    return f"CASE WHEN len(toks) < {n} THEN [] ELSE {lst} END"


@register(
    "decontaminate_ngrams",
    f"""
    WITH g AS (
      SELECT doc_id, unnest({_sql_word_grams(4)}) AS gram
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
    tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 37 <> 0)
    SELECT doc_id, count(*) AS n_contaminated_grams
    FROM tr JOIN ev USING (gram)
    GROUP BY doc_id
    """,
)
def q_decontaminate(spark, sf_dir):
    """Train/eval n-gram decontamination (the GPT-3-style overlap
    check): flag every training document sharing a word 4-gram with the
    held-out split (doc_id % 37 == 0 stands in for the benchmark set).

    Explode-join-group via ``operators/decontam.py::ngram_decontaminate``
    — the eval side reduces to its distinct gram vocabulary (benchmark
    suites are tiny next to a 100 TB corpus), AQE broadcasts it, and the
    corpus shuffles once on the per-doc group-by. No all-pairs stage.
    """
    docs = _t(spark, sf_dir, "documents")
    eval_set = docs.where(F.col("doc_id") % 37 == 0)
    train = docs.where(F.col("doc_id") % 37 != 0)
    return ngram_decontaminate(train, eval_set, "text", "doc_id", n=4)


_DECONTAM_CAT4 = " || ' ' || ".join(f"toks[pos+{j}]" for j in range(4))


@register(
    "decontaminate_spans_clean",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
               WHERE doc_id % 37 <> 0),
    g AS (SELECT doc_id, pos, {_DECONTAM_CAT4} AS gram
          FROM t, unnest(generate_series(1, len(toks) - 3)) AS u(pos)),
    ev AS (SELECT DISTINCT gram FROM (
             SELECT {_DECONTAM_CAT4} AS gram
             FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
                   WHERE doc_id % 37 = 0),
                  unnest(generate_series(1, len(toks) - 3)) AS u(pos))),
    hits AS (SELECT doc_id, pos FROM g JOIN ev USING (gram)),
    cut AS (SELECT DISTINCT doc_id, pos + off AS tpos
            FROM hits, unnest(generate_series(0, 3)) AS o(off)),
    tok AS (SELECT doc_id, tpos, toks[tpos] AS token
            FROM t, unnest(generate_series(1, len(toks))) AS u(tpos)),
    kept AS (
      SELECT tok.doc_id, tok.tpos, tok.token
      FROM tok ANTI JOIN cut
        ON tok.doc_id = cut.doc_id AND tok.tpos = cut.tpos
    )
    SELECT t.doc_id,
           len(t.toks)::BIGINT AS n_tokens,
           (len(t.toks) - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
           coalesce(k.cleaned, '') AS cleaned_text
    FROM t LEFT JOIN (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(token, ' ' ORDER BY tpos) AS cleaned
      FROM kept GROUP BY doc_id
    ) k USING (doc_id)
    """,
)
def q_decontaminate_spans_clean(spark, sf_dir):
    """SURGICAL train/eval decontamination: cut ONLY the tokens
    covered by a word 4-gram shared with the held-out split and
    re-emit the cleaned text — the modern alternative to
    ``decontaminate_ngrams``'s drop-the-whole-document policy (one
    quoted benchmark sentence should cost a sentence, not a document).
    Uncontaminated docs round-trip with ``n_removed = 0``.

    ``operators/decontam.py::decontaminate_spans`` — the substring-
    dedup positional gram stage joined against the eval set's distinct
    gram vocabulary (tiny, AQE-broadcast), then the shared
    cut-and-rebuild (``dedup.cut_spans_rebuild``). Oracle: the
    identical cut algebra in DuckDB."""
    from common_survey_data_pipeline_spark.operators.decontam import (
        decontaminate_spans,
    )

    # the train side's positional gram stage is the same 1-task-leaf
    # compute as substring_dup_spans — floor it (no-op on real corpora)
    docs = parallelism_floor(_t(spark, sf_dir, "documents"))
    eval_set = docs.where(F.col("doc_id") % 37 == 0)
    train = docs.where(F.col("doc_id") % 37 != 0)
    return decontaminate_spans(train, eval_set, "text", "doc_id", n=4)


@register(
    "text_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    base AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t),
    g2 AS (
      SELECT doc_id, gram, count(*) AS cnt
      FROM (SELECT doc_id, unnest({_sql_word_grams(2, distinct=False)}) AS gram
            FROM t)
      GROUP BY doc_id, gram
    ),
    top2 AS (SELECT doc_id, max(cnt) AS top2_cnt FROM g2 GROUP BY doc_id),
    g3 AS (
      SELECT doc_id, gram, count(*) AS cnt
      FROM (SELECT doc_id, unnest({_sql_word_grams(3, distinct=False)}) AS gram
            FROM t)
      GROUP BY doc_id, gram
    ),
    dup3 AS (SELECT doc_id, sum(cnt - 1) AS dup3_extra FROM g3 GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens,
           coalesce(top2_cnt, 0)::BIGINT AS top2_cnt,
           round(2.0 * coalesce(top2_cnt, 0) / n_tokens, 6) AS top2_frac,
           round(3.0 * coalesce(dup3_extra, 0) / n_tokens, 6) AS dup3_frac
    FROM base b
    LEFT JOIN top2 USING (doc_id)
    LEFT JOIN dup3 USING (doc_id)
    WHERE n_tokens > 0
    """,
)
def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters: per-document fraction of
    tokens covered by the most frequent 2-gram and fraction of tokens in
    repeated 3-gram occurrences. Rounding to 6 decimals is cross-engine
    safe here: the fractions are rationals with denominator ≤ max doc
    tokens (< 128 = 2^7), so no exact decimal tie at the 7th digit
    exists (see the money-rounding note at the top of this module).

    ``operators/decontam.py::repetition_metrics`` — explode + two
    keyed aggregations; per-doc state bounded by document length.
    """
    docs = _t(spark, sf_dir, "documents")
    return repetition_metrics(docs, "text", "doc_id")


@register(
    "corpus_boilerplate",
    f"""
    WITH g AS (
      SELECT doc_id, unnest({_sql_word_grams(5)}) AS gram
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    )
    SELECT gram, count(*) AS n_docs, min(doc_id) AS first_doc
    FROM g GROUP BY gram HAVING count(*) >= 2
    """,
)
def q_corpus_boilerplate(spark, sf_dir):
    """Corpus-level boilerplate report: word 5-gram spans appearing
    verbatim in ≥2 distinct documents (license headers, templated
    chrome). One explode + one gram-keyed count with map-side partials —
    hot boilerplate keys are absorbed before the shuffle.
    ``operators/decontam.py::boilerplate_spans``."""
    docs = _t(spark, sf_dir, "documents")
    return boilerplate_spans(docs, "text", "doc_id", n=5, min_docs=2)


@register(
    "crossdoc_dup_rate",
    f"""
    WITH g AS (
      SELECT doc_id, unnest({_sql_word_grams(8)}) AS gram
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    ),
    f AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY gram)
    SELECT doc_id, count(*) AS n_grams,
           sum((n_docs >= 2)::BIGINT)::BIGINT AS n_shared,
           round(sum((n_docs >= 2)::BIGINT) / count(*), 6) AS dup_share
    FROM g JOIN f USING (gram)
    GROUP BY doc_id
    """,
)
def q_crossdoc_dup(spark, sf_dir):
    """Per-document cross-corpus duplication rate (Lee et al.): the
    fraction of each doc's distinct word 8-grams that appear verbatim in
    ≥1 other document — the metric view of near-duplication, usable as a
    standalone quality filter where MinHash pair mining (dedup_minhash)
    is the removal view. Rounding to 6 is exact: the denominator is the
    per-doc distinct-gram count (< 128 = 2^7), so no decimal tie at the
    7th digit exists (see the money-rounding note at module top).

    ``operators/decontam.py::crossdoc_duplication`` — two linear
    shuffles (gram-keyed frequency with map-side partials, then
    doc-keyed rollup); no all-pairs stage.
    """
    docs = _t(spark, sf_dir, "documents")
    return crossdoc_duplication(docs, "text", "doc_id", n=8)


_SQL_SQDIST = (
    "list_sum(list_transform(generate_series(1, len(e.embedding)),"
    " i -> (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)"
    " * (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)))"
)


@register(
    "embedding_kmeans_sizes",
    f"""
    WITH c AS (
      SELECT vec_id AS cluster_id, embedding AS cvec
      FROM embeddings WHERE vec_id < 8
    ),
    d AS (
      SELECT e.vec_id, c.cluster_id, {_SQL_SQDIST} AS sq
      FROM embeddings e CROSS JOIN c
    ),
    a AS (
      SELECT vec_id, cluster_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sq, cluster_id) AS rn
      FROM d
    )
    SELECT cluster_id::INT AS cluster_id, count(*) AS n_vecs,
           min(vec_id) AS min_vec, max(vec_id) AS max_vec
    FROM a WHERE rn = 1
    GROUP BY 1
    """,
)
def q_kmeans_sizes(spark, sf_dir):
    """K-means assignment census: assign every embedding to its nearest
    of k=8 deterministic centroids (the vectors with vec_id < 8) by
    squared-L2, ties to the smallest centroid id, and report cluster
    sizes — the corpus-diversification primitive (cluster then sample
    per cluster to balance topics).

    Scale shape (``operators/clustering.py::assign_clusters``): the
    centroids are baked into a closed-form JVM expression — the
    assignment is a NARROW map with zero shuffles and no crossJoin row
    explosion; the census is one 8-group aggregation with map-side
    partials. Element arithmetic is double with a sequential sum, so the
    DuckDB oracle's ``list_sum(list_transform(...))`` is bit-identical
    and argmin ties break the same way on both engines.
    """
    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(
            (F.col("vec_id") < 8) & F.col("embedding").isNotNull()
        ).collect()
    ]
    if not centroids:  # empty table: typed empty census
        return spark.createDataFrame(
            [], "cluster_id int, n_vecs long, min_vec long, max_vec long"
        )
    return (
        assign_clusters(emb, centroids)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vec_id").alias("min_vec"),
            F.max("vec_id").alias("max_vec"),
        )
    )


@register(
    "embedding_dim_stats",
    """
    WITH q AS (
      SELECT i,
             CAST(round_even(e.embedding[i]::DOUBLE * 1000000000000.0, 0)
                  AS BIGINT) AS qv,
             e.embedding[i]::DOUBLE AS v
      FROM embeddings e,
           unnest(generate_series(1, len(e.embedding))) AS t(i)
    ),
    s AS (
      SELECT i, count(*) AS n,
             sum(CAST(qv AS DECIMAL(20,0))) AS sq,
             sum(CAST(qv AS DECIMAL(19,0)) * CAST(qv AS DECIMAL(19,0)))
               AS sq2,
             min(v) AS min_v, max(v) AS max_v
      FROM q GROUP BY i
    )
    SELECT i::INT AS dim,
           round(sq::DOUBLE / n::DOUBLE / 1000000000000.0, 6) + 0 AS mean_v,
           round(sqrt((n::DOUBLE * sq2::DOUBLE - sq::DOUBLE * sq::DOUBLE)
                      / (n::DOUBLE * (n::DOUBLE - 1.0)))
                 / 1000000000000.0, 6) AS sd_v,
           min_v, max_v
    FROM s
    """,
)
def q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension distribution report over the embedding column
    (mean/sd/min/max for each of the 64 dims) — the drift/health check a
    production embedding pipeline runs per batch (dead dims, scale
    drift, clipped values). ``posexplode`` fans each vector into (dim,
    value) pairs JVM-side, then one 64-group aggregation with map-side
    partials; min/max are exact float comparisons, mean/sd rounded to 6.

    HASH-STABLE BY CONSTRUCTION (round-5 sf1 guard-band measurement:
    the raw means sat 1.3e-8 from a rounding half-boundary — 13× the
    band, one scale step from a coin flip): elements quantize to
    integers at 1e-12 (nearest-even rint ≡ round_even on the identical
    double), Σq and Σq² run exact in decimal, and mean/sd are a fixed
    double op sequence — sd via IEEE-754 `sqrt`, which is CORRECTLY
    ROUNDED by spec, so identical exact sums give an identical sd on
    both engines. min/max stay raw float comparisons (no rounding, no
    arithmetic — representation-safe as-is)."""
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode("embedding").alias("pos", "val")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("val").cast("double").alias("v"),
        F.expr(
            "CAST(rint(CAST(val AS DOUBLE) * 1000000000000.0) AS BIGINT)"
        ).alias("qv"),
    )
    s = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qv").cast("decimal(20,0)")).alias("sq"),
        F.sum(
            F.col("qv").cast("decimal(19,0)")
            * F.col("qv").cast("decimal(19,0)")
        ).alias("sq2"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    n = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sq2 = F.col("sq2").cast("double")
    return s.select(
        "dim",
        _roundz(sq / n / F.lit(1e12), 6).alias("mean_v"),
        F.round(
            F.sqrt((n * sq2 - sq * sq) / (n * (n - F.lit(1.0))))
            / F.lit(1e12),
            6,
        ).alias("sd_v"),
        "min_v",
        "max_v",
    )


@register(
    "j11_attribution_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           count(c.event_id) AS n_prior_clicks
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def q_attribution(spark, sf_dir):
    """Marketing attribution: for every purchase, the count of clicks by
    the same user in the preceding hour (window ``[p_ts - 1h, p_ts)``),
    zero-click purchases included.

    ``streaming/events.py::attribution_join`` — the SAME operator runs
    as a real stream-stream join under Structured Streaming (watermarks
    bound click state; see tests/test_streaming.py). Batch plan: ONE
    left-outer join of both sides on user_id (the equi key, range
    predicate applied in-stage) then one purchase-keyed count —
    ``count(click_id)`` ignores the NULLs of zero-click purchases, so
    no join-back stage exists.
    """
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    pairs = attribution_join(
        purchases, clicks, window="1 hour", how="left_outer"
    )
    return pairs.groupBy("purchase_id", "user_id").agg(
        F.count("click_id").cast("long").alias("n_prior_clicks")
    )


@register(
    "a7_multi_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_multi_distinct(spark, sf_dir):
    """Several COUNT(DISTINCT ...) over different columns in ONE
    aggregation — Spark rewrites this with an Expand node (one replicated
    stream per distinct column) feeding a single shuffle, instead of N
    self-joined single-distinct aggregates. The cardinality-profile
    query every pipeline runs before choosing join strategies."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "skew_report",
    """
    WITH k AS (
      SELECT l_partkey AS key, count(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    t AS (SELECT sum(n_rows)::DOUBLE AS total, avg(n_rows) AS avg_n FROM k)
    SELECT row_number() OVER (ORDER BY n_rows DESC, key) AS rank,
           key, n_rows,
           round(n_rows / total, 6) AS share,
           round(n_rows / avg_n, 2) AS skew_x
    FROM k, t
    ORDER BY n_rows DESC, key LIMIT 20
    """,
)
def q_skew_report(spark, sf_dir):
    """Join-key skew diagnostics: the 20 heaviest l_partkey values with
    their corpus share and skew factor (count / mean count per key) —
    the report that decides whether a join needs `j8`-style salting or
    AQE skew handling before it runs at 100 TB.

    One key-keyed count with map-side partials (hot keys absorbed
    pre-shuffle), a 1-row global aggregate broadcast back, and a
    TakeOrderedAndProject top-20 — no global sort.
    """
    li = _t(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    t = k.agg(
        F.sum("n_rows").cast("double").alias("total"),
        F.avg("n_rows").alias("avg_n"),
    )
    top = (
        k.crossJoin(F.broadcast(t))
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(20)
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return top.select(
        F.row_number().over(w).alias("rank"),
        "key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("total"), 6).alias("share"),
        F.round(F.col("n_rows") / F.col("avg_n"), 2).alias("skew_x"),
    )


@register(
    "quality_weighted_sample",
    f"""
    WITH q AS (SELECT doc_id, {_SQL_QUALITY_EXPR} AS quality FROM documents)
    SELECT doc_id, quality
    FROM q
    WHERE ((doc_id::HUGEINT * 2654435761) % 4294967296) / 4294967296.0
          < quality * quality
    """,
)
def q_quality_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus sampling (the CCNet/RedPajama-style
    upsample-good-text step): keep each document with probability
    ``quality²`` (temperature=2 sharpening), decided by a DETERMINISTIC
    per-doc uniform — the Knuth multiplicative hash
    ``(doc_id · 2654435761) mod 2³² / 2³²`` — so the sample is
    reproducible across engines, partitionings and reruns (unlike
    ``rand()``-based sampling). Narrow map, zero shuffles; the integer
    hash and the squared weight are exact on both engines, so the
    kept-set is bit-identical.
    """
    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("quality")
    )
    # WIDE multiply (round-6 sf1 finding): amplified doc_ids reach
    # ~4e10, and doc_id * 2654435761 then exceeds int64 — ANSI Spark
    # throws ARITHMETIC_OVERFLOW (non-ANSI would silently wrap, worse).
    # decimal(20,0) on the Spark side ≡ HUGEINT in the oracle: exact
    # integer product/mod at any id scale, identical uniform.
    u = (
        (F.col("doc_id").cast("decimal(20,0)") * F.lit(2654435761))
        % F.lit(4294967296)
    ).cast("double") / F.lit(4294967296.0)
    return q.where(u < F.col("quality") * F.col("quality"))


@register(
    "collection_functions",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             list_sort(list_distinct(list(l_partkey))) AS parts
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(parts)::INT AS n_parts,
           array_to_string(parts[1:3], ',') AS first3,
           list_min(parts) AS min_part,
           list_max(parts) AS max_part,
           list_sum(list_transform(parts, x -> x % 10))::BIGINT AS mod_sum
    FROM per_order
    """,
)
def q_collection_functions(spark, sf_dir):
    """Collection-function breadth on an array column built per order:
    collect_set → sort_array → size / slice+array_join / array_min /
    array_max / transform+aggregate. All JVM higher-order functions —
    the array never leaves Tungsten rows, and the only shuffle is the
    orderkey group-by."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    return per_order.select(
        "l_orderkey",
        F.size("parts").alias("n_parts"),
        F.array_join(F.slice("parts", 1, 3), ",").alias("first3"),
        F.array_min("parts").alias("min_part"),
        F.array_max("parts").alias("max_part"),
        F.aggregate(
            F.transform("parts", lambda x: x % 10),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("mod_sum"),
    )


@register(
    "a8_approx_quantile_contract",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
           (abs(approx_quantile(o_totalprice, 0.5)
                / quantile_cont(o_totalprice, 0.5) - 1) < 0.02) AS approx_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_a8(spark, sf_dir):
    """Approximate-quantile sketch contract, the `a6` trick applied to
    percentiles: sketch internals differ per engine (Spark
    Greenwald-Khanna at accuracy=10000, DuckDB t-digest), so the
    hash-compared contract is the exact median plus each engine's own
    boolean that its sketch lands within 2% of it. At 100 TB the sketch
    column is the one you keep — single pass, fixed memory — and this
    contract is the regression test that keeps it honest."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("exact_p50"),
        (
            F.abs(
                F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
                / F.expr("percentile(o_totalprice, 0.5)")
                - 1
            )
            < 0.02
        ).alias("approx_ok"),
    )


@register(
    "profile_orders",
    """
    SELECT 'o_custkey' AS column_name,
           sum((o_custkey IS NULL)::BIGINT)::BIGINT AS n_nulls,
           count(DISTINCT o_custkey) AS n_distinct,
           min(o_custkey)::VARCHAR AS min_s,
           max(o_custkey)::VARCHAR AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', sum((o_orderstatus IS NULL)::BIGINT)::BIGINT,
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', sum((o_totalprice IS NULL)::BIGINT)::BIGINT,
           count(DISTINCT o_totalprice),
           min(o_totalprice::DECIMAL(14,2))::VARCHAR,
           max(o_totalprice::DECIMAL(14,2))::VARCHAR
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', sum((o_orderdate IS NULL)::BIGINT)::BIGINT,
           count(DISTINCT o_orderdate),
           min(o_orderdate::DATE)::VARCHAR, max(o_orderdate::DATE)::VARCHAR
    FROM orders
    """,
)
def q_profile_orders(spark, sf_dir):
    """One-pass column profiler (the Deequ/Glue-profiler shape): null
    count, distinct count, min and max for a column set, emitted as one
    row per column. All four column profiles compute in a SINGLE scan +
    aggregation (per-column aggregates side by side, then an in-memory
    unpivot of the 1-row frame) — never one job per column. Min/max are
    normalized to strings via DECIMAL/DATE casts so both engines format
    identically."""
    orders = _t(spark, sf_dir, "orders")
    row = orders.agg(
        *[
            a
            for c, mn, mx in (
                (
                    "o_custkey",
                    F.min("o_custkey").cast("string"),
                    F.max("o_custkey").cast("string"),
                ),
                (
                    "o_orderstatus",
                    F.min("o_orderstatus"),
                    F.max("o_orderstatus"),
                ),
                (
                    "o_totalprice",
                    F.min(F.col("o_totalprice").cast("decimal(14,2)")).cast(
                        "string"
                    ),
                    F.max(F.col("o_totalprice").cast("decimal(14,2)")).cast(
                        "string"
                    ),
                ),
                (
                    "o_orderdate",
                    F.min(F.col("o_orderdate").cast("date")).cast("string"),
                    F.max(F.col("o_orderdate").cast("date")).cast("string"),
                ),
            )
            for a in (
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
                F.countDistinct(c).alias(f"{c}__distinct"),
                mn.alias(f"{c}__min"),
                mx.alias(f"{c}__max"),
            )
        ]
    )
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    stacked = row.selectExpr(
        "stack({n}, {args}) AS (column_name, n_nulls, n_distinct, min_s, max_s)".format(
            n=len(cols),
            args=", ".join(
                f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
                for c in cols
            ),
        )
    )
    return stacked


@register(
    "dq_checks",
    """
    SELECT 'orders_pk_dup' AS check_name,
           coalesce(sum(n - 1), 0)::BIGINT AS n_bad
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'lineitem_fk_orphan', count(*)::BIGINT
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'customer_null_name', sum((c_name IS NULL)::BIGINT)::BIGINT
    FROM customer
    UNION ALL
    SELECT 'lineitem_nonpos_qty', sum((l_quantity <= 0)::BIGINT)::BIGINT
    FROM lineitem
    """,
)
def q_dq_checks(spark, sf_dir):
    """Data-quality assertion suite (the Deequ-style pre-flight a
    pipeline runs before publishing a table): primary-key uniqueness on
    orders, referential integrity lineitem→orders (anti-join orphan
    count), null-rate and domain checks — one row per check, n_bad == 0
    everywhere on healthy data. The FK check is the only shuffle (a
    LeftAnti join on the key); the rest are map-side conditional sums.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    pk_dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("long")
            .alias("n_bad")
        )
        .select(F.lit("orders_pk_dup").alias("check_name"), "n_bad")
    )
    orphans = (
        anti_join(li, orders, "l_orderkey", "o_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bad"))
        .select(F.lit("lineitem_fk_orphan").alias("check_name"), "n_bad")
    )
    null_name = cust.agg(
        F.sum(F.col("c_name").isNull().cast("long")).cast("long").alias("n_bad")
    ).select(F.lit("customer_null_name").alias("check_name"), "n_bad")
    nonpos = li.agg(
        F.sum((F.col("l_quantity") <= 0).cast("long")).cast("long").alias("n_bad")
    ).select(F.lit("lineitem_nonpos_qty").alias("check_name"), "n_bad")
    return pk_dup.unionByName(orphans).unionByName(null_name).unionByName(nonpos)


@register(
    "value_histogram",
    """
    SELECT floor(value / 10.0)::BIGINT AS bin, count(*) AS n,
           round(avg(value), 4) AS avg_v
    FROM events
    GROUP BY 1
    """,
)
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of the event value distribution (bin width
    10) — the profiling primitive behind skew/outlier dashboards. A
    single map-side-partial aggregation into a few dozen bins; at
    100 TB the network moves one row per bin per partition."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 10.0).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_v"),
    )


@register(
    "copurchase_pairs",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b LIMIT 20
    """,
)
def q_copurchase(spark, sf_dir):
    """Market-basket co-occurrence: the 20 part pairs most often bought
    in the same order (ties broken by the pair keys). Bipartite
    two-hop: dedup (order, part), self equi-join on the ORDER key —
    fanout per order is that order's item count squared, bounded by
    basket size (~7), never corpus size — then a pair-keyed count with
    map-side partials and a TakeOrderedAndProject top-20. The plan
    survives 100 TB because both shuffles key on bounded-fanout ids;
    the classic hot-basket skew case (one order with 10⁶ items) is the
    `j8` salting territory, not this query's."""
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "pagerank_parts_2iter",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src AS node, count(*) AS d FROM pairs GROUP BY 1),
    n AS (SELECT count(*)::DOUBLE AS n_nodes FROM deg),
    r0 AS (SELECT node, 1.0 / n_nodes AS r FROM deg, n),
    r1 AS (
      SELECT p.dst AS node,
             0.15 / any_value(n.n_nodes) + 0.85 * sum(r0.r / deg.d) AS r
      FROM pairs p
      JOIN r0  ON r0.node = p.src
      JOIN deg ON deg.node = p.src
      CROSS JOIN n
      GROUP BY p.dst
    ),
    r2 AS (
      SELECT p.dst AS node,
             0.15 / any_value(n.n_nodes) + 0.85 * sum(r1.r / deg.d) AS r
      FROM pairs p
      JOIN r1  ON r1.node = p.src
      JOIN deg ON deg.node = p.src
      CROSS JOIN n
      GROUP BY p.dst
    )
    SELECT node, round(r, 9) AS pagerank
    FROM r2
    ORDER BY round(r, 9) DESC, node LIMIT 20
    """,
)
def q_pagerank(spark, sf_dir):
    """Two power iterations of PageRank (damping 0.85) over the
    co-purchase part graph — the link-analysis pattern (importance
    propagation over an edge list) expressed as pure DataFrame joins:
    each iteration pre-divides rank by out-degree on the node table,
    joins that contribution-per-edge factor onto the edge list ONCE,
    then target-key sums with map-side partials. Fixed at 2 iterations so the whole
    computation stays SQL-expressible for the oracle; the iterate-to-
    convergence form is the same two joins in a driver loop with
    ``localCheckpoint`` per round (see ``operators/dedup.py::
    neardup_clusters`` for that pattern under test).

    Scale: the edge list shuffles on src (join) and dst (aggregate) —
    both linear; degrees are bounded by basket co-occurrence, so no
    hot-node explosion. Ordering is on the ROUNDED rank (9 digits —
    float-sum noise is ~1e-17 of values ~1e-3) so the top-20 boundary
    and exact-tie ordering agree bit-for-bit across engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    # edge build: the shared basket-pair kernel (one order-keyed
    # shuffle + narrow double-explode; operators/graph.py::basket_pairs)
    #
    # r10: hash-partition the edge list by src ONCE (guide §2.4 — two
    # operations keyed the same way share one exchange).
    # HashPartitioning(src) clusters (src, dst) too, so the distinct's
    # aggregate runs in the same stage with NO second exchange, the
    # persisted InMemoryRelation PRESERVES the partitioning, and then
    # the degree aggregation AND the per-iteration contribution joins
    # all reuse it — each iteration shuffles only the |V|-row rank
    # table instead of re-exchanging the |E|-row edge list. The
    # partition count is explicit because AQE never coalesces a cached
    # plan's output-determining exchange, and it is derived from the
    # fact scan's size (scaled_partitions — what AQE's coalescing
    # would have picked, clamped by cluster-tuned shuffle.partitions)
    # so tiny SFs don't run iteration stages at full-cluster task
    # counts.
    n_part = scaled_partitions(li)
    pairs = (
        basket_pairs(li, symmetric=True)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .repartition(n_part, "src")
        .distinct()
        # the edge list feeds deg + BOTH iterations; persist (NOT
        # localCheckpoint: a checkpoint's LogicalRDD drops
        # outputPartitioning — measured, plans/r10 — while
        # InMemoryRelation keeps it) so each consumer reads the
        # materialized blocks AND inherits the src layout
        .persist()
    )
    pairs.count()  # materialize before fan-out (was the eager checkpoint)
    # the degree table is reused by n, the seed ranks, and BOTH
    # iterations — persist it too; it inherits the src≡node hash
    # layout from the cached edge list (its aggregation needs NO
    # exchange), and every per-iteration rank join below is then
    # node-co-partitioned end to end
    deg = (
        pairs.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(2):
        # pre-divide rank by degree on the NODE table (|V| rows) so the
        # |E|-row edge list is joined exactly ONCE per iteration; pin a
        # shuffle-HASH join with the node table as build side — both
        # node tables are sf-scaled, so the optimizer's alternative
        # (broadcasting whichever side its stats call small — at 100x
        # the node table is a driver OOM, and the checkpointed edge
        # list's known-small local stats invite broadcasting |E|) is
        # wrong at scale, and hash beats merge because the edge list
        # needs no sort
        rd = ranks.join(deg, "node").select(
            F.col("node").alias("src"),
            (F.col("r") / F.col("d")).alias("c"),
        )
        contrib = pairs.join(rd.hint("shuffle_hash"), "src").select(
            "dst", "c"
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (F.lit(0.15) / F.col("n_nodes") + F.lit(0.85) * F.col("s")).alias(
                    "r"
                ),
            )
        )
    return (
        ranks.select("node", F.round("r", 9).alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "node")
        .limit(20)
    )


@register(
    "incremental_agg_update",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           sum(o_totalprice::DECIMAL(14,2))::DOUBLE AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_incremental_agg(spark, sf_dir):
    """Incremental materialized-view maintenance: the per-priority
    order rollup is kept as a BASE aggregate (orders with
    o_orderdate < 1996-01-01, standing in for 'already materialized')
    and refreshed by aggregating ONLY the delta (newer orders) and
    merging the two partial states — count adds, sum adds — without
    rescanning the base fact data. The oracle is the full recompute;
    equality IS the correctness statement of delta maintenance.

    At 100 TB this is the difference between a nightly full-table
    shuffle and an incremental one over the day's partition: the merge
    aggregates #groups × 2 rows. Works because count/sum are
    commutative monoids — avg/percentiles must be carried as their
    partial states (sum+count, sketch) instead.
    """
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1996-01-01").cast("date")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias(
                "total_price"
            ),
        )

    base = partial(orders.where(F.col("o_orderdate") < cutoff))
    delta = partial(orders.where(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_price").cast("double").alias("total_price"),
        )
    )


@register(
    "events_threshold_alerts",
    """
    WITH cum AS (
      SELECT user_id, ts, event_id,
             sum(CAST(round_even(value * 100.0, 0) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c
      FROM events
    ),
    lv AS (
      SELECT user_id, c,
             floor(c / 10000.0)::BIGINT AS level,
             greatest(coalesce(
               max(floor(c / 10000.0)::BIGINT) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 0)
               AS emitted
      FROM cum
    )
    SELECT user_id,
           unnest(generate_series(emitted + 1, level)) AS alert_no,
           c / 100.0 AS total_at_alert
    FROM lv WHERE level > emitted
    """,
)
def q_threshold_alerts(spark, sf_dir):
    """Batch twin of the custom stateful streaming operator
    (``streaming/stateful.py::threshold_alerts``): one alert per 100.0
    of cumulative per-user value, emitted at the event that crosses each
    multiple (an event that jumps several levels emits one row per
    level). Cumulative-sum window + running-MAX-level crossing filter +
    sequence explode — the running max (not the previous row's level)
    mirrors the streaming form's monotone `emitted` counter, so a total
    that dips below a threshold and re-crosses it (negative values)
    never re-emits an alert level on either side
    (tests/test_pydatasource_stateful.py proves the stream/batch
    equivalence).

    HASH-STABLE BY CONSTRUCTION (round-6 sf1 finding: 14 of 491k
    running totals landed on exact 100-multiples where the engines'
    float window sums differ by ulps — DuckDB evaluates running sums
    with a segment tree, Spark left-to-right): the running total is
    an EXACT integer-cent sum (rint ≡ round_even on the identical
    double product; threshold = 10000 cents), so every level/crossing
    decision is integer arithmetic identical under any window
    evaluation strategy, and total_at_alert is one shared /100.0 of
    the same exact integer."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "value", F.expr("CAST(rint(value * 100.0) AS BIGINT)")
    )
    alerts = threshold_alerts_batch(ev, threshold=10000)
    return alerts.select(
        "user_id",
        "alert_no",
        (F.col("total_at_alert") / F.lit(100.0)).alias("total_at_alert"),
    )


@register(
    "top3_parts_per_customer",
    """
    WITH cp AS (
      SELECT o.o_custkey AS c, l.l_partkey AS p, count(*) AS n
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT c, p, n,
             row_number() OVER (PARTITION BY c ORDER BY n DESC, p) AS rn
      FROM cp
    )
    SELECT c AS o_custkey,
           string_agg(p::VARCHAR, ',' ORDER BY rn) AS top_parts
    FROM ranked WHERE rn <= 3
    GROUP BY c
    """,
)
def q_top3_parts(spark, sf_dir):
    """Per-customer top-3 most-ordered parts, AGGREGATE-side: sort the
    collected (count, part) structs inside each group and slice — one
    shuffle keyed on the group, per-group state bounded by the
    customer's distinct-part count, and NO window over the whole
    partition. For high-cardinality grouping keys this beats the
    row_number() formulation (which must sort every partition's full
    rowset); the oracle uses the window form — same rows, two plans.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cp = (
        orders.select("o_custkey", "o_orderkey")
        .join(li.select("l_orderkey", "l_partkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # sort key (-n, p): struct comparison gives count-desc, part-asc
    return (
        cp.groupBy("o_custkey")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("n")).alias("neg_n"),
                            F.col("l_partkey").alias("p"),
                        )
                    )
                ),
                1,
                3,
            ).alias("top3")
        )
        .select(
            "o_custkey",
            F.array_join(
                F.transform(F.col("top3"), lambda s: s["p"].cast("string")), ","
            ).alias("top_parts"),
        )
    )


@register(
    "latest_order_maxby",
    """
    SELECT o_custkey, latest_orderkey, latest_date FROM (
      SELECT o_custkey, o_orderkey AS latest_orderkey,
             max(o_orderdate::DATE) OVER (PARTITION BY o_custkey)
               AS latest_date,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn
      FROM orders)
    WHERE rn = 1
    """,
)
def q_latest_maxby(spark, sf_dir):
    """Latest order per customer via the MAX_BY aggregate — the
    aggregate-side alternative to `w1`'s row_number window: one shuffle
    with map-side partial max, constant per-group state, no
    partition-wide sort. Tie on the date broken by the larger orderkey
    (the composite max_by ordering key on both engines)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_orderdate, o_orderkey))"
        ).alias("latest_orderkey"),
        F.max(F.col("o_orderdate").cast("date")).alias("latest_date"),
    )


@register(
    "triangle_count_strong_ties",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b
      FROM op x JOIN op y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und)
      GROUP BY 1
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    agg AS (
      SELECT count(*) AS n_nodes,
             sum(d * (d - 1) / 2) AS n_wedges
      FROM deg
    )
    SELECT agg.n_nodes::BIGINT AS n_nodes,
           (SELECT count(*) FROM und)::BIGINT AS n_edges,
           agg.n_wedges::BIGINT AS n_wedges,
           tri.n_triangles::BIGINT AS n_triangles,
           round(CASE WHEN agg.n_wedges = 0 THEN 0.0
                      ELSE 3.0 * tri.n_triangles / agg.n_wedges END, 6)
             AS clustering_coeff
    FROM agg, tri
    """,
)
def q_triangles(spark, sf_dir):
    """Global triangle census of the strong-tie co-purchase graph
    (parts bought together in >= 2 distinct orders): node/edge/wedge
    counts, exact triangle count, and the global clustering coefficient
    3*triangles/wedges — the graph-cohesion summary next to
    `pagerank_parts_2iter`'s importance ranking.

    Scale shape — DEGREE-ORDERED orientation, the distributed triangle
    algorithm: every undirected edge is directed from its lower-(degree,
    id) endpoint to the higher, making wedge fanout per node min(deg,
    sqrt(2m)) instead of deg, so the path-join volume is O(m^1.5) even
    with hub nodes where the naive id-ordered join is O(sum deg^2). The
    wedge join and the closing-edge probe are plain equi-joins on node
    keys; the oracle counts the same triangles via the naive a<b<c
    triple join (the total is orientation-invariant), which is fine at
    oracle SF and wrong at 100 TB — that asymmetry is the point.
    The edge build reuses the pagerank basket trick: one order-keyed
    shuffle + bounded double-explode, never an op x op self-join.
    Algorithm: ``operators/graph.py::triangle_stats`` (property-tested
    against brute-force counts on constructed graphs).
    """
    li = _t(spark, sf_dir, "lineitem")
    und = (
        basket_pairs(li)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("a", "b")
    )
    return triangle_stats(und)


@register(
    "inverted_index_postings",
    f"""
    WITH g AS (
      SELECT doc_id, unnest({_sql_word_grams(3)}) AS phrase
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    ),
    w AS (
      SELECT phrase, doc_id,
             count(*) OVER (PARTITION BY phrase) AS df,
             row_number() OVER (PARTITION BY phrase ORDER BY doc_id) AS rn
      FROM g
    )
    SELECT phrase, max(df)::BIGINT AS df,
           string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
    FROM w WHERE rn <= 8
    GROUP BY phrase
    """,
)
def q_inverted_index(spark, sf_dir):
    """Inverted-index build over word 3-gram phrases: per phrase, its
    document frequency and a CAPPED posting list (the 8 smallest doc
    ids, comma-joined) — the exact-phrase lookup structure behind
    decontamination spot checks and "which documents contain this
    string" debugging at corpus scale.

    Scale shape: one phrase-keyed exchange does everything — the window
    attaches df and a doc-ordered row_number in the same sort, the cap
    filter drops every posting beyond 8 BEFORE the final aggregate, so
    per-phrase state is bounded (never a collect_set of a hot phrase's
    million documents), and the aggregate itself reuses the same
    partitioning (no second shuffle). Stop-phrase skew lands on single
    tasks only for the window's sort, which AQE skew-split handles.
    """
    # tokenization + 3-gram explode run below the phrase exchange;
    # floor the leaf so a single-row-group input doesn't serialize them
    # (1.1-1.35x at sf0.1 and visibly lower run variance; no-op on
    # multi-file corpora)
    docs = parallelism_floor(_t(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.explode(T.word_shingles(F.col("text"), 3)).alias("phrase")
    )
    w = Window.partitionBy("phrase")
    attached = grams.select(
        "phrase",
        "doc_id",
        F.count("*").over(w).alias("df"),
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
    )
    return (
        attached.where(F.col("rn") <= 8)
        .groupBy("phrase")
        .agg(
            F.max("df").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )


@register(
    "rrf_hybrid_search",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 3),
    sem AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(
                 e.embedding::DOUBLE[], q.qvec::DOUBLE[]), 6) + 0 DESC,
                 e.vec_id) AS srank
      FROM embeddings e JOIN q ON e.vec_id <> q.query_id
    ),
    toks AS (
      SELECT DISTINCT doc_id, unnest({toks}) AS tok FROM documents
    ),
    lex AS (
      SELECT qt.doc_id AS query_id, ct.doc_id,
             row_number() OVER (
               PARTITION BY qt.doc_id
               ORDER BY count(*) DESC, ct.doc_id) AS lrank
      FROM toks ct JOIN toks qt
        ON ct.tok = qt.tok AND qt.doc_id < 3 AND ct.doc_id <> qt.doc_id
      GROUP BY qt.doc_id, ct.doc_id
    )
    SELECT query_id, doc_id,
           round(1.0 / (60 + srank)
                 + coalesce(1.0 / (60 + lrank), 0.0), 6) AS rrf_score,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(1.0 / (60 + srank)
                            + coalesce(1.0 / (60 + lrank), 0.0), 6) DESC,
                      doc_id)::INTEGER AS rank
    FROM sem LEFT JOIN lex USING (query_id, doc_id)
    QUALIFY rank <= 10
    """.format(toks=_SQL_TOKS),
)
def q_rrf_hybrid(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (k=60): for 3 query
    documents, fuse a SEMANTIC ranking (exact cosine over the embedding
    column, ties to the smaller id) with a LEXICAL ranking (distinct
    shared-token count against the query text) and return the fused
    top-10 — the two-leg retrieval pattern behind dedup-aware corpus
    search, with ranks instead of scores so the legs need no
    calibration.

    Scale shape: the query set is a CONSTANT (3 docs), so both legs are
    broadcast-driven — the semantic leg is a narrow map over embeddings
    (query matrix in the closure, the `cosine_topk` pattern) ranked per
    query by a 3-partition window; the lexical leg semi-joins the
    corpus token table against the broadcast query vocabulary, so the
    corpus never shuffles on token. The fuse join keys on (query_id,
    doc_id) of two already-small ranked legs. Cross-engine hash safety:
    both legs rank on ROUNDED cosine / integer overlap with id
    tiebreaks, and the fused score is a two-term double sum rounded at
    the end.
    """
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    sem = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            _roundz(cosine(F.col("embedding"), F.col("qvec")), 6).alias(
                "sim"
            ),
        )
        .withColumn(
            "srank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("doc_id")
                )
            ),
        )
        .select("query_id", "doc_id", "srank")
    )
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    ).distinct()
    qt = toks.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    lex = (
        toks.join(F.broadcast(qt), "tok")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .withColumn(
            "lrank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("overlap").desc(), F.col("doc_id")
                )
            ),
        )
        .select("query_id", "doc_id", "lrank")
    )
    fused = sem.join(lex, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.round(
            F.lit(1.0) / (F.lit(60) + F.col("srank"))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("lrank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    return (
        fused.withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("rrf_score").desc(), F.col("doc_id")
                )
            )
            .cast("int"),
        )
        .where(F.col("rank") <= 10)
    )


@register(
    "bm25_top_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    q AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS n FROM toks GROUP BY 1
        ORDER BY n DESC, tok LIMIT 3)
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM toks JOIN q USING (tok) GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, len({_SQL_TOKS})::DOUBLE AS dl FROM documents),
    corpus AS (
      SELECT count(*)::DOUBLE AS n_docs,
             (SELECT avg(dl) FROM dl) AS avgdl
      FROM documents
    ),
    idf AS (
      SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY 1
    )
    SELECT tf.doc_id,
           round(sum(
             ln((corpus.n_docs - idf.df + 0.5) / (idf.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN idf USING (tok)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN corpus
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id LIMIT 20
    """,
)
def q_bm25(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75) top-20 documents for the corpus's 3 most
    frequent tokens (a deterministic, self-contained stand-in for a user
    query) — the lexical-ranking classic that completes the scoring
    family next to `tfidf_top_terms` (per-doc salient terms) and
    `rrf_hybrid_search` (rank fusion).

    Scale shape: the query vocabulary is a 3-row aggregate-limited
    frame, so the corpus token explode is filtered by a BROADCAST
    semi-join before the only (doc, term)-keyed aggregation — the
    corpus never shuffles on raw tokens for scoring; document length is
    a narrow map; N/avgdl and the per-term idf are 1-row/3-row
    broadcast frames; the final top-20 is TakeOrderedAndProject on the
    ROUNDED score (ties → doc_id), never a global sort.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    qterms = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(3)
        .select("tok")
    )
    tf = (
        toks.join(F.broadcast(qterms), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        "doc_id", T.token_count(F.col("text")).cast("double").alias("dl")
    )
    corpus = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    ).crossJoin(F.broadcast(dl.agg(F.avg("dl").alias("avgdl"))))
    idf = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * F.col("tf")
                * F.lit(2.2)
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(1.0)
                        - F.lit(0.75)
                        + F.lit(0.75) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@register(
    "association_rules",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS n_orders FROM op),
    item AS (SELECT l_partkey AS part, count(*) AS n_part FROM op GROUP BY 1),
    pair AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS n_both
      FROM op x JOIN op y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    rules AS (
      SELECT a AS antecedent, b AS consequent, n_both FROM pair
      UNION ALL
      SELECT b, a, n_both FROM pair
    )
    SELECT antecedent, consequent,
           round(r.n_both / n.n_orders, 6) AS support,
           round(r.n_both::DOUBLE / ia.n_part, 6) AS confidence,
           round((r.n_both::DOUBLE / ia.n_part) / (ic.n_part / n.n_orders), 6)
             AS lift
    FROM rules r
    JOIN item ia ON ia.part = r.antecedent
    JOIN item ic ON ic.part = r.consequent
    CROSS JOIN n
    ORDER BY lift DESC, antecedent, consequent LIMIT 20
    """,
)
def q_assoc_rules(spark, sf_dir):
    """Association rules over strong co-purchase pairs (support >= 2
    orders): directed ``antecedent -> consequent`` with support,
    confidence and lift, top-20 by lift — the market-basket layer above
    `copurchase_pairs`' raw co-occurrence counts.

    Scale shape: basket explode (order-keyed shuffle, fanout bounded by
    basket size) -> pair-keyed count -> a two-way equi-join against the
    per-item order counts (node-table sized) and a broadcast 1-row
    total; the top-20 is TakeOrderedAndProject on the ROUNDED lift with
    full key tiebreaks. Nothing is quadratic in parts or orders.
    """
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n = op.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    item = op.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_part")
    )
    pair = (
        basket_pairs(li)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= 2)
    )
    rules = pair.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        "n_both",
    ).unionAll(
        pair.select(
            F.col("b").alias("antecedent"),
            F.col("a").alias("consequent"),
            "n_both",
        )
    )
    out = (
        rules.join(
            item.select(F.col("part").alias("antecedent"), F.col("n_part").alias("n_a")),
            "antecedent",
        )
        .join(
            item.select(F.col("part").alias("consequent"), F.col("n_part").alias("n_c")),
            "consequent",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.round(F.col("n_both") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("n_both").cast("double") / F.col("n_a"), 6
            ).alias("confidence"),
            F.round(
                (F.col("n_both").cast("double") / F.col("n_a"))
                / (F.col("n_c") / F.col("n_orders")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("lift").desc(), "antecedent", "consequent"
    ).limit(20)


@register(
    "events_hourly_anomalies",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT hour, n_events,
             avg(n_events) OVER w AS mu,
             stddev_samp(n_events) OVER w AS sigma
      FROM hourly
      WINDOW w AS (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour, n_events::BIGINT AS n_events,
           round(mu, 6) AS trailing_mean,
           round((n_events - mu) / sigma, 6) AS zscore
    FROM scored
    WHERE sigma IS NOT NULL AND sigma > 0
      AND abs((n_events - mu) / sigma) >= 2.0
    """,
)
def q_hourly_anomalies(spark, sf_dir):
    """Event-rate anomaly detection: hours whose event count deviates
    >= 2 sample standard deviations from the TRAILING 24-hour mean
    (strictly prior hours only — no leakage of the scored hour into its
    own baseline). The streaming-monitor pattern as a batch query.

    Scale shape: the raw stream collapses to one row per hour FIRST
    (map-side partial count), so the global-ordered window runs over
    hours-of-history rows (~9k/year), not events — a partition-less
    window over an already-aggregated frame, the same bounded shape as
    the allowlisted top-k rankers. The z-score divides only where
    sigma > 0, and both engines compute stddev_samp over the identical
    24-row frame.
    """
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.orderBy("hour").rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "hour",
        "n_events",
        F.avg("n_events").over(w).alias("mu"),
        F.stddev_samp("n_events").over(w).alias("sigma"),
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sigma")
    return (
        scored.where(
            F.col("sigma").isNotNull()
            & (F.col("sigma") > 0)
            & (F.abs(z) >= 2.0)
        )
        .select(
            "hour",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("mu", 6).alias("trailing_mean"),
            F.round(z, 6).alias("zscore"),
        )
    )


@register(
    "train_val_test_split",
    f"""
    WITH assigned AS (
      SELECT doc_id, len({_SQL_TOKS})::BIGINT AS n_tokens,
             CASE WHEN h < 8 THEN 'train'
                  WHEN h = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, text,
                   CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
                     % 10 AS h
            FROM documents)
    )
    SELECT split, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM assigned GROUP BY split
    """,
)
def q_train_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by content-free
    id hashing — ``md5(doc_id)`` first 8 hex digits mod 10 — with
    per-split document and token counts. Hash-based assignment is the
    scale-correct split: stable under reruns, resharding and corpus
    growth (a document's split never changes when OTHER documents are
    added/removed — a row_number-based split would reshuffle everyone),
    and needs no global sort or state, just a narrow map. The census is
    one 3-group aggregation with map-side partials. md5 keeps the
    assignment engine-portable (same split in any system that can hash
    a string), which is also what the oracle checks.
    """
    docs = _t(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    assigned = docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.when(h < 8, "train").when(h == 8, "val").otherwise("test").alias(
            "split"
        ),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "k_anonymity_report",
    """
    SELECT lang, source, count(*) AS group_size
    FROM documents
    GROUP BY lang, source
    HAVING count(*) < 50
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier pair (lang, source):
    every group with fewer than k=50 members — the release-safety check
    that complements `text_pii_redact` (direct identifiers) by flagging
    SMALL COHORTS whose combination of categorical attributes could
    re-identify contributors. One aggregation with map-side partials;
    the HAVING filter means only sub-threshold groups (a bounded set:
    at most |lang|x|source| rows) ever reach the driver-facing result.
    """
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < 50)
    )


@register(
    "user_value_trend",
    """
    WITH e AS (
      SELECT user_id,
             CAST(round_even(value * 1000000.0, 0) AS BIGINT) AS yc,
             epoch_us(ts::TIMESTAMP)
               - 1704067200000000 AS xu
      FROM events
    ),
    s AS (
      SELECT user_id,
             count(*) AS n_events,
             sum(CAST(xu AS DECIMAL(20,0))) AS sx,
             sum(CAST(yc AS DECIMAL(20,0))) AS sy,
             sum(CAST(xu AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0)))
               AS sxy,
             sum(CAST(xu AS DECIMAL(19,0)) * CAST(xu AS DECIMAL(19,0)))
               AS sxx,
             sum(CAST(yc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0)))
               AS syy,
             max(xu) AS xmax, min(xu) AS xmin,
             max(yc) AS ymax, min(yc) AS ymin
      FROM e GROUP BY user_id
    )
    SELECT user_id, n_events,
           round((n_events::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n_events::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
                 6) + 0 AS slope_per_sec,
           round((sy::DOUBLE - (n_events::DOUBLE * sxy::DOUBLE
                                - sx::DOUBLE * sy::DOUBLE)
                              / (n_events::DOUBLE * sxx::DOUBLE
                                 - sx::DOUBLE * sx::DOUBLE)
                              * sx::DOUBLE)
                 / n_events::DOUBLE / 1000000.0, 6) + 0 AS intercept,
           round((n_events::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 * (n_events::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / ((n_events::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n_events::DOUBLE * syy::DOUBLE
                       - sy::DOUBLE * sy::DOUBLE)), 6) + 0 AS r2
    FROM s
    WHERE n_events >= 2 AND xmax > xmin AND ymax > ymin
    """,
)
def q_user_trend(spark, sf_dir):
    """Per-user least-squares trend of event value over time — closed-
    form OLS as a plain grouped aggregation, the drift-per-entity
    monitor (is this user's spend trending up?) without any per-group
    fitting loop or UDF.

    Scale shape: ONE user-keyed shuffle; the regression state per group
    is six constants (n, Σx, Σy, Σxy, Σx², Σy² plus min/max guards)
    merged by map-side partials, so a billion users cost the same
    per-group state as ten.

    HASH-STABLE BY CONSTRUCTION (round-5 guard-band finding: raw
    slopes at sf0.1 sit 8.6e-11 from a rounding half-boundary, inside
    cross-engine float-summation noise): the sufficient statistics are
    EXACT — x is integer microseconds centered on 2024-01-01, y the
    value quantized to integer MICRO-UNITS with nearest-even `rint` ≡
    `round_even` on the identical double product (NOT a decimal cast:
    ~11% of event values carry sub-cent and ~3% full double precision,
    and Spark's double→decimal conversion goes through the shortest
    string where DuckDB rounds the exact binary expansion — a
    divergence surface this query must not stand on). Every Σ is then
    decimal/integer arithmetic with no float rounding, so both
    engines' sums are bit-identical regardless of partial-aggregation
    order, and the closed forms run in DOUBLE over identical inputs
    with an identical operation sequence (mirrored verbatim in the
    oracle SQL). With y in micro-units and x in µs the unit factors
    cancel: slope_per_sec = Δy'/Δx directly. Degenerate groups
    (constant x or constant y) are filtered on exact integer min/max,
    replacing the engine-specific `regr_r2 IS NOT NULL`.
    """
    ev = _t(spark, sf_dir, "events")
    # parquet surfaces ts as TIMESTAMP_NTZ; hop through TIMESTAMP (UTC
    # session), then to exact integer micros like DuckDB's epoch_us
    xu = F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(
        1704067200000000  # micros of 2024-01-01 00:00:00 UTC
    )
    yc = F.expr("CAST(rint(value * 1000000.0) AS BIGINT)")
    # decimal(19,0) matches the oracle and holds any µs offset this
    # side of year ~33658; (19,0)² multiplies into (38,0) with scale 0,
    # so Spark's precision-loss path never rounds. y gets the SAME
    # width: a narrower cast (the old (10,0)) silently NULLs in
    # non-ANSI Spark but raises in DuckDB once |value| >= 1e4 — a
    # cross-engine divergence surface — and (19,0) operands force
    # DuckDB's hugeint-backed multiply
    xd = F.col("xu").cast("decimal(19,0)")
    yd = F.col("yc").cast("decimal(19,0)")
    s = ev.select(
        "user_id", xu.alias("xu"), yc.alias("yc")
    ).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("xu").cast("decimal(20,0)")).alias("sx"),
        F.sum(F.col("yc").cast("decimal(20,0)")).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.max("xu").alias("xmax"),
        F.min("xu").alias("xmin"),
        F.max("yc").alias("ymax"),
        F.min("yc").alias("ymin"),
    )
    n = F.col("n_events").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    a = n * sxy - sx * sy  # same op order as the oracle text
    b = n * sxx - sx * sx
    c = n * syy - sy * sy
    slope = a / b  # µ-units per µs == value-units per second
    return (
        s.where(
            (F.col("n_events") >= 2)
            & (F.col("xmax") > F.col("xmin"))
            & (F.col("ymax") > F.col("ymin"))
        )
        .select(
            "user_id",
            "n_events",
            _roundz(slope, 6).alias("slope_per_sec"),
            _roundz(
                (sy - slope * sx) / n / F.lit(1000000.0), 6
            ).alias("intercept"),
            _roundz(a * a / (b * c), 6).alias("r2"),
        )
    )


@register(
    "lineitem_correlations",
    """
    WITH q AS (
      SELECT CAST(round_even(l_quantity * 100.0, 0) AS BIGINT) AS qc,
             CAST(round_even(l_extendedprice * 10000.0, 0) AS BIGINT) AS pc,
             CAST(round_even(l_discount * 1000000.0, 0) AS BIGINT) AS dc
      FROM lineitem
    ),
    s AS (
      SELECT count(*) AS n,
             sum(CAST(qc AS DECIMAL(20,0))) AS sq,
             sum(CAST(pc AS DECIMAL(20,0))) AS sp,
             sum(CAST(dc AS DECIMAL(20,0))) AS sd,
             sum(CAST(qc AS DECIMAL(19,0)) * CAST(pc AS DECIMAL(19,0)))
               AS sqp,
             sum(CAST(pc AS DECIMAL(19,0)) * CAST(dc AS DECIMAL(19,0)))
               AS spd,
             sum(CAST(qc AS DECIMAL(19,0)) * CAST(qc AS DECIMAL(19,0)))
               AS sqq,
             sum(CAST(pc AS DECIMAL(19,0)) * CAST(pc AS DECIMAL(19,0)))
               AS spp,
             sum(CAST(dc AS DECIMAL(19,0)) * CAST(dc AS DECIMAL(19,0)))
               AS sdd
      FROM q
    )
    SELECT round((n::DOUBLE * sqp::DOUBLE - sq::DOUBLE * sp::DOUBLE)
                 / sqrt((n::DOUBLE * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE)
                        * (n::DOUBLE * spp::DOUBLE - sp::DOUBLE * sp::DOUBLE)),
                 6) + 0 AS q_price_corr,
           round((n::DOUBLE * spd::DOUBLE - sp::DOUBLE * sd::DOUBLE)
                 / sqrt((n::DOUBLE * spp::DOUBLE - sp::DOUBLE * sp::DOUBLE)
                        * (n::DOUBLE * sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE)),
                 6) + 0 AS price_disc_corr,
           round((n::DOUBLE * sqp::DOUBLE - sq::DOUBLE * sp::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0)) / 1000000.0, 6) + 0
             AS q_price_cov,
           round(sqrt((n::DOUBLE * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE)
                      / (n::DOUBLE * (n::DOUBLE - 1.0))) / 100.0, 6)
             AS sd_qty,
           round(sqrt((n::DOUBLE * spp::DOUBLE - sp::DOUBLE * sp::DOUBLE)
                      / (n::DOUBLE * (n::DOUBLE - 1.0))) / 10000.0, 6)
             AS sd_price
    FROM s
    """,
)
def q_lineitem_corr(spark, sf_dir):
    """Column-pair correlation report over the fact table (Pearson corr
    + sample covariance + standard deviations) — the feature-screening
    aggregate family that rounds out `stats_moments`' single-column
    skew/kurtosis: one full-table pass, constant per-pair state merged
    with map-side partials, no shuffle beyond the final 1-row combine.

    HASH-STABLE BY CONSTRUCTION (round-5 sf1 guard-band measurement:
    the raw q/price correlation sat 9.9e-9 from a rounding
    half-boundary — 10× the band): inputs quantize to integers with
    nearest-even rint on the identical doubles (quantity at 1e-2,
    price at 1e-4, discount at 1e-6 — ~11% of prices and ~10% of
    discounts carry sub-cent noise, so a decimal cast would ride each
    engine's own double→decimal conversion), all five sufficient sums
    run exact in decimal, and the closed forms — corr = A/√(B·C),
    covar = A/(n(n−1)), sd = √(B/(n(n−1))) — are fixed double op
    sequences through IEEE-correctly-rounded sqrt, mirrored verbatim
    in the oracle. Correlation is invariant to the quantization
    scales; covar/sd divide them back out.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.expr("CAST(rint(l_quantity * 100.0) AS BIGINT)").alias("qc"),
        F.expr("CAST(rint(l_extendedprice * 10000.0) AS BIGINT)").alias("pc"),
        F.expr("CAST(rint(l_discount * 1000000.0) AS BIGINT)").alias("dc"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qc").cast("decimal(20,0)")).alias("sq"),
        F.sum(F.col("pc").cast("decimal(20,0)")).alias("sp"),
        F.sum(F.col("dc").cast("decimal(20,0)")).alias("sd"),
        F.sum(d19("qc") * d19("pc")).alias("sqp"),
        F.sum(d19("pc") * d19("dc")).alias("spd"),
        F.sum(d19("qc") * d19("qc")).alias("sqq"),
        F.sum(d19("pc") * d19("pc")).alias("spp"),
        F.sum(d19("dc") * d19("dc")).alias("sdd"),
    )
    n = F.col("n").cast("double")
    sq, sp, sd = (F.col(c).cast("double") for c in ("sq", "sp", "sd"))
    sqp, spd, sqq, spp, sdd = (
        F.col(c).cast("double") for c in ("sqp", "spd", "sqq", "spp", "sdd")
    )
    a_qp = n * sqp - sq * sp
    a_pd = n * spd - sp * sd
    b_q = n * sqq - sq * sq
    b_p = n * spp - sp * sp
    b_d = n * sdd - sd * sd
    nn1 = n * (n - F.lit(1.0))
    return agg.select(
        _roundz(a_qp / F.sqrt(b_q * b_p), 6).alias("q_price_corr"),
        _roundz(a_pd / F.sqrt(b_p * b_d), 6).alias("price_disc_corr"),
        _roundz(a_qp / nn1 / F.lit(1000000.0), 6).alias("q_price_cov"),
        F.round(F.sqrt(b_q / nn1) / F.lit(100.0), 6).alias("sd_qty"),
        F.round(F.sqrt(b_p / nn1) / F.lit(10000.0), 6).alias("sd_price"),
    )


@register(
    "multimodal_audio_stats",
    """
    SELECT doc_id,
           (2 * (16000 + doc_id % 16000))::BIGINT AS payload_bytes,
           (16000 + doc_id % 16000)::BIGINT AS n_samples,
           round((16000 + doc_id % 16000) / 16000.0, 7) AS duration_s,
           ((doc_id % 7 + 1) * 1000)::DOUBLE AS rms,
           ((doc_id % 7 + 1) * 1000)::BIGINT AS peak
    FROM documents
    """,
)
def q_mm_audio(spark, sf_dir):
    """Audio leg of the multimodal surface: synthesize PCM16 payloads
    (Arrow `mapInPandas`, real binary-column ingest shape) then decode
    and compute per-clip stats (samples, duration, RMS, peak) in a
    second Arrow stage with numpy — `operators/multimodal.py::
    attach_audio_payload` / `decode_audio`. The fake profile is a
    square wave, so RMS and peak are closed-form (== amplitude) and the
    whole numeric path — byte synthesis, `frombuffer` decode,
    float64 RMS — is checkable in SQL exactly (duration rounds at
    7 digits, where n/16000's decimal expansion terminates — rounding
    at 6 hits exact .xxxxxx75 ties that the two engines break
    differently); a real codec swaps in
    behind the same schema, batch shape and partitioning.
    """
    docs = _t(spark, sf_dir, "documents")
    media = attach_audio_payload(docs)
    return decode_audio(media).select(
        "doc_id",
        "payload_bytes",
        "n_samples",
        F.round("duration_s", 7).alias("duration_s"),
        "rms",
        "peak",
    )


@register(
    "token_heavy_hitters",
    """
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                t -> t <> '')) AS token
      FROM documents
    ), tot AS (SELECT count(*) AS total FROM tok)
    SELECT token, count(*)::BIGINT AS cnt
    FROM tok, tot
    GROUP BY token, tot.total
    HAVING count(*) * 200 > tot.total
    """,
)
def q_heavy_hitters(spark, sf_dir):
    """Frequent tokens (> N/200 of the corpus) via per-partition
    Misra–Gries candidate summaries + an exact verification count —
    `operators/sketches.py::heavy_hitter_tokens`.

    The oracle is the naive full-vocabulary GROUP BY/HAVING; the Spark
    plan produces the IDENTICAL exact answer but its shuffle only ever
    carries the O(k·partitions) candidate tokens (broadcast semi-join),
    not the whole vocabulary — the 100 TB shape for "which tokens are
    above an x-fraction threshold". The MG union guarantee (every token
    with global count > N/(k+1) survives some partition's k-counter
    summary; Agarwal et al., Mergeable Summaries, PODS 2012) makes the
    candidate set a superset of the answer, and the exact pass restores
    precision, so the sketch changes the PLAN, not the RESULT.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.lower(F.col("text")))).alias("token")
    )
    # N from a cheap non-exploded pass: sum of per-doc token counts
    total = docs.agg(
        F.sum(T.token_count(F.col("text")).cast("long")).alias("total")
    )
    return heavy_hitter_tokens(toks, total, token_col="token", k=200)


@register(
    "session_transitions",
    """
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), tr AS (
      SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, transitions,
           round(transitions / sum(transitions) OVER (PARTITION BY prev_type),
                 6) AS p_next
    FROM tr
    """,
)
def q_session_transitions(spark, sf_dir):
    """First-order Markov transition matrix of event types per user
    stream (the behavioral-sequence summary that feeds next-action
    models): lag() within each user's (ts, event_id)-ordered stream,
    then count and normalize per source state.

    Scale shape: ONE user-keyed shuffle for the lag window (each user's
    stream is its own partition — no global sort), then an aggregation
    whose output is bounded by |event_type|² rows, over which the
    normalizing window runs on a trivially small frame. The (ts,
    event_id) order key makes the lag total and deterministic across
    engines even when timestamps tie.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    tr = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("transitions")
    )
    wnorm = Window.partitionBy("prev_type")
    return tr.select(
        "prev_type",
        "next_type",
        "transitions",
        F.round(
            F.col("transitions") / F.sum("transitions").over(wnorm), 6
        ).alias("p_next"),
    )


@register(
    "order_mad_outliers",
    """
    WITH med AS (
      SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY o_orderpriority
    ), mad AS (
      SELECT o.o_orderpriority, any_value(m.med) AS med,
             quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad
      FROM orders o JOIN med m USING (o_orderpriority)
      GROUP BY o.o_orderpriority
    )
    SELECT o.o_orderpriority,
           count(*)::BIGINT AS n_orders,
           sum(CASE WHEN abs(o.o_totalprice - t.med) > 3 * 1.4826 * t.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           round(any_value(t.med), 2) AS med,
           round(any_value(t.mad), 2) AS mad
    FROM orders o JOIN mad t USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def q_mad_outliers(spark, sf_dir):
    """Robust (median/MAD) outlier census of order values per priority
    class — the heavy-tail-safe complement to `stats_moments`' mean/
    stddev screening: an order is an outlier when its absolute
    deviation from the group median exceeds 3 robust sigmas
    (1.4826·MAD ≈ σ under normality).

    Scale shape: two grouped EXACT percentiles + a final flag count,
    each a fact-table pass that reduces to |priority| (5) rows; the
    tiny per-group (median, MAD) frames broadcast back onto the fact
    scan, so no fact-side shuffle happens at all beyond the grouped
    aggregations themselves. Exact interpolated percentile
    (`F.percentile` ≡ DuckDB `quantile_cont`) keeps both engines
    bit-identical; at 100 TB swap in `approx_percentile` with the
    same plan if exactness can be traded for one fewer pass.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    mad = (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.first("med").alias("med"),
            F.percentile(
                F.abs(F.col("o_totalprice") - F.col("med")), F.lit(0.5)
            ).alias("mad"),
        )
    )
    flagged = o.join(F.broadcast(mad), "o_orderpriority")
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.when(
                F.abs(F.col("o_totalprice") - F.col("med"))
                > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                1,
            ).otherwise(0)
        ).alias("n_outliers"),
        F.round(F.first("med"), 2).alias("med"),
        F.round(F.first("mad"), 2).alias("mad"),
    )


@register(
    "user_time_weighted_value",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(round_even(value * 1000000.0, 0) AS BIGINT) AS vc,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           count(*)::BIGINT AS n_intervals,
           round(sum(CAST(vc AS DECIMAL(19,0))
                     * CAST(dur_us AS DECIMAL(19,0)))::DOUBLE
                 / sum(CAST(dur_us AS DECIMAL(20,0)))::DOUBLE
                 / 1000000.0, 6) AS twav
    FROM seq
    WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    """,
)
def q_twav(spark, sf_dir):
    """Time-weighted average event value per user (TWAP-style): each
    event's value is weighted by how long it remained the latest
    observation (lead(ts) − ts), the correct average for irregularly
    sampled streams where plain avg() over-weights chatty periods.

    Scale shape: one user-keyed shuffle for the lead window, then a
    grouped sum on the SAME key — Spark reuses the window's hash
    partitioning, so the aggregation adds no second exchange.
    Numerics (hash-stable by construction): durations in exact integer
    MICROSECONDS (`unix_micros` ≡ DuckDB `epoch_us`) and values
    quantized to integer micro-units with nearest-even rint ≡
    round_even on the identical double (a DECIMAL cast of the raw
    double would ride each engine's own double→decimal conversion —
    ~3% of event values carry full double precision), so the weighted
    sum is exact on both engines regardless of accumulation order —
    only the final division happens in double, on identical operands.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id",
        F.expr("CAST(rint(value * 1000000.0) AS BIGINT)").alias("vc"),
        (F.lead(us).over(w) - us).alias("dur_us"),
    ).where(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(
            F.sum(
                F.col("vc").cast("decimal(19,0)")
                * F.col("dur_us").cast("decimal(19,0)")
            ).cast("double")
            / F.sum(F.col("dur_us").cast("decimal(20,0)")).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("twav"),
    )


@register(
    "events_hourly_unique_users",
    """
    SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
           (date_trunc('hour', ts) + INTERVAL 1 HOUR)::TIMESTAMP AS window_end,
           event_type,
           count(DISTINCT user_id) AS exact_users,
           (abs(approx_count_distinct(user_id)::DOUBLE
                - count(DISTINCT user_id))
            < greatest(0.05 * count(DISTINCT user_id), 5)) AS approx_ok
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_ev_unique_users(spark, sf_dir):
    """Hourly distinct users per event type — the batch contract twin
    of `streaming/events.py::windowed_unique_users` (HLL++ windowed
    cardinality, the only distinct-count that exists in streaming and
    the only one that scales in batch: sketch state is a few KB per
    open window vs the per-window-per-user set of exact DISTINCT).

    Same engine-portable contract as `a6_approx_count_distinct` — each
    engine exports the exact count (identical by definition) plus a
    boolean that its OWN sketch lands close to it; raw estimates are
    sketch-implementation-specific and never compared — but with an
    ABSOLUTE error floor the per-event-type query doesn't need:
    ``|est - exact| < max(5% of exact, 5)``. Hourly windows have
    small cardinalities, where HLL implementations carry low-range
    bias a purely relative bound turns into a coin flip (measured at
    sf0.1: DuckDB's sketch sits 2 under on 25-user groups — 8%
    relative — on 20 of 3600 groups, while Spark at rsd=0.01 passes;
    sf0.01 masked it because tiny groups estimate exactly). The
    streaming form's micro-batch-merged estimates are bit-identical to
    the one-shot batch run (HLL register-merge is order-independent;
    asserted in tests/test_streaming.py).
    """
    ev = _t(spark, sf_dir, "events")
    approx = windowed_unique_users(ev, "1 hour")
    win = F.window(F.col("ts"), "1 hour")
    exact = (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "exact_users",
        )
    )
    return approx.join(
        exact, ["window_start", "window_end", "event_type"]
    ).select(
        "window_start",
        "window_end",
        "event_type",
        "exact_users",
        (
            F.abs(
                F.col("approx_users").cast("double") - F.col("exact_users")
            )
            < F.greatest(0.05 * F.col("exact_users"), F.lit(5))
        ).alias("approx_ok"),
    )


@register(
    "semantic_dedup_clustered",
    f"""
    WITH c AS (
      SELECT vec_id AS cluster_id, embedding AS cvec
      FROM embeddings WHERE vec_id < 8
    ),
    d AS (
      SELECT e.vec_id, c.cluster_id, {_SQL_SQDIST} AS sq
      FROM embeddings e CROSS JOIN c
    ),
    a AS (
      SELECT vec_id, cluster_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sq, cluster_id) AS rn
      FROM d
    ),
    asg AS (SELECT vec_id, cluster_id FROM a WHERE rn = 1)
    SELECT ax.cluster_id::INT AS cluster_id,
           ax.vec_id AS id_a, bx.vec_id AS id_b,
           round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                        eb.embedding::DOUBLE[]), 6)
             AS cosine_sim
    FROM asg ax
    JOIN asg bx ON ax.cluster_id = bx.cluster_id AND ax.vec_id < bx.vec_id
    JOIN embeddings ea ON ea.vec_id = ax.vec_id
    JOIN embeddings eb ON eb.vec_id = bx.vec_id
    WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                       eb.embedding::DOUBLE[]), 6) >= 0.45
    """,
)
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style cluster-pruned semantic dedup (Abbas et al. 2023):
    assign every embedding to its nearest of k=8 fixed centroids (the
    same deterministic assignment as `embedding_kmeans_sizes`), then
    search near-duplicate pairs (cosine ≥ 0.45) ONLY within each
    cluster — a cluster-keyed equi self-join instead of the global
    all-pairs or LSH search of `embedding_neardup`.

    The pruning is the documented SemDeDup trade: cross-cluster pairs
    are out of scope BY DEFINITION (the oracle applies the identical
    pruning, so both engines agree exactly). Scale shape: assignment is
    a narrow zero-shuffle map (centroids baked into a JVM expression);
    the candidate stage shuffles on cluster_id and its cost is
    Σ n_c² — tuned by k, with hot clusters handled by raising k or
    salting the within-cluster join, never by a global cross join.
    """
    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(
            (F.col("vec_id") < 8) & F.col("embedding").isNotNull()
        )
        .select("vec_id", "embedding")
        .collect()
    ]
    if not centroids:
        # empty/degenerate corpus: no centroids → no clusters → no pairs
        return spark.createDataFrame(
            [], "cluster_id int, id_a bigint, id_b bigint, cosine_sim double"
        )
    assigned = assign_clusters(emb, centroids).select(
        "cluster_id", "vec_id", "embedding"
    )
    a = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("vec_a"),
    )
    b = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vec_b"),
    )
    sim = F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
    return (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "id_a",
            "id_b",
            sim.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= 0.45)
    )


@register(
    "division_full_range_suppliers",
    """
    WITH brands AS (SELECT DISTINCT p_brand FROM part),
    sp AS (
      SELECT DISTINCT l_suppkey, p_brand
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_quantity >= 44
    ),
    full_cover AS (
      SELECT l_suppkey, count(*)::BIGINT AS n_brands
      FROM sp
      GROUP BY l_suppkey
      HAVING count(*) = (SELECT count(*) FROM brands)
    )
    SELECT s.s_suppkey, s.s_name, f.n_brands
    FROM supplier s JOIN full_cover f ON s.s_suppkey = f.l_suppkey
    """,
)
def q_division(spark, sf_dir):
    """Relational DIVISION — suppliers with a bulk shipment (quantity
    ≥ 44) of EVERY brand in the catalog: the for-all quantifier
    expressed as distinct-count-equality, the assortment-completeness /
    coverage primitive ("entities related to ALL members of a set").

    Scale shape: no cross product anywhere — the dividend reduces to
    DISTINCT (supplier, brand) pairs (one fact-keyed shuffle with
    map-side partial distinct; at most |supplier|×|brand| rows
    survive), the divisor reduces to a 1-row count that broadcasts
    into the HAVING comparison, and the final supplier join runs on
    the already-small full-cover set. The quantity filter pushes to
    the parquet scan; part→lineitem attaches p_brand via a
    broadcast-eligible dimension join at test SF and an AQE-chosen
    shuffle join beyond.
    """
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 44)
        .select("l_suppkey", "l_partkey")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sp = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_suppkey", "p_brand")
        .distinct()
    )
    n_brands = part.select("p_brand").distinct().agg(
        F.count(F.lit(1)).alias("n_all")
    )
    cover = (
        sp.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_brands"))
        .crossJoin(F.broadcast(n_brands))
        .where(F.col("n_brands") == F.col("n_all"))
        .select("l_suppkey", "n_brands")
    )
    return sup.join(cover, sup["s_suppkey"] == cover["l_suppkey"]).select(
        "s_suppkey", "s_name", "n_brands"
    )


@register(
    "skyline_parts",
    """
    SELECT a.p_partkey, a.p_brand, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def q_skyline(spark, sf_dir):
    """Pareto frontier of the part catalog — cheapest-for-their-size
    parts (minimize p_retailprice, maximize p_size): multi-objective
    shortlisting without collapsing objectives into one score.

    The oracle states the semantics as the quadratic NOT EXISTS
    dominator test; the Spark plan is the two-phase distributed skyline
    (`operators/skyline.py::skyline_2d`): per-partition Arrow frontier
    reduction (narrow — a locally dominated point is globally
    dominated, so nothing correct is lost), then one global sweep over
    the tiny candidate union, then a broadcast join back to the
    catalog so every copy of a frontier point survives. No quadratic
    stage anywhere.
    """
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    return skyline_2d(part, "p_retailprice", "p_size")


@register(
    "categorical_mutual_info",
    """
    WITH joint AS (
      SELECT lang, source, count(*)::DOUBLE AS c
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM joint),
    ml AS (SELECT lang, sum(c) AS cl FROM joint GROUP BY 1),
    ms AS (SELECT source, sum(c) AS cs FROM joint GROUP BY 1)
    SELECT count(*)::BIGINT AS n_cells,
           round(sum((c / n) * ln((c / n) / ((cl / n) * (cs / n)))), 6) + 0
             AS mi_nats
    FROM joint JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN tot
    """,
)
def q_mutual_info(spark, sf_dir):
    """Mutual information I(lang; source) in nats — the categorical
    dependence screen that complements `lineitem_correlations`
    (Pearson only sees numeric-linear association): does knowing a
    document's source tell you anything about its language? MI = 0 ⇔
    independent; here it quantifies corpus-mix structure for
    stratification decisions.

    Scale shape: ONE full-table aggregation to the joint contingency
    table (map-side partials, output bounded by |lang|×|source|);
    marginals and the total re-aggregate THAT tiny frame, broadcast
    back onto it, and reduce to a single row. The fact table is
    scanned exactly once.
    """
    docs = _t(spark, sf_dir, "documents")
    joint = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = joint.agg(F.sum("c").alias("n"))
    ml = joint.groupBy("lang").agg(F.sum("c").alias("cl"))
    ms = joint.groupBy("source").agg(F.sum("c").alias("cs"))
    px = F.col("c") / F.col("n")
    term = px * F.log(px / ((F.col("cl") / F.col("n")) * (F.col("cs") / F.col("n"))))
    return (
        joint.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            _roundz(F.sum(term), 6).alias("mi_nats"),
        )
    )


@register(
    "embedding_covariance",
    """
    WITH q AS (
      SELECT CAST(round_even(embedding[i]::DOUBLE * 1000000.0, 0)
                  AS BIGINT) AS qi,
             CAST(round_even(embedding[j]::DOUBLE * 1000000.0, 0)
                  AS BIGINT) AS qj,
             i, j
      FROM embeddings,
           generate_series(1, 64) s1(i), generate_series(1, 64) s2(j)
      WHERE i <= j AND embedding IS NOT NULL
    ),
    s AS (
      SELECT i, j, count(*) AS n,
             sum(qi) AS sx, sum(qj) AS sy,
             sum(qi::HUGEINT * qj) AS sxy
      FROM q GROUP BY i, j
    )
    SELECT i::INT AS i, j::INT AS j,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0))
                 / 1000000000000.0, 6) + 0.0 AS cov
    FROM s WHERE n > 1
    """,
)
def q_embedding_cov(spark, sf_dir):
    """Upper-triangle sample covariance matrix of the 64-dim embedding
    corpus — the PCA / whitening / anisotropy-diagnostic input —
    via `operators/linalg.py::embedding_covariance`.

    The oracle states the semantics as per-pair sums over a d×d unnest
    (d² row amplification — fine for DuckDB at oracle scale,
    catastrophic at 100 TB); the Spark plan instead reduces each Arrow
    batch to ONE X'X partial (vectorized matmul) and shuffles only
    O(d²·batches) partial rows. Both engines quantize elements to
    integers at 1e-6 (nearest-even) and keep every sum EXACT, so the
    closed-form covariance is bit-identical across engines and
    partitionings — see the linalg module docstring for the round-5
    guard-band finding (raw covariances 9.6e-11 from a rounding
    half-boundary) that motivated the quantized contract.
    """
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, "embedding")


@register(
    "user_trend_rolling",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(round_even(value * 1000000.0, 0) AS BIGINT) AS yc,
             epoch_us(ts::TIMESTAMP) - 1704067200000000 AS xu,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, rn,
             sum(CAST(xu AS DECIMAL(20,0))) OVER w AS sx,
             sum(CAST(yc AS DECIMAL(20,0))) OVER w AS sy,
             sum(CAST(xu AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0)))
               OVER w AS sxy,
             sum(CAST(xu AS DECIMAL(19,0)) * CAST(xu AS DECIMAL(19,0)))
               OVER w AS sxx,
             max(xu) OVER w AS xmax, min(xu) OVER w AS xmin
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CASE WHEN xmax > xmin THEN
             round((10.0 * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / (10.0 * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) + 0
           END AS slope_10
    FROM s
    WHERE rn >= 10
    """,
)
def q_user_trend_rolling(spark, sf_dir):
    """ROLLING least-squares trend per user — regression sufficient
    statistics as WINDOW sums over the last 10 events, the drift
    monitor that localizes `user_value_trend`'s whole-history slope to
    a moving frame (emitted only once the frame is full, so every
    slope covers exactly 10 points and n is the literal 10.0).

    Scale shape: ONE user-keyed shuffle; the frame is ROWS-bounded, so
    Spark's window evaluates it with constant per-row state — no
    per-user materialization of history.

    HASH-STABLE BY CONSTRUCTION (same design as `user_value_trend`,
    round-5 guard-band finding: raw rolling slopes sit as close as
    5.3e-13 to a rounding half-boundary): the frame sums are EXACT
    decimal/integer arithmetic over integer-microsecond x and
    nearest-even micro-unit-quantized y (rint ≡ round_even on the
    identical double — see `user_value_trend` for why a decimal cast
    of the raw double is not an option), so any window evaluation
    strategy (running state, segment tree, re-scan) yields
    bit-identical statistics; the closed form is then a fixed DOUBLE
    op sequence mirrored verbatim in the oracle, with the µ-unit/µs
    factors cancelling into value-per-second directly. Constant-x
    frames emit NULL via an exact integer min/max guard instead of
    engine-specific regr_slope semantics.
    """
    ev = _t(spark, sf_dir, "events")
    xu = F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(
        1704067200000000
    )
    yc = F.expr("CAST(rint(value * 1000000.0) AS BIGINT)")
    xd19 = F.col("xu").cast("decimal(19,0)")
    yd19 = F.col("yc").cast("decimal(19,0)")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        xu.alias("xu"),
        yc.alias("yc"),
        F.row_number().over(w_ord).alias("rn"),
    )
    w_frame = Window.partitionBy("user_id").orderBy("rn").rowsBetween(-9, 0)
    s = base.select(
        "user_id",
        "event_id",
        "rn",
        F.sum(F.col("xu").cast("decimal(20,0)")).over(w_frame).alias("sx"),
        F.sum(F.col("yc").cast("decimal(20,0)")).over(w_frame).alias("sy"),
        F.sum(xd19 * yd19).over(w_frame).alias("sxy"),
        F.sum(xd19 * xd19).over(w_frame).alias("sxx"),
        F.max("xu").over(w_frame).alias("xmax"),
        F.min("xu").over(w_frame).alias("xmin"),
    )
    n = F.lit(10.0)
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.where(F.col("rn") >= 10).select(
        "user_id",
        "event_id",
        F.when(F.col("xmax") > F.col("xmin"), _roundz(slope, 6)).alias(
            "slope_10"
        ),
    )


@register(
    "zipf_fit",
    """
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\\s+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    freq AS (SELECT token, count(*)::DOUBLE AS cnt FROM tok GROUP BY token),
    ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank
      FROM freq
    )
    SELECT count(*)::BIGINT AS vocab_size,
           round(regr_slope(ln(cnt), ln(rank)), 6) + 0 AS zipf_slope,
           round(regr_r2(ln(cnt), ln(rank)), 6) + 0 AS r2
    FROM ranked
    """,
)
def q_zipf(spark, sf_dir):
    """Zipf's-law fit of the corpus token-frequency distribution: OLS
    slope of log(frequency) on log(rank) (Zipfian text ≈ −1) plus R² —
    the corpus-health diagnostic that flags template/boilerplate-heavy
    or synthetic text (|slope| far from 1, low R²).

    Scale shape: token counts are one vocab-keyed shuffle; the global
    frequency rank comes from the DISTRIBUTED ranking kernel
    (`operators/ranking.py::global_row_number` — range partitioning +
    local ranks + cumulative offsets), NOT a partition-less Window
    funneling the vocabulary through one task; the regression is a
    constant-state 1-row aggregate. (cnt DESC, token) is a total
    order, so both engines rank ties identically.
    """
    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    ranked = global_row_number(
        freq, [F.col("cnt").desc(), F.col("token").asc()], name="rank"
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        _roundz(
            F.regr_slope(F.log(F.col("cnt")), F.log(F.col("rank"))), 6
        ).alias("zipf_slope"),
        _roundz(F.regr_r2(F.log(F.col("cnt")), F.log(F.col("rank"))), 6).alias(
            "r2"
        ),
    )


@register(
    "funnel_windowed_3step",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 1 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 1 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
           (SELECT count(*) FROM c)::BIGINT AS n_click_1h,
           (SELECT count(*) FROM p)::BIGINT AS n_purchase_1h
    """,
)
def q_funnel_windowed(spark, sf_dir):
    """STRICT chained-window funnel view→click→purchase: each stage
    must occur AFTER the previous stage's event and WITHIN 1 hour of
    it (anchored at the previous stage's first qualifying event) — the
    time-bound conversion semantic that `funnel_signup_purchase`'s
    unbounded first-timestamps form cannot express: a purchase a week
    after the click does not count here.

    Scale shape: three grouped min-aggregations, each keyed on
    user_id, with each stage's tiny (user, t_stage) frame joined back
    to the user-keyed event scan — every shuffle is on the SAME key,
    so the exchanges reuse one hash partitioning; the final counts are
    three 1-row aggregates broadcast-assembled into one row.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_v = v.agg(F.count(F.lit(1)).alias("n_view"))
    n_c = c.agg(F.count(F.lit(1)).alias("n_click_1h"))
    n_p = p.agg(F.count(F.lit(1)).alias("n_purchase_1h"))
    return n_v.crossJoin(F.broadcast(n_c)).crossJoin(F.broadcast(n_p))


@register(
    "bloom_filtered_revenue",
    f"""
    SELECT date_trunc('month', l_shipdate)::TIMESTAMP AS ship_month,
           count(*) AS n_items,
           round(sum({_DISC_PRICE_DEC}), 2)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
    GROUP BY 1
    """,
)
def q_bloom_revenue(spark, sf_dir):
    """Monthly revenue from one nation's suppliers, with the fact scan
    pre-filtered by an EXPLICIT Bloom runtime filter before the semi
    join (`operators/joins.py::bloom_semi_join`): the nation's supplier
    keys reduce to a fixed 16384-bit filter baked into the fact scan's
    predicate, so ~96% of lineitem rows (24/25 nations) die in the
    scan stage without shuffling; the real left_semi join then removes
    the Bloom's false positives, making the result IDENTICAL to the
    plain semi join the oracle states.

    This is the manual, assertable form of the runtime bloom filters
    AQE injects (`tests/test_plan_quality.py` pins the injected
    variant): at 100 TB the build side stays bounded — the collect is
    m_bits/64 words regardless of dim cardinality — and the probe is a
    narrow JVM expression with zero extra exchanges.
    """
    li = _t(spark, sf_dir, "lineitem")
    sup = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 3)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    filtered = bloom_semi_join(li, sup, "l_suppkey")
    return (
        filtered.groupBy(
            F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(_disc_price_dec()), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "winsorized_order_stats",
    """
    WITH b AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           count(*)::BIGINT AS n_orders,
           round(avg(o.o_totalprice), 4) AS raw_mean,
           round(avg(least(greatest(o.o_totalprice, b.p05), b.p95)), 4)
             AS winsorized_mean,
           sum(CASE WHEN o.o_totalprice < b.p05 OR o.o_totalprice > b.p95
                    THEN 1 ELSE 0 END)::BIGINT AS n_clipped
    FROM orders o JOIN b USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def q_winsorized(spark, sf_dir):
    """Winsorized mean per priority class (values clipped to the exact
    [p05, p95] band before averaging) — the tail-robust estimator that
    completes the robust-stats family with `order_mad_outliers`
    (flagging) and `length_p99_outliers` (filtering): here extreme
    values are RETAINED but bounded, the right call when tails are
    legitimate-but-noisy rather than junk.

    Scale shape: one grouped exact-percentile pass reduces to
    |priority| rows that broadcast back onto the fact scan; the
    clipped aggregation is a second single pass with map-side
    partials. Exact interpolated percentiles keep both engines
    bit-identical; at 100 TB substitute `approx_percentile` with the
    same two-pass plan.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    bounds = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    x = F.col("o_totalprice")
    clipped = F.least(F.greatest(x, F.col("p05")), F.col("p95"))
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg(x), 4).alias("raw_mean"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
            F.sum(
                F.when((x < F.col("p05")) | (x > F.col("p95")), 1).otherwise(0)
            ).alias("n_clipped"),
        )
    )


@register(
    "corpus_top_p_by_lang",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars, {_SQL_QUALITY_EXPR} AS quality
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars, quality,
             sum(n_chars) OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_chars,
             sum(n_chars) OVER (PARTITION BY lang) AS tot_chars
      FROM scored
    )
    SELECT lang, count(*)::BIGINT AS n_docs_kept,
           sum(n_chars)::BIGINT AS chars_kept,
           round(min(quality), 6) AS min_quality_kept
    FROM ranked
    WHERE cum_chars * 2 <= tot_chars
    GROUP BY lang
    """,
)
def q_corpus_top_p(spark, sf_dir):
    """Quality-ordered TOP-P corpus selection per language: walk each
    language's docs from highest quality down and keep them until half
    the language's characters are covered — the "keep the best p of
    the tokens, not the best p of the documents" curation rule
    (documents are unequal sizes, so a doc-count quota misallocates
    the char budget).

    Scale shape: ONE lang-keyed shuffle feeds both the running
    cumulative sum (ROWS frame — constant state) and the per-lang
    total (unbounded frame over the same partitioning — no second
    exchange); the integer comparison `cum*2 <= tot` avoids any
    float threshold at the cut boundary, so the kept set is exact on
    both engines. (quality DESC, doc_id) is a total order, making the
    walk deterministic under ties.
    """
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        T.quality_score(F.col("text")).alias("quality"),
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("lang")
    ranked = scored.select(
        "doc_id",
        "lang",
        "n_chars",
        "quality",
        F.sum("n_chars").over(w_cum).alias("cum_chars"),
        F.sum("n_chars").over(w_tot).alias("tot_chars"),
    )
    return (
        ranked.where(F.col("cum_chars") * 2 <= F.col("tot_chars"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").alias("chars_kept"),
            F.round(F.min("quality"), 6).alias("min_quality_kept"),
        )
    )


@register(
    "customer_abc_classes",
    """
    WITH rev AS (
      SELECT o_custkey, sum(o_totalprice::DECIMAL(12,2)) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, r,
             sum(r) OVER (ORDER BY r DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(r) OVER () AS tot
      FROM rev
    )
    SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                WHEN cum * 100 <= tot * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           count(*)::BIGINT AS n_customers,
           round(sum(r), 2)::DOUBLE AS revenue
    FROM ranked
    GROUP BY 1
    """,
)
def q_abc(spark, sf_dir):
    """ABC / Pareto classification of customers: walk customers from
    highest revenue down and label the ones covering the first 80% of
    total revenue 'A', the next 15% 'B', the tail 'C' — the inventory-
    analysis classic that tells you which accounts deserve the
    attention.

    Scale shape: revenue reduces per customer first (one fact-keyed
    shuffle); the GLOBAL running share then comes from the distributed
    prefix-sum kernel (`operators/ranking.py::global_cumsum` — range
    partition + per-partition offsets), never a partition-less Window
    over all customers. Money stays DECIMAL end-to-end, so the
    80/95 boundary comparisons (`cum*100 <= tot*80`, integer-scaled,
    no division) classify identically on both engines.
    """
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("r")
    )
    ranked = global_cumsum(
        rev, [F.col("r").desc(), F.col("o_custkey").asc()], "r", name="cum"
    )
    tot = rev.agg(F.sum("r").alias("tot"))
    cls = (
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(cls.alias("abc_class"), "r")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("r"), 2).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Round-3 additions: drift monitoring, null-safe joins, ER blocking,
# multi-touch attribution, JL random projection
# ---------------------------------------------------------------------------


@register(
    "drift_psi_report",
    """
    WITH b AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
    ),
    t AS (
      SELECT least(floor((o_totalprice - mn) * 10.0 / (mx - mn)), 9.0)::INT
               AS bucket,
             CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS cur
      FROM orders, b
    ),
    g AS (
      SELECT bucket,
             sum(1 - cur)::BIGINT AS n_ref,
             sum(cur)::BIGINT AS n_cur
      FROM t GROUP BY bucket
    ),
    tot AS (SELECT sum(n_ref)::BIGINT AS tr, sum(n_cur)::BIGINT AS tc FROM g)
    SELECT bucket, n_ref, n_cur,
           round((greatest(n_cur / tc, 0.000001)
                  - greatest(n_ref / tr, 0.000001))
                 * ln(greatest(n_cur / tc, 0.000001)
                      / greatest(n_ref / tr, 0.000001)), 6) + 0 AS psi_term
    FROM g, tot
    """,
)
def q_drift_psi(spark, sf_dir):
    """Population Stability Index between a reference period (orders
    before 1998) and the current period, over 10 equal-width price
    buckets — the standard drift monitor for "did this feature's
    distribution move between snapshots". Per-bucket PSI terms are
    emitted (their sum is the index; ≥0.2 conventionally = major
    shift).

    Scale shape: a 1-row global min/max aggregate broadcasts back onto
    a SINGLE fact scan that produces both periods' histograms at once
    (`sum(cur)` / `sum(1-cur)` — no second pass, no per-period scan);
    the PSI arithmetic then runs on ≤10 rows. Equal-width (not
    quantile) buckets keep the bucket function a pure expression of
    the broadcast bounds. The epsilon floor (1e-6) keeps empty buckets
    finite, mirrored identically in both engines.
    """
    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderdate")
    bounds = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            * 10.0
            / (F.col("mx") - F.col("mn"))
        ),
        F.lit(9.0).cast("bigint"),
    ).cast("int")
    cur = F.when(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"), 1
    ).otherwise(0)
    g = (
        o.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), cur.alias("cur"))
        .groupBy("bucket")
        .agg(
            F.sum(1 - F.col("cur")).alias("n_ref"),
            F.sum("cur").alias("n_cur"),
        )
    )
    tot = g.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    p_cur = F.greatest(F.col("n_cur") / F.col("tc"), F.lit(0.000001))
    p_ref = F.greatest(F.col("n_ref") / F.col("tr"), F.lit(0.000001))
    return g.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        _roundz((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


@register(
    "j12_nullsafe_full_join",
    """
    WITH ref AS (
      SELECT nullif(o_orderpriority, '3-MEDIUM') AS prio_grp,
             count(*)::BIGINT AS n_ref
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
    ),
    cur AS (
      SELECT nullif(o_orderpriority, '3-MEDIUM') AS prio_grp,
             count(*)::BIGINT AS n_cur
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1
    )
    SELECT coalesce(ref.prio_grp, cur.prio_grp, '3-MEDIUM') AS prio,
           coalesce(n_ref, 0)::BIGINT AS n_ref,
           coalesce(n_cur, 0)::BIGINT AS n_cur
    FROM ref FULL JOIN cur ON ref.prio_grp IS NOT DISTINCT FROM cur.prio_grp
    """,
)
def q_j12_nullsafe(spark, sf_dir):
    """Null-safe (`<=>` / IS NOT DISTINCT FROM) FULL OUTER join of two
    period summaries on a NULLABLE group key — the semantics class a
    plain equi-join silently breaks: with `=`, the NULL group from
    each side never matches and the comparison row for it is lost.
    Generalizes the reference's R `%in%`-with-NA handling
    (`varinfo-update.R:86-90`, where NA must compare positively) to
    joins.

    Scale shape: both sides pre-aggregate to |priority| rows before
    the join, so the null-safe comparison runs on tiny inputs; Spark
    plans `<=>` as a normal hash join key (null-safe equality is
    hashable — no nested-loop fallback).
    """
    o = _t(spark, sf_dir, "orders")
    grp = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    cut = F.lit("1998-01-01").cast("timestamp")
    ref = (
        o.where(F.col("o_orderdate") < cut)
        .groupBy(grp.alias("prio_grp"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    cur = (
        o.where(F.col("o_orderdate") >= cut)
        .groupBy(grp.alias("prio_grp"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    joined = ref.join(
        cur.withColumnRenamed("prio_grp", "prio_grp_c"),
        ref["prio_grp"].eqNullSafe(F.col("prio_grp_c")),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("prio_grp"), F.col("prio_grp_c"), F.lit("3-MEDIUM"))
        .alias("prio"),
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
    )


_ER_WINDOW = 5  # sorted-neighborhood slide width (Hernández/Stolfo 1995)


@register(
    "er_sorted_neighborhood",
    f"""
    WITH ranked AS (
      SELECT p_partkey, p_name,
             row_number() OVER (ORDER BY lower(p_name), p_partkey) AS rn
      FROM part
    )
    SELECT a.p_partkey AS a_partkey, b.p_partkey AS b_partkey,
           levenshtein(a.p_name, b.p_name)::INT AS name_dist
    FROM ranked a JOIN ranked b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {_ER_WINDOW}
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def q_er_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood entity-resolution blocking: sort all records
    by a blocking key (normalized name), slide a w-row window down the
    sorted order, and emit candidate pairs within the window that pass
    the expensive similarity predicate (Levenshtein ≤ 2) — the classic
    alternative to the all-pairs fuzzy join when records cluster under
    a sortable key. Complements `j1` (blocked fuzzy join) and
    `dedup_prefix_filter` (set-similarity) with the third canonical ER
    blocking scheme.

    Scale shape: the global sort order comes from the distributed
    rank kernel (`operators/ranking.py::global_row_number` — range
    partition + offset collect, no single-task Window); the windowed
    self-pairing is then an EQUI-join: each left row explodes to its w
    successor positions (`rn + 1 … rn + w`) and matches `b.rn` on a
    plain hash join — O(N·w) candidates total, never an all-pairs or
    range-condition nested loop. Levenshtein runs only on the N·w
    survivors, JVM-side.
    """
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    ranked = global_row_number(
        p, [F.lower(F.col("p_name")), F.col("p_partkey")], "rn"
    )
    left = ranked.select(
        F.col("p_partkey").alias("a_partkey"),
        F.col("p_name").alias("a_name"),
        F.explode(
            F.array(*[F.col("rn") + k for k in range(1, _ER_WINDOW + 1)])
        ).alias("rn"),
    )
    right = ranked.select(
        F.col("p_partkey").alias("b_partkey"),
        F.col("p_name").alias("b_name"),
        "rn",
    )
    dist = F.levenshtein(F.col("a_name"), F.col("b_name"))
    return (
        left.join(right, "rn")
        .where(dist <= 2)
        .select(
            "a_partkey",
            "b_partkey",
            dist.cast("int").alias("name_dist"),
        )
    )


@register(
    "multitouch_attribution",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts FROM events WHERE event_type = 'view'
    ),
    touch AS (
      SELECT p.event_id, p.value, v.ts AS view_ts,
             count(*) OVER (PARTITION BY p.event_id) AS n_touches
      FROM p JOIN v
        ON p.user_id = v.user_id
       AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
    )
    SELECT extract(hour FROM view_ts)::INT AS view_hour,
           count(*)::BIGINT AS n_touches,
           round(sum(value / n_touches), 4) AS credited_value
    FROM touch
    GROUP BY 1
    """,
)
def q_multitouch(spark, sf_dir):
    """Linear multi-touch attribution: every `view` in the hour before
    a `purchase` by the same user shares the purchase value equally
    (credit = value / n_touches); credited value rolls up by the hour-
    of-day of the TOUCH, answering "which hours' impressions actually
    drive revenue". The multi-touch generalization of the single-touch
    `j11_attribution_join`.

    Scale shape: the touch join is user-keyed EQUI with a residual
    time-range predicate — one shuffle on user_id, per-user workloads
    bounded by activity (skewed users are the `j8` salting case). The
    per-purchase touch count is a purchase-keyed Window over the join
    output (bounded state: touches of one purchase), and the final
    rollup is a 24-group aggregate with map-side partials.
    """
    e = _t(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    touch = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("view_ts") < F.col("ts")),
    ).withColumn(
        "n_touches", F.count(F.lit(1)).over(Window.partitionBy("event_id"))
    )
    return (
        touch.groupBy(F.hour("view_ts").cast("int").alias("view_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum(F.col("value") / F.col("n_touches")), 4).alias(
                "credited_value"
            ),
        )
    )


def _jl_signs(dim: int = 64, k: int = 16) -> list[list[float]]:
    """Deterministic ±1 sign matrix for the Johnson-Lindenstrauss
    projection, derived from md5 so BOTH engines embed the SAME
    literals (no engine-hash parity needed)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"jl-{d}-{j}".encode()).hexdigest(), 16) % 2
            else -1.0
            for d in range(dim)
        ]
        for j in range(k)
    ]


_JL_K = 16
_JL_SIGNS = _jl_signs(64, _JL_K)


def _jl_sql_proj_sq(j: int) -> str:
    lits = ", ".join(str(s) for s in _JL_SIGNS[j])
    p = (
        f"list_aggregate(list_transform(embedding, "
        f"(x, i) -> x * ([{lits}]::DOUBLE[])[i]), 'sum')"
    )
    return f"({p} * {p})"


@register(
    "embedding_random_projection",
    f"""
    WITH r AS (
      SELECT label,
             sqrt(({" + ".join(_jl_sql_proj_sq(j) for j in range(_JL_K))})
                  / {_JL_K}.0)
             / sqrt(list_aggregate(list_transform(embedding, x -> x * x),
                                   'sum')) AS ratio
      FROM embeddings
    )
    SELECT label, count(*)::BIGINT AS n_vecs,
           round(avg(ratio), 4) AS mean_distortion,
           round(min(ratio), 4) AS min_distortion,
           round(max(ratio), 4) AS max_distortion
    FROM r GROUP BY label
    """,
)
def q_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64→16 dims with a
    deterministic ±1 sign matrix (Achlioptas 2001), reporting the
    norm-distortion ratio ‖Pv‖/√k ÷ ‖v‖ per label — the correctness
    certificate of any dimensionality-reduction stage feeding ANN /
    clustering (ratios concentrate near 1.0).

    Scale shape: the sign matrix is 64×16 LITERALS baked into the
    plan (md5-derived in Python, identically embedded in the oracle
    SQL — zero per-row hashing), so the projection is a map-side
    `zip_with`+fold per output dim: no shuffle, no UDF, whole-stage
    codegen. The only exchange is the |labels|-group rollup. At 100 TB
    this is the cheap preprocessing pass before `similarity_*`; left-
    to-right fold order matches the oracle's `list_aggregate` so the
    doubles agree bit-for-bit before the round(…, 4).
    """
    emb = _t(spark, sf_dir, "embeddings")

    def proj(j: int):
        signs = F.array(*[F.lit(s) for s in _JL_SIGNS[j]])
        return F.aggregate(
            F.zip_with(F.col("embedding"), signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # materialize the 16 projections in ONE array, then square via
    # transform: writing `p * p` directly duplicates each whole
    # zip_with-fold in the Project (Spark does not CSE inside the
    # expression tree — the r5->r6 regression was exactly this 2x),
    # while an array element is computed once. The transform+aggregate
    # fold stays left-to-right, matching the oracle's `+` chain
    # bit-for-bit.
    proj_arr = F.array(*[proj(j) for j in range(_JL_K)])
    sum_sq = F.aggregate(
        F.transform(proj_arr, lambda v: v * v),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ratio = F.sqrt(sum_sq / float(_JL_K)) / F.sqrt(norm_sq)
    return (
        emb.select("label", ratio.alias("ratio"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("ratio"), 4).alias("mean_distortion"),
            F.round(F.min("ratio"), 4).alias("min_distortion"),
            F.round(F.max("ratio"), 4).alias("max_distortion"),
        )
    )


@register(
    "j13_jw_blocked_pairs",
    """
    WITH n AS (
      SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS blk FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
    FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
    """,
)
def q_j13_jw(spark, sf_dir):
    """Jaro-Winkler similarity over first-word-blocked name pairs — the
    record-linkage metric (prefix-weighted, Winkler 1990) joining the
    Levenshtein family (`j1`/`j10`) as the second string measure. The
    blocking key is part of the QUERY CONTRACT (pairs sharing the first
    token), so both engines enumerate the identical candidate set and
    every JW value is hash-pinned against DuckDB's built-in
    `jaro_winkler_similarity` — the Python kernel
    (`operators/fuzzy_join.py::jaro_winkler`) is parity-locked to it.

    Scale shape: candidates come from a DISTINCT-key blocking
    equi-join — cost is Σ_blocks n_b², which is only safe while block
    density is bounded (here the name pool is a fixed adjective×noun
    vocabulary, so blocks are constant-size; a first-word block over
    an UNBOUNDED pool degenerates toward rows²/|blocks| and must be
    swapped for the `j10` deletion-neighborhood scheme, leaving the
    verify stage unchanged). JW — inexpressible in built-in
    functions — runs as an Arrow-batched pandas UDF on the surviving
    pairs only, the sanctioned slow path.
    """
    names = (
        _t(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("blk", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)))
    )
    a = names.select(F.col("p_name").alias("name_a"), "blk")
    b = names.select(F.col("p_name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.round(jaro_winkler(F.col("name_a"), F.col("name_b")), 6).alias(
                "jw_sim"
            ),
        )
    )


@register(
    "j14_qgram_longtext_join",
    """
    WITH s AS (
      SELECT doc_id, substring(text, 1, 160) AS s
      FROM documents
      WHERE doc_id < 1000 AND length(substring(text, 1, 160)) >= 52
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.s, b.s)::INTEGER AS edit_dist
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.s, b.s) <= 12
    """,
)
def q_j14_qgram_longtext_join(spark, sf_dir):
    """Long-string edit-distance self-join (VERDICT r7 item 7):
    paragraph-length near-verbatim matching under bounded edit
    distance via the Ed-Join q-gram prefix filter
    (``operators/fuzzy_join.py::qgram_edit_pairs``) — the candidate
    stage the short-key deletion-neighborhood blocking (j1/j10)
    cannot provide for 150-char strings. Rare-first q-gram prefixes
    (q=4, d=12 → 49-gram prefix) equi-join candidates, the in-join
    length filter prunes, and the BANDED ``levenshtein(_, _, 12)``
    verify restores exact precision — output is bit-identical to the
    all-pairs oracle. doc_id < 1000 bounds the ORACLE's quadratic cost
    at big SFs (a no-op at sf0.01); the Spark side has no quadratic
    stage at any SF (plan-pinned)."""
    from common_survey_data_pipeline_spark.operators.fuzzy_join import (
        qgram_edit_pairs,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 1000)
        .select("doc_id", F.col("text").substr(1, 160).alias("s"))
    )
    return qgram_edit_pairs(docs, "s", "doc_id", max_dist=12, q=4)


@register(
    "j15_editdist_mixed_lengths",
    """
    WITH s AS (
      SELECT doc_id * 2 AS sid,
             substring(text, 1, (5 + (doc_id * 7) % 296)::INT) AS s
      FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id * 2 + 1,
             substring(text, 1, (6 + (doc_id * 7) % 296)::INT)
      FROM documents WHERE doc_id < 400
    )
    SELECT a.sid AS id_a, b.sid AS id_b,
           levenshtein(a.s, b.s)::INTEGER AS edit_dist
    FROM s a JOIN s b ON a.sid < b.sid
    WHERE a.s IS NOT NULL AND b.s IS NOT NULL
      AND levenshtein(a.s, b.s) <= 2
    """,
)
def q_j15_editdist_mixed(spark, sf_dir):
    """Mixed-length edit-distance self-join (VERDICT r8 item 7): the
    corpus spans ~5–300 chars, a regime NEITHER single blocking scheme
    covers alone — deletion neighborhoods are O(len^d) variants
    (hopeless past ~50 chars) while the Ed-Join q-gram prefix filter
    is incomplete below q·(max_dist+1) chars. The composed operator
    (``operators/fuzzy_join.py::editdist_pairs_mixed``) splits the
    pool at that cutoff internally, runs each regime through its
    proven exact path, and stitches the boundary with a
    ``max_dist``-wide overlap band (the length filter makes every
    cross-regime pair complete inside the deletion pool).

    Corpus: two prefix-truncations per document, lengths
    ``5 + (doc_id·7) % 296`` and one char longer — a planted
    distance-1 pair at EVERY length from 5 to 300 (distance 0 where
    the text runs out first), plus whatever cross-document collisions
    the corpus carries. Oracle: literal all-pairs levenshtein ≤ 2
    (doc_id < 400 bounds the oracle's quadratic cost; the Spark side
    has no quadratic stage — plan-pinned)."""
    from common_survey_data_pipeline_spark.operators.fuzzy_join import (
        editdist_pairs_mixed,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    pool = docs.select(
        (F.col("doc_id") * 2).alias("sid"),
        F.expr("substring(text, 1, CAST(5 + (doc_id * 7) % 296 AS INT))").alias("s"),
    ).unionByName(
        docs.select(
            (F.col("doc_id") * 2 + 1).alias("sid"),
            F.expr(
                "substring(text, 1, CAST(6 + (doc_id * 7) % 296 AS INT))"
            ).alias("s"),
        )
    )
    return editdist_pairs_mixed(pool, "s", "sid", max_dist=2, q=4)


# EWMA weights 0.9^k for k = 0..19 as SHARED LITERALS: both engines
# index the same 20 doubles instead of each calling its own libm
# pow() (JVM Math.pow and C libm may differ in the last ulp), so the
# weighted sums are bit-identical given the identical fold order.
# repr() round-trips each double exactly through both SQL parsers.
_EWMA_W = [0.9**k for k in range(20)]
_EWMA_W_SQL = "[" + ", ".join(repr(w) for w in _EWMA_W) + "]"


@register(
    "ewma_user_value",
    f"""
    WITH w AS (
      SELECT user_id, event_id, value,
             list(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS 19 PRECEDING) AS arr
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id, round(value, 4) AS value,
           round(
             list_aggregate(list_transform(arr,
               (x, i) -> x * ({_EWMA_W_SQL}::DOUBLE[])[len(arr) - i + 1]),
               'sum')
             / list_aggregate(list_transform(arr,
               (x, i) -> ({_EWMA_W_SQL}::DOUBLE[])[len(arr) - i + 1]),
               'sum'),
             6) + 0 AS ewma
    FROM w
    """,
)
def q_ewma(spark, sf_dir):
    """Exponentially weighted moving average (α=0.1, window truncated
    at 20 rows) of each user's purchase values — the recursion
    y_t = αx_t + (1-α)y_{t-1} re-expressed as a CLOSED-FORM weighted
    sum over a bounded ROWS frame, because a literal recursion would
    serialize per key and the untruncated closed form overflows
    (0.9^-t grows without bound). Truncation error is ≤0.9^20 ≈ 12%
    of weight mass, renormalized away by the explicit weight-sum
    divisor.

    Scale shape: ONE user-keyed shuffle for the window; per-row state
    is a ≤20-element array folded JVM-side (`transform`+`aggregate`
    HOFs — no UDF); (ts, event_id) is a total order so the frame
    content is deterministic.

    HASH-STABLE BY CONSTRUCTION (round-5 guard-band finding: raw ewma
    values at sf0.1 sit 2.8e-11 from a rounding half-boundary): the
    weights are the module-level `_EWMA_W` DOUBLE LITERALS embedded in
    both plans — no engine-local pow() — and the left-to-right fold
    order mirrors the oracle's `list_aggregate` exactly, so identical
    inputs go through an identical double op sequence on both engines
    and the quotient is bit-identical before the round.
    """
    e = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    arr = F.collect_list("value").over(w)
    n = F.size(F.col("arr"))
    weights = F.array(*[F.lit(wk) for wk in _EWMA_W])
    # Spark HOF lambda index is 0-based (DuckDB's is 1-based): element
    # i of an n-array gets weight 0.9^(n-1-i) — newest (i = n-1) gets
    # 0.9^0 == _EWMA_W[0], matching the oracle's [len(arr) - i + 1]
    # with i starting at 1 (element_at is 1-based: index n-1-i+1)
    num = F.aggregate(
        F.transform(
            F.col("arr"), lambda x, i: x * F.element_at(weights, n - i)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            F.col("arr"), lambda x, i: F.element_at(weights, n - i)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.select("user_id", "event_id", "value", arr.alias("arr"))
        .select(
            "user_id",
            "event_id",
            F.round("value", 4).alias("value"),
            _roundz(num / den, 6).alias("ewma"),
        )
    )


@register(
    "a9_sketch_intersection",
    """
    WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    est AS (
      SELECT approx_count_distinct(CASE WHEN event_type = 'view'
                                        THEN user_id END) AS a,
             approx_count_distinct(CASE WHEN event_type = 'purchase'
                                        THEN user_id END) AS b,
             approx_count_distinct(user_id) AS u
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    x AS (
      SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
             (SELECT count(*) FROM p)::BIGINT AS n_purchase,
             (SELECT count(*) FROM (SELECT user_id FROM v
                                    INTERSECT SELECT user_id FROM p))::BIGINT
               AS exact_both
    )
    SELECT n_view, n_purchase, exact_both,
           abs((est.a + est.b - est.u) - exact_both)
             <= 0.10 * (n_view + n_purchase - exact_both) AS approx_ok
    FROM x, est
    """,
)
def q_a9_sketch_intersection(spark, sf_dir):
    """Set-algebra on cardinality sketches: |viewers ∩ purchasers|
    estimated by HLL inclusion-exclusion (|A| + |B| − |A∪B|, three
    `approx_count_distinct` passes over the SAME scan) and certified
    against the exact intersection with a relative-error boolean BOTH
    engines compute — each engine runs its OWN HLL estimator against
    the shared exact counts, so the hash-compared boolean asserts that
    both implementations land inside the tolerance (the `a6` contract
    pattern extended from single cardinalities to sketch algebra).
    Intersection via inclusion-exclusion inflates relative error as
    the intersection shrinks, so the tolerance is stated on the
    UNION's scale (10% of |A∪B|), the honest bound for this estimator.

    Scale shape: the exact path is one distinct-shuffle per side at
    test SF; at 100 TB you keep only the sketch path — three HLL
    registers (fixed KB each) merged map-side, zero extra shuffles,
    while the exact columns come from this query run on a sample
    partition as the recurring certification job.
    """
    e = _t(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select("user_id")
    p = e.where(F.col("event_type") == "purchase").select("user_id")
    n_view = v.distinct().count()
    n_purch = p.distinct().count()
    exact_both = v.intersect(p).count()
    est = (
        e.where(F.col("event_type").isin("view", "purchase"))
        .agg(
            F.approx_count_distinct(
                F.when(F.col("event_type") == "view", F.col("user_id")), 0.02
            ).alias("a"),
            F.approx_count_distinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id")),
                0.02,
            ).alias("b"),
            F.approx_count_distinct("user_id", 0.02).alias("u"),
        )
        .collect()[0]
    )
    approx_both = est["a"] + est["b"] - est["u"]
    union_exact = n_view + n_purch - exact_both
    ok = abs(approx_both - exact_both) <= 0.10 * union_exact
    return spark.createDataFrame(
        [(n_view, n_purch, exact_both, bool(ok))],
        "n_view BIGINT, n_purchase BIGINT, exact_both BIGINT, approx_ok BOOLEAN",
    )


@register(
    "rolling_median_user_value",
    """
    WITH w AS (
      SELECT user_id, event_id, value,
             list_sort(list(value) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS 19 PRECEDING)) AS arr
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id, round(value, 4) AS value,
           round((arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1]) / 2.0,
                 6) AS rolling_median
    FROM w
    """,
)
def q_rolling_median(spark, sf_dir):
    """Rolling MEDIAN of each user's last ≤20 purchase values — the
    order-statistic sibling of `w3_rolling_avg` and the robust local
    baseline for spike detection (a median survives the outliers that
    drag a rolling mean). SQL window functions have no
    `median() OVER (ROWS ...)`; the bounded frame makes it exact and
    cheap anyway: collect the ≤20-element frame, `sort_array`, index
    the middle pair — all JVM HOFs, no UDF. Even-length frames
    interpolate the two middle elements, the standard definition,
    written identically in both engines.

    Scale shape: identical to `ewma_user_value` — ONE user-keyed
    shuffle, constant per-row state (a ≤20 array), whole-stage
    codegen throughout. The unbounded-median analogue is
    `median_order_value` (two-pass distributed selection); this is
    the windowed form that never needs it.
    """
    e = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(F.col("arr"))
    lo = F.element_at(F.col("arr"), ((n + 1) / 2).cast("int"))
    hi = F.element_at(F.col("arr"), (n / 2).cast("int") + 1)
    return (
        e.select("user_id", "event_id", "value", arr.alias("arr"))
        .select(
            "user_id",
            "event_id",
            F.round("value", 4).alias("value"),
            F.round((lo + hi) / 2.0, 6).alias("rolling_median"),
        )
    )


# ---------------------------------------------------------------------------
# Round 6: substring-level exact dedup + persisted-band incremental dedup
# ---------------------------------------------------------------------------

def _sql_pos_grams(k: int, normalize: bool = False) -> str:
    """DuckDB positional word k-grams of the ``documents`` table:
    ``(doc_id, pos, gram)`` with 1-based pos — the SQL twin of the
    ``posexplode(word_ngrams(...))`` step in
    ``operators/dedup.py::substring_dup_spans``. ``normalize=True``
    mirrors the operator's near-verbatim profile: tokens case-folded
    and stripped to ASCII alphanumerics in place (same ASCII class as
    the Spark side — Java/RE2 unicode classes do not agree)."""
    toks = _SQL_TOKS
    if normalize:
        toks = (
            f"list_transform({toks}, "
            "t -> regexp_replace(lower(t), '[^a-z0-9]', '', 'g'))"
        )
    cat = " || ' ' || ".join(f"toks[pos+{j}]" for j in range(k))
    return f"""
      SELECT doc_id, pos, {cat} AS gram
      FROM (SELECT doc_id, {toks} AS toks FROM documents),
           unnest(generate_series(1, len(toks) - {k - 1})) AS u(pos)
    """


def _sql_span_query(k: int, normalize: bool = False) -> str:
    """The full span-report oracle for any (k, normalize) profile —
    shared by the fixed-k, variable-k and near-verbatim registrations
    so the algebra can never drift between them."""
    return f"""
    WITH g AS ({_sql_pos_grams(k, normalize)}),
    d AS (SELECT gram FROM g GROUP BY gram
          HAVING min(doc_id) <> max(doc_id)),
    hits AS (SELECT doc_id, pos FROM g JOIN d USING (gram)),
    runs AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hits
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {k - 1} AS BIGINT) AS span_end,
           CAST(max(pos) + {k - 1} - min(pos) + 1 AS BIGINT) AS span_tokens,
           count(*) AS n_dup_grams
    FROM runs GROUP BY doc_id, grp
    """


@register("substring_dup_spans", _sql_span_query(6))
def q_substring_dup_spans(spark, sf_dir):
    """Substring-level exact dedup: maximal token runs whose every
    6-gram window recurs verbatim in another document — the repeated-
    passage class doc-level dedup cannot see (license headers pasted
    mid-document, templated paragraphs). Spans, not booleans: the
    output localizes WHICH tokens to cut from each doc.

    ``operators/dedup.py::substring_dup_spans`` — hashed-shingle
    equi-joins + a per-document gaps-and-islands window; no suffix
    structures, no all-pairs stage (plan-pinned in
    ``tests/test_plan_quality.py``). Oracle: the identical span
    algebra on gram STRINGS (DuckDB has no xxhash64 — equality on the
    string key is the same relation the 64-bit hash key induces,
    collision-free at any realistic gram count)."""
    # single-row-group leaf: the gram explode+hash map stage otherwise
    # runs on ONE task (see parallelism_floor — measured 7.4s → 1.2s at
    # sf0.1; provable no-op on multi-file corpora)
    docs = parallelism_floor(_t(spark, sf_dir, "documents"))
    return substring_dup_spans(docs, "text", "doc_id", k=6)


@register("substring_dup_spans_k12", _sql_span_query(12))
def q_substring_dup_spans_k12(spark, sf_dir):
    """The VARIABLE-k form of ``substring_dup_spans`` (VERDICT r6 item
    4): k = 12 demands a 12-token verbatim window before a position
    counts, so only LONGER duplicated passages survive — the tokens a
    k=12 span covers are provably a subset of the k=6 coverage
    (every duplicate 12-gram window contains only duplicate 6-gram
    windows; property-tested in ``tests/test_substring_spans.py``).
    Same operator, same oracle algebra via the shared
    ``_sql_span_query`` template — only the parameter moves."""
    docs = parallelism_floor(_t(spark, sf_dir, "documents"))
    return substring_dup_spans(docs, "text", "doc_id", k=12)


@register("substring_dup_spans_norm", _sql_span_query(6, normalize=True))
def q_substring_dup_spans_norm(spark, sf_dir):
    """The NEAR-VERBATIM form of ``substring_dup_spans``: tokens are
    case-folded and punctuation-stripped in place (positions
    preserved) before gram hashing, so passages that differ only by
    casing or punctuation — the classic templated-boilerplate evasion
    of exact substring dedup — still collide. Verbatim hits are a
    subset of normalized hits by construction (normalization only
    merges gram classes; property-tested). Spark:
    ``substring_dup_spans(..., normalize=True)`` — one extra
    ``transform`` over the token array, everything else identical;
    oracle: the same algebra over identically-normalized tokens
    (shared ASCII regex — Java and RE2 unicode classes diverge)."""
    docs = parallelism_floor(_t(spark, sf_dir, "documents"))
    return substring_dup_spans(docs, "text", "doc_id", k=6, normalize=True)


def _scoped_band_table(spark, sf_dir: str, prefix: str) -> str:
    """Session-scoped managed-table name: the sf-dir leaf plus the
    Spark application id, so two sessions running the same registered
    query against one shared warehouse can never collide on (or
    delete) each other's table."""
    import re as _re

    leaf = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    app = spark.sparkContext.applicationId
    return _re.sub(r"[^0-9a-zA-Z_]+", "_", f"{prefix}_{leaf}_{app}")


def _reset_managed_table(spark, table: str) -> None:
    """Idempotent pre-write reset. A fresh session's in-memory catalog
    does not know a table whose directory persists in the warehouse,
    and saveAsTable then refuses with LOCATION_ALREADY_EXISTS — drop
    the catalog entry AND remove a stale LOCAL location. The rmtree
    only fires for file:// warehouses (the per-run local sandbox);
    against a remote warehouse we never delete storage we can't prove
    is ours — the app-id-scoped name already guarantees no collision.
    """
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        shutil.rmtree(f"{wh.path}/{table}", ignore_errors=True)


@register(
    "dedup_incremental_persisted",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    )
    SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
           round(len(list_intersect(b.shingles, c.shingles))::DOUBLE
                 / NULLIF(len(list_distinct(b.shingles || c.shingles)), 0),
                 6) AS jaccard_sim
    FROM sh b JOIN sh c
      ON (b.doc_id % 10 = 0) AND (c.doc_id % 10 <> 0)
    WHERE len(b.shingles) > 0 AND len(c.shingles) > 0
      AND round(len(list_intersect(b.shingles, c.shingles))::DOUBLE
                / NULLIF(len(list_distinct(b.shingles || c.shingles)), 0),
                6) >= 0.5
    """,
)
def q_dedup_incremental_persisted(spark, sf_dir):
    """The PERSISTED form of ``dedup_incremental``: the corpus band-key
    table is written ONCE as a bucketed table
    (``operators/dedup.py::minhash_band_keys`` +
    ``sources/bucketing.py::write_bucketed``, bucketed on ``band_key``)
    and the fresh batch joins against the STORED table —
    ``incremental_pairs_vs_band_table`` recomputes zero corpus
    signatures and the corpus side of the candidate join runs with no
    Exchange (bucket metadata carries the partitioning; locked by
    ``tests/test_dedup_incremental_persisted.py``). Same split and
    same exact-Jaccard oracle as ``dedup_incremental`` — identical
    output through a different (write-once) physical path; the
    O(batch)-not-O(corpus) increment cost is measured in SCALING.md.

    Recall caveat (shared with ``dedup_incremental``): the Spark path
    is banded LSH (r=4, b=16) while the oracle is exact all-pairs
    Jaccard ≥ 0.5, so a true pair sitting exactly AT the threshold is
    banded-candidate with probability 1-(1-0.5⁴)¹⁶ ≈ 0.645 — oracle
    greenness relies on the synthetic near-dup pairs' Jaccard being
    high (j=0.8 → 0.9992, j=0.9 → ~1-3.5e-8), which TESTDATA.md's
    mutated-copy generator guarantees. A production corpus with
    borderline pairs needs more bands / shorter rows, not this default.
    """
    docs = _t(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    table = _scoped_band_table(spark, sf_dir, "band_corpus")
    _reset_managed_table(spark, table)
    write_band_table(spark, corpus, table, 8, "text", "doc_id")
    return incremental_pairs_vs_band_table(
        spark, table, corpus, batch, "text", "doc_id", threshold=0.5
    )


@register(
    "dedup_band_table_appended",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    )
    SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
           round(len(list_intersect(b.shingles, c.shingles))::DOUBLE
                 / NULLIF(len(list_distinct(b.shingles || c.shingles)), 0),
                 6) AS jaccard_sim
    FROM sh b JOIN sh c
      ON (b.doc_id % 10 = 0) AND (c.doc_id % 10 <> 0)
    WHERE len(b.shingles) > 0 AND len(c.shingles) > 0
      AND round(len(list_intersect(b.shingles, c.shingles))::DOUBLE
                / NULLIF(len(list_distinct(b.shingles || c.shingles)), 0),
                6) >= 0.5
    """,
)
def q_dedup_band_table_appended(spark, sf_dir):
    """Full band-table LIFECYCLE under the same pair contract as
    ``dedup_incremental_persisted``: the corpus index is built from
    the first half of the corpus, the second half arrives later as an
    ingest batch APPENDED through the stored bucket spec
    (``operators/dedup.py::append_band_table`` — O(batch), computed
    with the table's own persisted LSH parameters, never a caller
    knob), the accumulated small files are then COMPACTED to one file
    per bucket with zero shuffle
    (``compact_band_table`` — bucketed-scan read, per-bucket merge,
    shadow-table swap), and the increment query runs against the
    appended-then-compacted table. Output must be IDENTICAL to
    querying a fresh-built full-corpus table — that equivalence is
    what makes append+compact a safe continuous-ingestion design, and
    the no-corpus-Exchange join property surviving the lifecycle is
    plan-locked in ``tests/test_band_table_lifecycle.py``. Oracle:
    the exact all-pairs Jaccard relation (same recall caveat as
    ``dedup_incremental_persisted``).
    """
    docs = _t(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    first = corpus.where(F.col("doc_id") % 10 <= 5)
    later = corpus.where(F.col("doc_id") % 10 > 5)
    table = _scoped_band_table(spark, sf_dir, "band_lifecycle")
    _reset_managed_table(spark, table)
    write_band_table(spark, first, table, 8, "text", "doc_id")
    append_band_table(spark, later, table, "text", "doc_id")
    compact_band_table(spark, table)
    return incremental_pairs_vs_band_table(
        spark, table, corpus, batch, "text", "doc_id", threshold=0.5
    )


@register(
    "stream_dedup_ingest",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles,
             CASE WHEN doc_id % 10 <> 0 THEN 0
                  WHEN (doc_id // 10) % 2 = 0 THEN 1 ELSE 2 END AS b
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    )
    SELECT a.doc_id AS batch_id, c.doc_id AS corpus_id,
           round(len(list_intersect(a.shingles, c.shingles))::DOUBLE
                 / NULLIF(len(list_distinct(a.shingles || c.shingles)), 0),
                 6) AS jaccard_sim
    FROM sh a JOIN sh c ON a.b > c.b
    WHERE len(a.shingles) > 0 AND len(c.shingles) > 0
      AND round(len(list_intersect(a.shingles, c.shingles))::DOUBLE
                / NULLIF(len(list_distinct(a.shingles || c.shingles)), 0),
                6) >= 0.5
    """,
)
def q_stream_dedup_ingest(spark, sf_dir):
    """Batch REPLAY of the streaming dedup-ingest loop (VERDICT r7
    item 4; the REAL stream — ``streaming/ingest.py::
    run_ingest_vs_band_table``, a ``foreachBatch`` over a JSONL drop
    dir — is pytest-locked batch≡stream in
    ``tests/test_streaming_ingest.py`` with the no-corpus-Exchange
    lock held inside every micro-batch plan). Two ingest batches
    arrive after the seed corpus: each emits its near-dup pairs
    against EVERYTHING ingested before it via the persisted band
    table, then appends its own band keys through the stored bucket
    spec — so batch 2's pairs include hits on batch 1. The oracle is
    the exact all-pairs (later batch, earlier batch-or-seed) Jaccard
    at ≥ 0.5. p0 is checkpointed BEFORE the append — lazy evaluation
    would otherwise re-read the table batch 1 just extended and
    double-count."""
    docs = _t(spark, sf_dir, "documents")
    seed = docs.where(F.col("doc_id") % 10 != 0)
    tens_even = F.expr("(doc_id div 10) % 2 = 0")
    b0 = docs.where((F.col("doc_id") % 10 == 0) & tens_even)
    b1 = docs.where((F.col("doc_id") % 10 == 0) & ~tens_even)
    table = _scoped_band_table(spark, sf_dir, "stream_ingest_band")
    _reset_managed_table(spark, table)
    write_band_table(spark, seed, table, 8, "text", "doc_id")
    p0 = incremental_pairs_vs_band_table(
        spark, table, seed, b0, "text", "doc_id", threshold=0.5
    ).localCheckpoint(eager=True)
    append_band_table(spark, b0, table, "text", "doc_id")
    p1 = incremental_pairs_vs_band_table(
        spark, table, seed.unionByName(b0), b1, "text", "doc_id",
        threshold=0.5,
    )
    return p0.unionByName(p1)


@register(
    "substring_dedup_clean",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    g AS ({_sql_pos_grams(6)}),
    d AS (SELECT gram FROM g GROUP BY gram
          HAVING min(doc_id) <> max(doc_id)),
    hits AS (SELECT doc_id, pos FROM g JOIN d USING (gram)),
    cut AS (SELECT DISTINCT doc_id, pos + off AS tpos
            FROM hits, unnest(generate_series(0, 5)) AS o(off)),
    tok AS (SELECT doc_id, tpos, toks[tpos] AS token
            FROM t, unnest(generate_series(1, len(toks))) AS u(tpos)),
    kept AS (
      SELECT tok.doc_id, tok.tpos, tok.token
      FROM tok ANTI JOIN cut
        ON tok.doc_id = cut.doc_id AND tok.tpos = cut.tpos
    )
    SELECT t.doc_id,
           len(t.toks)::BIGINT AS n_tokens,
           (len(t.toks) - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
           coalesce(k.cleaned, '') AS cleaned_text
    FROM t LEFT JOIN (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(token, ' ' ORDER BY tpos) AS cleaned
      FROM kept GROUP BY doc_id
    ) k USING (doc_id)
    """,
)
def q_substring_dedup_clean(spark, sf_dir):
    """The actionable companion of ``substring_dup_spans``: CUT every
    token covered by a cross-document duplicate 6-gram window and
    re-emit the cleaned text per document (Lee et al.'s aggressive
    remove-all-occurrences policy). Untouched docs round-trip
    verbatim-tokenized with ``n_removed = 0`` — the full-corpus
    transform a curation pipeline actually applies after the span
    report localizes the damage.

    ``operators/dedup.py::substring_dedup_clean`` — shared hashed-
    shingle hit stage, O(hits·k) cut-set explode, anti-join rebuild
    with per-doc-bounded ``array_sort(collect_list)``. Oracle: the
    identical cut algebra in DuckDB (string_agg ORDER BY position).
    """
    from common_survey_data_pipeline_spark.operators.dedup import (
        substring_dedup_clean,
    )

    docs = parallelism_floor(_t(spark, sf_dir, "documents"))
    return substring_dedup_clean(docs, "text", "doc_id", k=6)


# ---------------------------------------------------------------------------
# Round 6: URL canonicalization + host-level rollup (web-corpus ETL)
# ---------------------------------------------------------------------------

# The synthetic tables carry no URL column, so both engines BUILD the
# same messy URL from (doc_id, source) with this SHARED SQL fragment —
# valid Spark SQL and DuckDB SQL verbatim (same CASE/||/CAST AS STRING
# semantics), so the normalization operators on each side see
# bit-identical inputs. Mixed-case scheme/host, www. prefixes, default
# and non-default ports, tracking params, and fragments are all
# exercised.
_SQL_MESSY_URL = """
CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END || '://' ||
CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
source || '.Example.COM' ||
CASE WHEN doc_id % 5 = 0 THEN ':8080'
     WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END ||
'/Docs/' || CAST(doc_id % 7 AS STRING) || '/page' ||
'?utm_source=feed&id=' || CAST(doc_id AS STRING) ||
CASE WHEN doc_id % 4 = 0 THEN '&ref=abc' ELSE '' END ||
CASE WHEN doc_id % 6 = 0 THEN '&UTM_Medium=rss&Gclid=z9' ELSE '' END ||
'&utm_campaign=x#sec' || CAST(doc_id % 3 AS STRING)
"""

# DuckDB twin of functions/url.py (no parse_url there): regexp parse +
# the identical canonicalization rules.
_SQL_URL_CANON = f"""
  WITH u AS (SELECT doc_id, lang, n_chars, {_SQL_MESSY_URL} AS url
             FROM documents),
  p AS (
    SELECT doc_id, lang, n_chars, url,
      lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      regexp_replace(
        lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)),
        '^www\\.', '') AS host,
      regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:([0-9]+)', 1) AS port,
      regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
      array_to_string(
        list_filter(
          string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
          pp -> pp <> ''
                AND NOT regexp_matches(pp, '(?i)^(utm_[a-z]+|gclid|fbclid)=')),
        '&') AS kept
    FROM u
  ),
  canon AS (
    SELECT doc_id, lang, n_chars, host,
      scheme || '://' || host ||
      CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                OR (scheme = 'https' AND port = '443') THEN ''
           ELSE ':' || port END ||
      path ||
      CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canon_url
    FROM p
  )
"""


@register(
    "url_normalize",
    _SQL_URL_CANON + "SELECT doc_id, canon_url, host FROM canon",
)
def q_url_normalize(spark, sf_dir):
    """URL canonicalization — the normalize-before-anything step of a
    crawl pipeline (URL-level dedup, host grouping, politeness all key
    on its output): lowercase scheme/host, strip www. and default
    ports, drop fragments and utm_*/gclid/fbclid tracking params, keep
    surviving params in order.

    ``functions/url.py::canonicalize_url`` — ``F.parse_url`` + JVM
    regex/HOF expressions, zero UDFs: a free codegen map at 100 TB.
    """
    from common_survey_data_pipeline_spark.functions.url import (
        canonicalize_url,
        url_host,
    )

    docs = _t(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.expr(_SQL_MESSY_URL.strip()).alias("url"))
    return u.select(
        "doc_id",
        canonicalize_url(F.col("url")).alias("canon_url"),
        url_host(F.col("url")).alias("host"),
    )


@register(
    "host_rollup",
    _SQL_URL_CANON
    + """
    SELECT host,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT canon_url) AS n_urls,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc
    FROM canon GROUP BY host
    """,
)
def q_host_rollup(spark, sf_dir):
    """Host-level corpus rollup over canonical hosts — the per-site
    quality/quota table every crawl curator keeps (how many docs and
    distinct pages per host, how much text, which languages). All
    metrics are EXACT integers (hash-stable by construction; no
    ratio-rounding surface). One host-keyed shuffle with map-side
    partials; count-distincts expand per host, bounded by per-host
    cardinality — the expensive corpus never moves twice.
    """
    from common_survey_data_pipeline_spark.functions.url import (
        canonicalize_url,
        url_host,
    )

    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(_SQL_MESSY_URL.strip()).alias("url"),
    )
    c = u.select(
        "doc_id",
        "lang",
        "n_chars",
        url_host(F.col("url")).alias("host"),
        canonicalize_url(F.col("url")).alias("canon_url"),
    )
    return c.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("canon_url").alias("n_urls"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# Round 6: watermark late-data accounting (streaming parity, batch form)
# ---------------------------------------------------------------------------

@register(
    "events_late_data_accounting",
    """
    WITH a AS (
      SELECT event_id, ts,
             event_id + CASE WHEN event_id % 13 = 0 THEN 997
                             WHEN event_id % 5 = 0 THEN 7
                             ELSE 0 END AS arr
      FROM events
    ),
    o AS (
      SELECT event_id, ts,
             max(ts) OVER (PARTITION BY event_id % 8
                           ORDER BY arr, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS wm_src
      FROM a
    ),
    f AS (
      SELECT ts,
             (wm_src IS NOT NULL
              AND ts < wm_src - INTERVAL 30 MINUTE) AS late
      FROM o
    )
    SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
           count(*) AS n_events,
           CAST(sum(late::BIGINT) AS BIGINT) AS n_late_dropped,
           CAST(sum((NOT late)::BIGINT) AS BIGINT) AS n_on_time
    FROM f GROUP BY 1
    """,
)
def q_late_data_accounting(spark, sf_dir):
    """Watermark late-data ACCOUNTING in batch-checkable form — per
    event-time hour, the rows a 30-minute-watermark streaming
    aggregation accepts vs drops, under a pinned deterministic arrival
    model: 8 ingest shards (event_id % 8), arrival order jittered so
    every 13th event arrives ~50 event-hours late (beyond the
    watermark -> dropped) and every 5th ~21 minutes late (inside it ->
    kept), per-shard running watermark over strictly earlier arrivals. The driver-visible
    correctness row for the streaming module's watermark semantics;
    the Structured Streaming execution of the same aggregation is
    exercised in tests/test_streaming.py.

    ``streaming/events.py::late_data_accounting`` — one shard-keyed
    running-max window (constant per-shard state) + one hour-keyed
    exact-integer aggregation. Oracled by identical event-time
    arithmetic in DuckDB.
    """
    from common_survey_data_pipeline_spark.streaming.events import (
        late_data_accounting,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "arr",
        F.col("event_id")
        + F.when(F.col("event_id") % 13 == 0, 997)
        .when(F.col("event_id") % 5 == 0, 7)
        .otherwise(0),
    )
    return late_data_accounting(ev, "30 minutes", arrival_col="arr")


# ---------------------------------------------------------------------------
# Round 6: grouped approx-quantile error certificate
# ---------------------------------------------------------------------------

_CERT_PS = (0.25, 0.5, 0.75, 0.875, 0.9375)


@register(
    "quantile_error_certificate",
    f"""
    WITH e AS (SELECT event_type,
                      CAST(round_even(value * 100.0, 0) AS BIGINT) AS cents
               FROM events WHERE value IS NOT NULL),
    a AS (
      SELECT event_type,
             quantile_cont(cents, {list(_CERT_PS)}) AS ex,
             approx_quantile(cents, {list(_CERT_PS)}) AS ap
      FROM e GROUP BY event_type
    ),
    r AS (
      SELECT event_type, p, ex[i] AS exq, ap[i] AS apv
      FROM a, (VALUES {", ".join(f"({i + 1}, {p})" for i, p in enumerate(_CERT_PS))})
             AS t(i, p)
    ),
    cdf AS (
      SELECT r.event_type, r.p, r.exq,
             sum((e.cents <= r.apv)::BIGINT)::DOUBLE / count(*) AS cdf_at_ap
      FROM r JOIN e USING (event_type)
      GROUP BY r.event_type, r.p, r.exq
    )
    SELECT event_type, p, exq / 100.0 AS exact_q,
           (abs(cdf_at_ap - p) < 0.02) AS approx_ok
    FROM cdf
    """,
)
def q_quantile_cert(spark, sf_dir):
    """Grouped approx-quantile ERROR CERTIFICATE — `a8`'s sketch
    contract extended across a quantile ladder per group: for each
    event type and each of five quantiles, the exact value plus each
    engine's own boolean that its single-pass sketch (Spark
    Greenwald-Khanna @ accuracy 10000, DuckDB t-digest) lands within
    2% RANK error — the empirical CDF at the sketch's answer is
    within 0.02 of the requested p. Rank error is what the sketches
    actually bound (GK guarantees 1e-4 here), so the certificate is
    scale-robust: measured worst rank error is 0.62% at sf0.001 and
    SHRINKS with n (0.13% at sf0.1), where a VALUE-error contract
    measured 5.6% at sf0.001 on both engines and straddled any fixed
    threshold — tiny groups made the boolean an engine coin flip.

    HASH-STABLE BY CONSTRUCTION: inputs quantize to integer cents
    (rint ≡ round_even on the identical double product) and every
    certificate quantile is DYADIC (.25 .5 .75 .875 .9375), so the
    type-7 interpolation index (n−1)·p and the interpolated exact_q
    are EXACT dyadic rationals both engines compute bit-identically in
    double — no rounding step at all; /100.0 is one shared IEEE op.
    The CDF ratio is an exact-integer count over an exact-integer
    count — identical division both sides — and enters only the
    boolean.

    Scale shape: one group-keyed sketch aggregation (GK partials merge
    map-side, fixed memory) + one broadcast-joined CDF probe pass over
    the |groups|×5 sketch answers; the corpus is scanned twice, never
    shuffled beyond the group key. The probe keeps the sketch answers
    as ARRAYS on each event row (one conditional sum per ladder rung
    in a single aggregation) instead of joining an exploded
    groups×5-row frame — the exploded form multiplied every event row
    by the ladder length before its partial aggregation (5× the probe
    pass's row volume; measured 1.47s → 0.95s at sf1, r9 perf note).
    """
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(rint(value * 100.0) AS BIGINT)").alias("cents"),
        )
    )
    arr = ", ".join(str(p) for p in _CERT_PS)
    agg = ev.groupBy("event_type").agg(
        F.expr(f"percentile(cents, array({arr}))").alias("ex"),
        F.expr(f"approx_percentile(cents, array({arr}), 10000)").alias("ap"),
    )
    k = len(_CERT_PS)
    p_lit = F.array(*[F.lit(float(x)) for x in _CERT_PS])
    sums = (
        ev.join(F.broadcast(agg), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("ex").alias("ex"),
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    (
                        F.col("cents") <= F.element_at("ap", i + 1)
                    ).cast("long")
                ).alias(f"c{i}")
                for i in range(k)
            ],
        )
    )
    # same arithmetic per rung as the exploded form: long-sum cast to
    # double over the group's long count
    cdfs = F.array(
        *[(F.col(f"c{i}").cast("double") / F.col("n")) for i in range(k)]
    )
    return (
        sums.select(
            "event_type",
            F.col("ex").alias("exs"),
            cdfs.alias("cdfs"),
            p_lit.alias("ps"),
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("i"),
        )
        .select(
            "event_type",
            F.element_at("ps", F.col("i")).alias("p"),
            (F.element_at("exs", F.col("i")) / F.lit(100.0)).alias(
                "exact_q"
            ),
            (
                F.abs(
                    F.element_at("cdfs", F.col("i"))
                    - F.element_at("ps", F.col("i"))
                )
                < 0.02
            ).alias("approx_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Round 6: LM-prep statistics — KN continuation counts + BPE pair counts
# ---------------------------------------------------------------------------

@register(
    "ngram_lm_counts",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, toks[pos] AS w
            FROM t, unnest(generate_series(1, len(toks))) AS u(pos)),
    bg AS (SELECT toks[pos] AS w1, toks[pos + 1] AS w2
           FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(pos)),
    occ AS (SELECT w, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
            FROM tok GROUP BY w),
    lt AS (SELECT w2 AS w, count(DISTINCT w1) AS n_left_types
           FROM bg GROUP BY w2),
    rt AS (SELECT w1 AS w, count(DISTINCT w2) AS n_right_types
           FROM bg GROUP BY w1)
    SELECT occ.w AS word, occ.n_occ, occ.n_docs,
           coalesce(lt.n_left_types, 0) AS n_left_types,
           coalesce(rt.n_right_types, 0) AS n_right_types
    FROM occ LEFT JOIN lt ON occ.w = lt.w LEFT JOIN rt ON occ.w = rt.w
    """,
)
def q_ngram_lm_counts(spark, sf_dir):
    """Kneser-Ney continuation statistics per word — the sufficient
    counts an n-gram language model (or a KN-smoothed data-quality
    perplexity filter) trains from: raw occurrences, document
    frequency, and the LEFT/RIGHT context-type counts (N1+(•w) /
    N1+(w•)) whose ratio is the KN continuation probability.

    Scale shape: one token explode + one bigram explode, then three
    word-keyed aggregations (count-distincts expand per word, bounded
    by context-type cardinality, never corpus size) and two word-keyed
    left joins — every metric an exact integer, hash-stable by
    construction. At 100 TB this is the canonical explode-aggregate
    pipeline: map-side partials absorb hot words before the shuffle.
    """
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("w")
    )
    bg = docs.select(
        F.explode(T.word_ngrams(F.col("text"), 2)).alias("g")
    ).select(
        F.split(F.col("g"), " ").getItem(0).alias("w1"),
        F.split(F.col("g"), " ").getItem(1).alias("w2"),
    )
    occ = tok.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    lt = bg.groupBy(F.col("w2").alias("w")).agg(
        F.countDistinct("w1").alias("n_left_types")
    )
    rt = bg.groupBy(F.col("w1").alias("w")).agg(
        F.countDistinct("w2").alias("n_right_types")
    )
    return (
        occ.join(lt, "w", "left")
        .join(rt, "w", "left")
        .select(
            F.col("w").alias("word"),
            "n_occ",
            "n_docs",
            F.coalesce("n_left_types", F.lit(0)).alias("n_left_types"),
            F.coalesce("n_right_types", F.lit(0)).alias("n_right_types"),
        )
    )


@register(
    "bpe_pair_counts",
    f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ),
    pr AS (
      SELECT substring(w, i, 2) AS pair
      FROM tok, unnest(generate_series(1, length(w) - 1)) AS u(i)
    )
    SELECT pair, count(*) AS n FROM pr GROUP BY pair
    """,
)
def q_bpe_pair_counts(spark, sf_dir):
    """The first merge step of BPE tokenizer training: frequency of
    every adjacent character pair WITHIN words across the corpus — the
    table whose argmax becomes merge rule #1. Exact integer counts.

    Implementation guard: Spark's ``sequence(1, 0)`` counts DOWN
    ([1, 0]) where DuckDB's ``generate_series(1, 0)`` is empty, so
    single-character tokens gate behind a ``when`` instead of relying
    on the sequence bounds. One explode + one pair-keyed count with
    map-side partials; pair vocabulary is alphabet², tiny at any
    corpus scale.
    """
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
    pairs_arr = F.when(
        F.length("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        tok.select(F.explode(pairs_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Round 8: FULL BPE tokenizer training loop + corpus encode
# ---------------------------------------------------------------------------

_BPE_K = 32


def _bpe_oracle_ctes(k: int) -> str:
    """Generate the DuckDB replay of :mod:`operators/bpe` training: one
    MATERIALIZED CTE triple per iteration (pair counts → argmax merge →
    greedy application). MATERIALIZED is load-bearing — DuckDB inlines
    plain CTEs, and each ``vocab_i`` references ``best_i`` four times,
    so inlining re-evaluates the whole upstream chain ~4× per level
    (exponential; K=6 already ran minutes, materialized K=32 runs in
    <1s). The ``"|a||b|" → "|ab|"`` literal replace is exactly the
    Spark side's merge application: every symbol owns both delimiters,
    so standard left-to-right non-overlapping ``replace`` IS BPE's
    greedy leftmost merge on both engines.

    Degenerate corpora (ADVICE r8): if the vocabulary exhausts
    adjacent pairs before step ``k``, ``best_i`` is EMPTY and its
    scalar subqueries return NULL — an unguarded ``replace(seq, NULL,
    ...)`` would null every later ``vocab_i`` while the Spark side
    (``bpe_train`` breaks out of the loop) keeps the exhausted vocab.
    Both the search and replacement strings are therefore COALESCEd to
    the same ``chr(1)`` sentinel, making the exhausted iterations
    identity replaces — the two engines agree on any corpus."""
    parts = [
        f"""
    vocab_0 AS MATERIALIZED (
      SELECT '|' || list_aggregate(list_transform(generate_series(1, length(w)),
              i -> substring(w, i, 1)), 'string_agg', '||') || '|' AS seq,
             count(*) AS freq
      FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents)
      WHERE w NOT LIKE '%|%'
      GROUP BY w)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""
    pairs_{i} AS MATERIALIZED (
      SELECT l[j] AS w1, l[j+1] AS w2, sum(freq)::BIGINT AS n
      FROM (SELECT string_split(seq[2:length(seq)-1], '||') AS l, freq
            FROM vocab_{i - 1}),
           unnest(generate_series(1, len(l) - 1)) AS u(j)
      GROUP BY l[j], l[j+1]),
    best_{i} AS MATERIALIZED (
      SELECT {i} AS step, w1, w2, n FROM pairs_{i}
      ORDER BY n DESC, w1, w2 LIMIT 1),
    vocab_{i} AS MATERIALIZED (
      SELECT replace(seq,
                     COALESCE('|' || (SELECT w1 FROM best_{i}) || '||'
                         || (SELECT w2 FROM best_{i}) || '|', chr(1)),
                     COALESCE('|' || (SELECT w1 FROM best_{i})
                         || (SELECT w2 FROM best_{i}) || '|', chr(1))) AS seq,
             freq
      FROM vocab_{i - 1})"""
        )
    return "WITH" + ",".join(parts)


@register(
    "bpe_train_merges",
    _bpe_oracle_ctes(_BPE_K)
    + "\n    "
    + " UNION ALL ".join(
        f"SELECT step, w1, w2, n FROM best_{i}" for i in range(1, _BPE_K + 1)
    ),
)
def q_bpe_train_merges(spark, sf_dir):
    """The FULL BPE tokenizer training loop (``operators/bpe.py``), not
    just one merge step (`bpe_pair_counts`): K=32 iterations of count
    adjacent pairs → argmax (ties lexicographic) → greedy merge
    everywhere, on the word-frequency table. Output is the ordered
    merge list — the trained tokenizer model — which the chained-CTE
    oracle replays merge-for-merge, so a single divergent tie-break or
    a wrong greedy application anywhere in 32 rounds breaks the hash.

    Scale shape: ONE corpus pass builds the vocab table; each iteration
    is a narrow pair-extraction map + a pair-keyed hash aggregation
    (map-side combinable) + a 1-row TakeOrdered to the driver, with
    ``localCheckpoint`` lineage cuts per iteration (the pagerank
    pattern) — plan depth stays O(1) across K."""
    from common_survey_data_pipeline_spark.operators.bpe import bpe_merges_df

    docs = _t(spark, sf_dir, "documents")
    return bpe_merges_df(spark, docs, k=_BPE_K)


@register(
    "bpe_encode_tokens",
    _bpe_oracle_ctes(_BPE_K)
    + f"""
    SELECT t AS token, sum(freq)::BIGINT AS n
    FROM (SELECT string_split(seq[2:length(seq)-1], '||') AS l, freq
          FROM vocab_{_BPE_K}),
         unnest(l) AS u(t)
    GROUP BY t
    """,
)
def q_bpe_encode_tokens(spark, sf_dir):
    """Corpus ENCODING under the learned BPE merges — the second half
    of the tokenizer lifecycle: train K=32 merges, then encode the
    whole corpus and return its token-frequency table (the
    distributional summary data teams inspect before committing a
    vocabulary). Encoding applies all 32 merges as ONE nested
    literal-replace expression inside whole-stage codegen over the
    word-frequency table — a single narrow map, no UDF, no loop, no
    extra corpus scan at encode time (``operators/bpe.py::
    bpe_encoded_token_freqs``; the per-document form is
    ``bpe_encode``)."""
    from common_survey_data_pipeline_spark.operators.bpe import (
        bpe_encoded_token_freqs,
        bpe_train,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, k=_BPE_K)
    return bpe_encoded_token_freqs(docs, merges)


@register(
    "bpe_token_ids",
    _bpe_oracle_ctes(_BPE_K)
    + f""",
    tokfreq AS MATERIALIZED (
      SELECT t AS token, sum(freq)::BIGINT AS n
      FROM (SELECT string_split(seq[2:length(seq)-1], '||') AS l, freq
            FROM vocab_{_BPE_K}),
           unnest(l) AS u(t)
      GROUP BY t),
    ids AS MATERIALIZED (
      SELECT token,
             row_number() OVER (ORDER BY n DESC, token)::INTEGER AS token_id
      FROM tokfreq),
    wordmap AS MATERIALIZED (
      SELECT replace(seq, '|', '') AS w,
             string_split(seq[2:length(seq)-1], '||') AS toks
      FROM vocab_{_BPE_K}),
    stream AS (
      SELECT d.doc_id, d.wpos, v.spos, ids.token_id
      FROM (SELECT doc_id, toks[wpos] AS w, wpos
            FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
                  WHERE doc_id < 50),
                 unnest(generate_series(1, len(toks))) AS u(wpos)) d
      JOIN wordmap ON d.w = wordmap.w,
           unnest(generate_series(1, len(wordmap.toks))) AS v(spos)
      JOIN ids ON wordmap.toks[v.spos] = ids.token
    )
    SELECT doc_id,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY wpos, spos)::BIGINT AS pos,
           token_id
    FROM stream
    """,
)
def q_bpe_token_ids(spark, sf_dir):
    """The tokenizer's PRODUCTION OUTPUT: the corpus as an integer
    token-id stream — train K=32 merges, rank the resulting token
    vocabulary (count desc, token asc — the conventional id
    assignment) with the range-partitioned ``global_row_number``
    kernel (the VOCAB is ranked, never the corpus), and tokenize each
    document by joining its word stream to the per-WORD token arrays
    (each distinct word encodes once; the corpus-sized side only
    explodes and joins). Both lookup sides are VOCABULARY-sized —
    10^6–10^8 rows on a web-scale corpus, NOT broadcastable — so the
    joins are left as shuffle hash joins on the token/word key (AQE
    may still downgrade them to broadcast at small SF, which is fine;
    hinting broadcast would be a scale bug, caught by the registry
    broadcast guard). Output ``(doc_id, pos, token_id)`` for a
    50-doc slice: position is the per-doc token index, so a single
    id misassignment, a swapped merge, or an off-by-one in word order
    breaks the hash."""
    from common_survey_data_pipeline_spark.operators.bpe import (
        _fold_merges,
        _initial_seq,
        _seq_symbols,
        bpe_encoded_token_freqs,
        bpe_train,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, k=_BPE_K)
    ids = global_row_number(
        bpe_encoded_token_freqs(docs, merges),
        [F.col("n").desc(), F.col("token")],
        name="token_id",
    ).select("token", F.col("token_id").cast("int").alias("token_id"))
    word_toks = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .where(~F.col("w").contains("|"))
        .distinct()
        .select(
            "w",
            _seq_symbols(
                _fold_merges(_initial_seq(F.col("w")), merges)
            ).alias("toks"),
        )
    )
    stream = (
        docs.where(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.posexplode(T.tokens(F.col("text"))).alias("wpos0", "w"),
        )
        .where(~F.col("w").contains("|"))
        .join(word_toks, "w")
        .select(
            "doc_id",
            "wpos0",
            F.posexplode(F.col("toks")).alias("spos0", "token"),
        )
        .join(ids, "token")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("wpos0", "spos0")
    return stream.select(
        "doc_id",
        F.row_number().over(w_doc).cast("long").alias("pos"),
        "token_id",
    )


@register(
    "bpe_encode_persisted",
    _bpe_oracle_ctes(_BPE_K)
    + f"""
    SELECT t AS token, sum(freq)::BIGINT AS n
    FROM (SELECT string_split(seq[2:length(seq)-1], '||') AS l, freq
          FROM vocab_{_BPE_K}),
         unnest(l) AS u(t)
    GROUP BY t
    """,
)
def q_bpe_encode_persisted(spark, sf_dir):
    """The TOKENIZER-ARTIFACT lifecycle (the band-table / IVF-index
    pattern applied to the trained tokenizer): train once, persist the
    ordered merge list as a catalog table
    (``operators/bpe.py::write_tokenizer``), reload it in a fresh
    consumer (``read_tokenizer`` — validates step density and the
    stored k, a truncated artifact fails loudly instead of encoding
    differently), and encode the corpus from the STORED merges. The
    oracle is the same replay as ``bpe_encode_tokens`` — a persistence
    round-trip that alters even one merge or its order breaks the
    hash."""
    from common_survey_data_pipeline_spark.operators.bpe import (
        bpe_encoded_token_freqs,
        bpe_train,
        read_tokenizer,
        write_tokenizer,
    )

    docs = _t(spark, sf_dir, "documents")
    table = _scoped_band_table(spark, sf_dir, "bpe_tokenizer")
    _reset_managed_table(spark, table)
    write_tokenizer(spark, bpe_train(docs, k=_BPE_K), table)
    return bpe_encoded_token_freqs(docs, read_tokenizer(spark, table))


# vocab-TARGETED training (VERDICT r9 item 5): real tokenizer specs say
# "48 tokens", not "N merges". The synthetic corpus alphabet is 24
# chars at every sf, so target 48 needs ~24 merges (more only if two
# merges emit the same token); the oracle chain runs a fixed 40 rounds
# and applies the SAME stopping rules in SQL, so the recorded merge
# count never has to be baked into the oracle per scale factor.
_BPE_VOCAB_TARGET = 48
_BPE_VOCAB_MIN_FREQ = 2
_BPE_VOCAB_KMAX = 40


@register(
    "bpe_train_to_vocab",
    _bpe_oracle_ctes(_BPE_VOCAB_KMAX)
    + f""",
    allb AS MATERIALIZED ({" UNION ALL ".join(
        f"SELECT step, w1, w2, n FROM best_{i}"
        for i in range(1, _BPE_VOCAB_KMAX + 1)
    )}),
    alpha AS MATERIALIZED (
      SELECT count(DISTINCT substring(w, i, 1)) AS a
      FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents) ws,
           unnest(generate_series(1, length(w))) AS u(i)
      WHERE w NOT LIKE '%|%'),
    flags AS (
      SELECT step, w1, w2, n,
             CASE WHEN step = min(step) OVER (PARTITION BY w1 || w2)
                  THEN 1 ELSE 0 END AS is_new
      FROM allb),
    cum AS (
      SELECT step, w1, w2, n, is_new,
             sum(is_new) OVER (ORDER BY step
                               ROWS UNBOUNDED PRECEDING) AS c
      FROM flags)
    SELECT step, w1, w2, n
    FROM cum
    WHERE (SELECT a FROM alpha) + c - is_new < {_BPE_VOCAB_TARGET}
      AND step < COALESCE((SELECT min(step) FROM allb
                           WHERE n < {_BPE_VOCAB_MIN_FREQ}), 1000000000)
    """,
)
def q_bpe_train_to_vocab(spark, sf_dir):
    """VOCAB-SIZE-TARGETED BPE training (VERDICT r9 item 5):
    ``operators/bpe.py::bpe_train_to_vocab`` trains until |alphabet| +
    |distinct merge-output tokens| reaches the target (the HF-trainers
    vocabulary convention), with a min-pair-frequency floor — merge
    selection, tie-breaks, and delta maintenance identical to
    ``bpe_train``, so the result is a prefix of the k-mode merge list.

    The oracle replays a FIXED 40-round merge chain and applies both
    stopping rules in SQL over the recorded argmaxes: the alphabet is
    one distinct-char count, token novelty per step is a min-step
    window over the concatenated output (two merges CAN emit the same
    token), and a running sum of novel tokens reproduces the
    stop-after-reaching-the-target prefix — the same rule the Spark
    loop's driver-side token set implements, computed engine-side, so
    the query stays oracle-exact at ANY scale factor without baking
    the merge count in."""
    from common_survey_data_pipeline_spark.operators.bpe import (
        MERGE_SCHEMA,
        bpe_train_to_vocab,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train_to_vocab(
        docs,
        vocab_size=_BPE_VOCAB_TARGET,
        min_freq=_BPE_VOCAB_MIN_FREQ,
    )
    return spark.createDataFrame(merges, MERGE_SCHEMA)


# ---------------------------------------------------------------------------
# Round 6: linear quality-classifier inference (fastText-style) as a join
# ---------------------------------------------------------------------------

# Literal lexicon (token -> integer MICRO-weight) shared verbatim by the
# Spark plan and the oracle — model inference for a linear classifier IS
# a broadcast map-join + per-doc sum, and integer micro-weights keep the
# whole score path exact (no libm, no float accumulation order).
_QUALITY_LEXICON = (
    ("fast", 180_000),
    ("merge", 120_000),
    ("join", 90_000),
    ("vector", 80_000),
    ("stream", 60_000),
    ("window", 50_000),
    ("query", 40_000),
    ("dup", -400_000),
    ("slow", -220_000),
    ("small", -60_000),
    ("row", -40_000),
    ("the", -10_000),
)
_QUALITY_BIAS = -50_000


@register(
    "quality_logit_score",
    f"""
    WITH lex(w, wt) AS (VALUES
      {", ".join(f"('{w}', {wt})" for w, wt in _QUALITY_LEXICON)}
    ),
    t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    hit AS (
      SELECT tok.doc_id, CAST(sum(lex.wt) AS BIGINT) AS wsum
      FROM tok JOIN lex USING (w) GROUP BY tok.doc_id
    )
    SELECT t.doc_id,
           len(t.toks)::BIGINT AS n_tokens,
           ({_QUALITY_BIAS} + coalesce(hit.wsum, 0))::BIGINT AS logit_micro,
           ({_QUALITY_BIAS} + coalesce(hit.wsum, 0) > 0) AS kept
    FROM t LEFT JOIN hit USING (doc_id)
    """,
)
def q_quality_logit_score(spark, sf_dir):
    """Linear quality-classifier INFERENCE over the corpus — the
    fastText/CCNet-style keep-or-drop scorer, expressed the way a
    linear model actually runs at 100 TB: the weight table is a tiny
    broadcast join against the exploded token stream, the logit is one
    map-side-combinable per-doc sum, and the keep decision is a
    threshold on it. No UDF, no per-row model call.

    HASH-STABLE BY CONSTRUCTION: weights are integer MICRO-units in a
    literal lexicon shared verbatim with the oracle, so the logit is
    exact integer arithmetic; the sigmoid is deliberately NOT applied
    (libm exp is not correctly rounded and diverges cross-engine — the
    playbook ban) and isn't needed: sigmoid is monotone, so the
    logit>0 decision and any downstream ranking are identical.

    Scale shape: explode + broadcast hash join on the lexicon + one
    doc-keyed sum + one doc-keyed left join back for zero-hit docs.
    """
    return _quality_doc_scores(spark, _t(spark, sf_dir, "documents"))


def _quality_doc_scores(spark, docs) -> DataFrame:
    """Per-doc linear-classifier scores ``(doc_id, n_tokens,
    logit_micro, kept)`` — the shared scoring stage of
    ``quality_logit_score`` and ``host_quality_rollup``."""
    # literal VALUES relation, not createDataFrame: a LocalRelation is
    # provably bounded in-plan (createDataFrame ships an opaque
    # ExistingRDD, which the fact-side-broadcast guard rightly treats
    # as unproven — tests/test_plan_quality.py:218)
    lex_rows = ", ".join(f"('{w}', {wt}L)" for w, wt in _QUALITY_LEXICON)
    lex = F.broadcast(
        spark.sql(f"SELECT * FROM VALUES {lex_rows} AS t(w, wt)")
    )
    t = docs.select("doc_id", T.tokens(F.col("text")).alias("__toks"))
    tok = t.select("doc_id", F.explode("__toks").alias("w"))
    hit = tok.join(lex, "w").groupBy("doc_id").agg(
        F.sum("wt").alias("wsum")
    )
    logit = F.lit(_QUALITY_BIAS) + F.coalesce(F.col("wsum"), F.lit(0))
    return (
        t.select("doc_id", F.size("__toks").cast("long").alias("n_tokens"))
        .join(hit, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            logit.cast("long").alias("logit_micro"),
            (logit > 0).alias("kept"),
        )
    )


@register(
    "host_quality_rollup",
    _SQL_URL_CANON
    + f""",
    lex(w, wt) AS (VALUES
      {", ".join(f"('{w}', {wt})" for w, wt in _QUALITY_LEXICON)}
    ),
    t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    hit AS (
      SELECT tok.doc_id, CAST(sum(lex.wt) AS BIGINT) AS wsum
      FROM tok JOIN lex USING (w) GROUP BY tok.doc_id
    ),
    score AS (
      SELECT t.doc_id,
             ({_QUALITY_BIAS} + coalesce(hit.wsum, 0))::BIGINT AS logit,
             ({_QUALITY_BIAS} + coalesce(hit.wsum, 0) > 0) AS kept
      FROM t LEFT JOIN hit USING (doc_id)
    ),
    h AS (
      SELECT c.host, s.logit, s.kept
      FROM canon c JOIN score s USING (doc_id)
    ),
    agg AS (
      SELECT host,
             count(*) AS n_docs,
             CAST(sum(kept::BIGINT) AS BIGINT) AS n_kept,
             quantile_cont(logit, 0.25) AS logit_p25,
             quantile_cont(logit, 0.5) AS logit_p50,
             quantile_cont(logit, 0.75) AS logit_p75,
             approx_quantile(logit, 0.5) AS ap50
      FROM h GROUP BY host
    ),
    cdf AS (
      SELECT a.host,
             sum((h.logit <= a.ap50)::BIGINT)::DOUBLE / count(*) AS cdf50
      FROM agg a JOIN h USING (host) GROUP BY a.host
    )
    SELECT a.host, a.n_docs, a.n_kept,
           CAST(a.n_kept AS DOUBLE) / a.n_docs AS keep_rate,
           a.logit_p25, a.logit_p50, a.logit_p75,
           (abs(c.cdf50 - 0.5) < 0.02) AS approx_ok_p50
    FROM agg a JOIN cdf c USING (host)
    """,
)
def q_host_quality_rollup(spark, sf_dir):
    """The standard crawl-curation rollup (VERDICT r6 item 8):
    ``host_rollup`` × ``quality_logit_score`` — per canonical host,
    how much of the crawl the quality classifier keeps and where the
    host's score distribution sits. Columns: doc volume, kept count,
    keep rate, exact logit quartiles, and a certified-sketch boolean
    (each engine's own single-pass approx-median lands within 2% RANK
    error of p=0.5 — the ``quantile_error_certificate`` pattern, the
    scale path for quantiles over millions of hosts where exact
    per-host sorts are the fallback this query cross-checks them with).

    HASH-STABLE BY CONSTRUCTION: logits are exact integer micro-units,
    keep_rate is one shared division of identical integers, and the
    quartiles interpolate integers at DYADIC p (.25/.5/.75) — exact
    type-7 arithmetic both engines compute bit-identically.

    Scale shape: the scoring stage is the broadcast-lexicon join; the
    rollup is ONE host-keyed shuffle with map-side partials; the
    certificate re-joins per-host medians back through the same
    host-keyed partitioning (no second corpus shuffle shape).
    """
    from common_survey_data_pipeline_spark.functions.url import url_host

    docs = _t(spark, sf_dir, "documents")
    host = docs.select(
        "doc_id",
        url_host(F.expr(_SQL_MESSY_URL.strip())).alias("host"),
    )
    scores = _quality_doc_scores(spark, docs).select(
        "doc_id", F.col("logit_micro").alias("logit"), "kept"
    )
    d = host.join(scores, "doc_id")
    agg = d.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.expr("percentile(logit, array(0.25D, 0.5D, 0.75D))").alias("__ex"),
        F.expr("approx_percentile(logit, 0.5D, 10000)").alias("__ap50"),
    )
    cdf = (
        d.join(agg.select("host", "__ap50"), "host")
        .groupBy("host")
        .agg(
            (
                F.sum((F.col("logit") <= F.col("__ap50")).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("__cdf50")
        )
    )
    return agg.join(cdf, "host").select(
        "host",
        "n_docs",
        "n_kept",
        (F.col("n_kept").cast("double") / F.col("n_docs")).alias("keep_rate"),
        F.element_at("__ex", 1).alias("logit_p25"),
        F.element_at("__ex", 2).alias("logit_p50"),
        F.element_at("__ex", 3).alias("logit_p75"),
        (F.abs(F.col("__cdf50") - F.lit(0.5)) < 0.02).alias("approx_ok_p50"),
    )


@register(
    "profile_events_columns",
    """
    WITH base AS (
      SELECT unnest(['event_id','ts','user_id','event_type','value','props'])
               AS column_name
    ),
    stats AS (
      SELECT 'event_id' AS column_name, count(*) AS n_rows,
             sum((event_id IS NULL)::BIGINT) AS n_nulls,
             count(DISTINCT event_id) AS n_distinct,
             approx_count_distinct(event_id) AS approx_nd
      FROM events
      UNION ALL
      SELECT 'ts', count(*), sum((ts IS NULL)::BIGINT),
             count(DISTINCT ts), approx_count_distinct(ts) FROM events
      UNION ALL
      SELECT 'user_id', count(*), sum((user_id IS NULL)::BIGINT),
             count(DISTINCT user_id), approx_count_distinct(user_id)
      FROM events
      UNION ALL
      SELECT 'event_type', count(*), sum((event_type IS NULL)::BIGINT),
             count(DISTINCT event_type), approx_count_distinct(event_type)
      FROM events
      UNION ALL
      SELECT 'value', count(*), sum((value IS NULL)::BIGINT),
             count(DISTINCT value), approx_count_distinct(value)
      FROM events
      UNION ALL
      SELECT 'props', count(*), sum((props IS NULL)::BIGINT),
             count(DISTINCT props), approx_count_distinct(props)
      FROM events
    )
    SELECT b.column_name,
           CAST(s.n_rows AS BIGINT) AS n_rows,
           CAST(s.n_nulls AS BIGINT) AS n_nulls,
           CAST(s.n_distinct AS BIGINT) AS n_distinct,
           CASE WHEN s.n_distinct = 0 THEN TRUE
                ELSE abs(s.approx_nd - s.n_distinct)::DOUBLE
                       / s.n_distinct <= 0.05 END AS approx_distinct_ok
    FROM base b JOIN stats s USING (column_name)
    """,
)
def q_profile_events_columns(spark, sf_dir):
    """Column profiling over the events stream — the ANALYZE-TABLE
    report (null counts, exact distinct cardinality, self-certified
    HLL sketch) every pipeline runs before trusting a new source.
    ``operators/profile.py::profile_columns`` — ONE aggregation pass
    emits all six columns' statistics as a wide row (map-side
    combinable), unpivoted by ``stack``. The approx-distinct boolean is
    the own-engine sketch certificate (≤5% relative error vs own exact
    count — the ``quantile_error_certificate`` pattern), so the value
    hash pins sketch health without demanding register-identical HLLs
    across engines."""
    from common_survey_data_pipeline_spark.operators.profile import (
        profile_columns,
    )

    ev = _t(spark, sf_dir, "events")
    return profile_columns(
        ev, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@register(
    "profile_appended",
    "WITH stats AS ("
    + " UNION ALL ".join(
        f"""
      SELECT '{c}' AS column_name, count(*) AS n_rows,
             sum(({c} IS NULL)::BIGINT) AS n_nulls,
             min({c})::VARCHAR AS min_val, max({c})::VARCHAR AS max_val,
             count(DISTINCT {c}) AS n_distinct
      FROM events"""
        for c in _PROFILE_COLS
    )
    + """
    )
    SELECT column_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nulls AS BIGINT) AS n_nulls, min_val, max_val,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           TRUE AS approx_distinct_ok
    FROM stats
    """,
)
def q_profile_appended(spark, sf_dir):
    """MERGEABLE incremental profiling (VERDICT r7 item 5): the events
    stream arrives as three ingest batches; each contributes one wide
    ALGEBRAIC state row (counts, typed extremes, Datasketches HLL
    sketch per column — ``operators/profile.py::profile_state``), the
    states fold with sum/min/max/``hll_union_agg``
    (``merge_profile_states`` — associative, order-free), and the
    merged state renders the profile WITHOUT ever recomputing the
    concatenated corpus. Exact fields (rows, nulls, extremes) must
    equal the oracle's full recompute EXACTLY; the sketch field
    certifies itself against the exact distinct count within 5%
    relative error (the repo's sketch-contract pattern — a merge bug
    that loses or double-counts a batch breaks the exact fields, a
    sketch-union bug breaks the certificate). At 100 TB the state row
    is what persists next to the band table: each appended batch costs
    one O(batch) pass."""
    from common_survey_data_pipeline_spark.operators.profile import (
        merge_profile_states,
        profile_from_state,
        profile_state,
    )

    ev = _t(spark, sf_dir, "events")
    states = [
        profile_state(ev.where(F.col("event_id") % 3 == i), _PROFILE_COLS)
        for i in range(3)
    ]
    prof = profile_from_state(merge_profile_states(states), _PROFILE_COLS)
    exact_wide = ev.agg(
        *[F.count_distinct(F.col(c)).alias(f"__nd_{c}") for c in _PROFILE_COLS]
    )
    exact = exact_wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, "
        + ", ".join(f"'{c}', __nd_{c}" for c in _PROFILE_COLS)
        + ") AS (column_name, n_distinct)"
    ).select("column_name", F.col("n_distinct").cast("long").alias("n_distinct"))
    return prof.join(exact, "column_name").select(
        "column_name",
        "n_rows",
        "n_nulls",
        "min_val",
        "max_val",
        "n_distinct",
        F.when(F.col("n_distinct") == 0, F.lit(True))
        .otherwise(
            (
                F.abs(F.col("distinct_est") - F.col("n_distinct"))
                / F.col("n_distinct")
            )
            <= 0.05
        )
        .alias("approx_distinct_ok"),
    )


_E2E_CAT6 = " || ' ' || ".join(f"toks[pos+{j}]" for j in range(6))

@register(
    "corpus_e2e_curation",
    _SQL_CURATE_CTES
    + f""",
    ct AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM curated),
    cg AS (SELECT doc_id, pos, {_E2E_CAT6} AS gram
           FROM ct, unnest(generate_series(1, len(toks) - 5)) AS u(pos)),
    cd AS (SELECT gram FROM cg GROUP BY gram
           HAVING min(doc_id) <> max(doc_id)),
    chits AS (SELECT doc_id, pos FROM cg JOIN cd USING (gram)),
    ccut AS (SELECT DISTINCT doc_id, pos + off AS tpos
             FROM chits, unnest(generate_series(0, 5)) AS o(off)),
    ctok AS (SELECT doc_id, tpos, toks[tpos] AS token
             FROM ct, unnest(generate_series(1, len(toks))) AS u(tpos)),
    ckept AS (SELECT ctok.doc_id, ctok.tpos, ctok.token
              FROM ctok ANTI JOIN ccut
                ON ctok.doc_id = ccut.doc_id AND ctok.tpos = ccut.tpos),
    cleaned AS (
      SELECT ct.doc_id, coalesce(k.cleaned, '') AS text
      FROM ct LEFT JOIN (
        SELECT doc_id, string_agg(token, ' ' ORDER BY tpos) AS cleaned
        FROM ckept GROUP BY doc_id) k USING (doc_id)),
    ctoks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM cleaned),
    tg AS (SELECT doc_id, unnest({_sql_word_grams(4)}) AS gram
           FROM ctoks WHERE doc_id % 37 <> 0),
    ev AS (SELECT DISTINCT gram FROM (
             SELECT unnest({_sql_word_grams(4)}) AS gram
             FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
                   WHERE doc_id % 37 = 0))),
    contaminated AS (SELECT DISTINCT tg.doc_id FROM tg JOIN ev USING (gram)),
    surv AS (SELECT c.doc_id, c.toks FROM ctoks c
             ANTI JOIN contaminated x ON c.doc_id = x.doc_id
             WHERE c.doc_id % 37 <> 0),
    lex(w, wt) AS (VALUES
      {", ".join(f"('{w}', {wt})" for w, wt in _QUALITY_LEXICON)}
    ),
    stok AS (SELECT doc_id, unnest(toks) AS w FROM surv),
    shit AS (SELECT stok.doc_id, CAST(sum(lex.wt) AS BIGINT) AS wsum
             FROM stok JOIN lex USING (w) GROUP BY stok.doc_id),
    sq AS (SELECT surv.doc_id, len(surv.toks)::BIGINT AS n_tokens,
                  ({_QUALITY_BIAS} + coalesce(shit.wsum, 0))::BIGINT
                    AS logit_micro
           FROM surv LEFT JOIN shit USING (doc_id)
           WHERE {_QUALITY_BIAS} + coalesce(shit.wsum, 0) > 0)
    SELECT doc_id, n_tokens, logit_micro,
           cum_tokens::BIGINT AS cum_tokens,
           ((cum_tokens - n_tokens) // 2048)::BIGINT AS pack_id
    FROM (SELECT doc_id, n_tokens, logit_micro,
                 sum(n_tokens) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_tokens
          FROM sq)
    """,
)
def q_corpus_e2e_curation(spark, sf_dir):
    """The WHOLE curation pipeline as ONE plan (VERDICT r6 item 5):
    curate (quality + language + exact/near dedup) →
    ``substring_dedup_clean`` (cut cross-doc duplicate passages) →
    ``decontaminate_ngrams`` (drop docs sharing 4-grams with the
    held-out split, checked on the CLEANED text) →
    ``quality_logit_score`` (classifier keep on the cleaned text) →
    sequence packing (2048-token shards via the distributed
    prefix-sum). Output: one row per document that survives the whole
    funnel, with its token count, classifier logit, running token
    offset and pack id. Proves the operators COMPOSE — same functions
    the registry exposes individually, no inline re-implementations.

    CACHE/CHECKPOINT POLICY (the two reuse points): (1) the raw
    (doc_id, text) projection is cached — curation and the eval-split
    branch both read it, so the parquet source is scanned ONCE
    (plan-locked in ``tests/test_e2e_curation.py``; at 100 TB the eval
    split lives in its own tiny store — the cache here is what proves
    compose-without-recompute); (2) the cleaned text is cached — the
    decontamination grams, the classifier scoring and the packing all
    consume it, and without the cut the whole curate+clean prefix
    (incl. its shuffles) re-executes three times. ``curate_corpus``
    additionally localCheckpoints its own scored corpus internally
    (its documented contract). Call ``spark.catalog.clearCache()``
    after consuming the result in long-lived sessions.

    HASH-STABLE: every stage is integer/string algebra (shingle hash
    joins, integer-cent-free — no floats anywhere in the output).
    """
    from common_survey_data_pipeline_spark.operators.dedup import (
        substring_dedup_clean,
    )

    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text").cache()  # reuse point 1
    curated_ids = curate_corpus(
        base, min_quality=0.3, lang="en", neardup_threshold=0.5
    ).select("doc_id")
    cur = base.join(curated_ids, "doc_id")
    cleaned = (
        substring_dedup_clean(cur, "text", "doc_id", k=6)
        .select("doc_id", F.col("cleaned_text").alias("text"))
        .cache()  # reuse point 2: decontam grams + scoring + packing
    )
    # EAGER materialization: the three consumers below run as parallel
    # branches of one job, and the packing stage's distributed
    # prefix-sum adds a second action — without forcing the cache
    # here, racing branches each recompute the whole curate+clean
    # prefix (measured 120s → 55s at sf0.01)
    cleaned.count()
    eval_set = base.where(F.col("doc_id") % 37 == 0)
    train = cleaned.where(F.col("doc_id") % 37 != 0)
    contaminated = ngram_decontaminate(
        train, eval_set, "text", "doc_id", n=4
    ).select("doc_id")
    survivors = train.join(contaminated, "doc_id", "left_anti")
    scored = _quality_doc_scores(spark, survivors).where(F.col("kept"))
    final = scored.select("doc_id", "n_tokens", "logit_micro")
    packed = global_cumsum(final, ["doc_id"], "n_tokens", "cum_tokens")
    return packed.select(
        "doc_id",
        "n_tokens",
        "logit_micro",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 2048)
        .cast("long")
        .alias("pack_id"),
    )


# ---------------------------------------------------------------------------
# Round 7 (cont.): LM-based corpus scoring & data-mix analytics
# ---------------------------------------------------------------------------


@register(
    "lm_perplexity_buckets",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, toks[pos] AS w
            FROM t, unnest(generate_series(1, len(toks))) AS u(pos)),
    uni AS (SELECT w, count(*) AS tf FROM tok GROUP BY w),
    tot AS (SELECT sum(tf) AS total FROM uni),
    bg AS (SELECT doc_id, toks[pos] AS w1, toks[pos + 1] AS w2
           FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(pos)),
    bgc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    scored AS (
      SELECT b.doc_id,
             CAST(round_even(ln(0.9 * (bgc.c12::DOUBLE / u1.tf::DOUBLE)
                                + 0.1 * (u2.tf::DOUBLE / tot.total::DOUBLE))
                             * 1000000000.0, 0) AS BIGINT) AS qnat
      FROM bg b
      JOIN bgc ON b.w1 = bgc.w1 AND b.w2 = bgc.w2
      JOIN uni u1 ON b.w1 = u1.w
      JOIN uni u2 ON b.w2 = u2.w
      CROSS JOIN tot),
    perdoc AS (SELECT doc_id, count(*) AS n_bigrams, sum(qnat) AS qsum
               FROM scored GROUP BY doc_id),
    bucketed AS (
      SELECT doc_id, n_bigrams,
             qsum::DOUBLE / n_bigrams::DOUBLE / 1000000000.0 AS avg_lp,
             ntile(3) OVER (
               ORDER BY qsum::DOUBLE / n_bigrams::DOUBLE DESC, doc_id
             ) AS bucket
      FROM perdoc)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           count(*)::BIGINT AS n_docs,
           sum(n_bigrams)::BIGINT AS n_bigrams,
           round(min(avg_lp), 4) + 0 AS min_avg_logprob,
           round(max(avg_lp), 4) + 0 AS max_avg_logprob
    FROM bucketed GROUP BY bucket
    """,
)
def q_lm_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing — the head/middle/tail split
    that decides which crawl documents reach the training mix: score
    every document with an interpolated bigram LM trained on the corpus
    itself (p(w2|w1) = 0.9·c(w1w2)/c(w1) + 0.1·tf(w2)/T — in
    production the LM comes from a trusted reference corpus; the
    estimator, join shape and bucketing are identical), then tertile
    the corpus by mean log-probability (bucket 1 = most fluent).

    Scale shape: one bigram explode joined to the bigram-count and
    vocab tables (vocabulary-sized — AQE broadcasts them; at 100 TB
    the bigram join is the one corpus shuffle), a per-doc aggregation,
    and a 3-way ``global_ntile`` over the range-partitioned rank
    kernel — NO single-task Window anywhere. Output is 3 rows.

    HASH-STABLE by the ``text_unigram_logprob`` nano-nat construction:
    each bigram's log-prob is quantized to integer nano-nats on the
    identical double (`rint` ≡ `round_even`), per-doc sums are exact
    int64, the per-doc mean is ONE fixed division sequence of
    identical ints (IEEE-exact), and the ntile order is total
    (mean desc, doc_id). Docs with <2 tokens have no bigrams and are
    out of scope (un-scorable by a bigram LM) on both engines."""
    docs = _t(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id", F.explode(T.word_ngrams(F.col("text"), 2)).alias("g")
    ).select(
        "doc_id",
        F.split(F.col("g"), " ").getItem(0).alias("w1"),
        F.split(F.col("g"), " ").getItem(1).alias("w2"),
    )
    tok = docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("tf"))
    total = uni.agg(F.sum("tf").alias("total"))
    # r11 (guide §2.5 — VERDICT r10 item 1): the bigram count is a
    # groupBy with MAP-SIDE PARTIAL aggregation joined back onto the
    # stream, not a count Window. The r10 window shape was one exchange
    # but skew-UNSAFE: a window has no partial aggregation and AQE
    # cannot split a window partition, so at 100 TB one stop bigram
    # ("of the") serializes its entire row set into a single task's
    # sort buffer. Here hot keys collapse map-side (the count exchange
    # carries ≤ distinct-bigrams-per-task rows), and the join-back
    # probe is a shuffled-HASH join (no probe sort) that AQE's skew
    # handling CAN split. The bigram explode runs once per side — the
    # partial-agg side ships collapsed counts, so the extra pass is
    # narrow compute, not shuffle bytes.
    # persist the bigram stream: the count side and the probe side
    # share ONE explode+materialization (MEMORY_AND_DISK, LRU-evictable
    # — measured: recomputing the word_ngrams explode for the count
    # side cost ~+1 s at sf1 over the cached read; clearCache() after
    # consuming, as bench.py does)
    bg = bg.persist()
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        bg.join(bgc.hint("shuffle_hash"), ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("tf").alias("tf1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("tf").alias("tf2")), "w2")
        .crossJoin(F.broadcast(total))
    )
    qnat = F.expr(
        "CAST(rint(ln(0.9 * (CAST(c12 AS DOUBLE) / CAST(tf1 AS DOUBLE))"
        " + 0.1 * (CAST(tf2 AS DOUBLE) / CAST(total AS DOUBLE)))"
        " * 1000000000.0) AS BIGINT)"
    )
    perdoc = scored.select("doc_id", qnat.alias("qnat")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("qnat").alias("qsum")
    )
    # Order the tertile by the UNSCALED qsum/n_bigrams double — the exact
    # ORDER BY key the oracle uses.  Dividing by 1e9 first could collapse
    # two adjacent-but-distinct doubles into a tie (then broken by doc_id
    # in a different order than the oracle's value order); the /1e9 scale
    # lives only in the reported avg_lp output column.
    ord_key = F.col("qsum").cast("double") / F.col("n_bigrams").cast("double")
    avg_lp = ord_key / F.lit(1000000000.0)
    bucketed = global_ntile(
        perdoc.withColumn("ord_key", ord_key).withColumn("avg_lp", avg_lp),
        [F.col("ord_key").desc(), F.col("doc_id")],
        3,
        name="bucket",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").alias("n_bigrams"),
        _roundz(F.min("avg_lp"), 4).alias("min_avg_logprob"),
        _roundz(F.max("avg_lp"), 4).alias("max_avg_logprob"),
    )


@register(
    "mix_temperature_weights",
    f"""
    WITH t AS (SELECT lang, len({_SQL_TOKS}) AS n FROM documents),
    agg AS (SELECT lang, count(*) AS n_docs, sum(n) AS n_tokens
            FROM t GROUP BY lang),
    tot AS (SELECT sum(n_tokens) AS total FROM agg),
    q AS (SELECT lang, n_docs, n_tokens, tot.total AS total,
                 CAST(round_even(
                   pow(n_tokens::DOUBLE / tot.total::DOUBLE, 0.7)
                   * 1000000000.0, 0) AS BIGINT) AS qpow
          FROM agg CROSS JOIN tot),
    s AS (SELECT sum(qpow) AS qsum FROM q)
    SELECT lang, n_docs::BIGINT AS n_docs, n_tokens::BIGINT AS n_tokens,
           round(qpow::DOUBLE / s.qsum::DOUBLE, 6) + 0 AS mix_weight,
           round(qpow::DOUBLE / s.qsum::DOUBLE
                 * total::DOUBLE / n_tokens::DOUBLE, 6) + 0 AS epochs_at_budget
    FROM q CROSS JOIN s
    """,
)
def q_mix_temperature_weights(spark, sf_dir):
    """Temperature-based data-mix weights — the sampling schedule
    behind multilingual/multi-domain pretraining mixes (XLM-R §3.1,
    the Pile): per domain (here language), sampling weight
    w_s ∝ (tokens_s / total)^α with α = 0.7, which UPsamples the tail
    relative to its natural share, plus the effective epoch count each
    domain sustains when the training budget equals one full corpus
    pass (epochs = w_s · total / tokens_s — the over-sampling factor
    data teams watch to bound repetition of small domains).

    One token-length map + one |domains|-row aggregation; everything
    after the groupBy is algebra over a domain-count-sized frame
    (broadcast scalar joins — at 100 TB the corpus is touched once).
    HASH-STABLE: the only cross-row float reduction (the pow
    normalizer) is quantized to integer nano-units per domain and
    summed exactly; weights and epochs are then ONE fixed division
    sequence of identical doubles on both engines, rounded at 6."""
    docs = _t(spark, sf_dir, "documents")
    agg = docs.select(
        "lang", F.size(T.tokens(F.col("text"))).alias("n")
    ).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
    )
    total = agg.agg(F.sum("n_tokens").alias("total"))
    q = agg.crossJoin(F.broadcast(total)).withColumn(
        "qpow",
        F.expr(
            "CAST(rint(pow(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE),"
            " 0.7) * 1000000000.0) AS BIGINT)"
        ),
    )
    qsum = q.agg(F.sum("qpow").alias("qsum"))
    weight = F.col("qpow").cast("double") / F.col("qsum").cast("double")
    return q.crossJoin(F.broadcast(qsum)).select(
        "lang",
        "n_docs",
        "n_tokens",
        _roundz(weight, 6).alias("mix_weight"),
        _roundz(
            weight
            * F.col("total").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("epochs_at_budget"),
    )


@register(
    "vocab_coverage_curve",
    f"""
    WITH tok AS (SELECT unnest({_SQL_TOKS}) AS w FROM documents),
    uni AS (SELECT w, count(*) AS tf FROM tok GROUP BY w),
    ranked AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, w) AS rn
               FROM uni),
    tot AS (SELECT sum(tf) AS total, count(*) AS vocab FROM ranked),
    ks AS (SELECT unnest([64, 256, 1024, 4096, 16384]) AS k)
    SELECT ks.k::BIGINT AS vocab_size,
           sum(CASE WHEN r.rn <= ks.k THEN r.tf ELSE 0 END)::BIGINT
             AS covered_tokens,
           tot.total::BIGINT AS total_tokens,
           least(ks.k, tot.vocab)::BIGINT AS words_in_vocab,
           round(sum(CASE WHEN r.rn <= ks.k THEN r.tf ELSE 0 END)::DOUBLE
                 / tot.total::DOUBLE, 6) + 0 AS coverage
    FROM ks CROSS JOIN tot CROSS JOIN ranked r
    GROUP BY ks.k, tot.total, tot.vocab
    """,
)
def q_vocab_coverage_curve(spark, sf_dir):
    """Vocabulary coverage curve — the tokenizer-budget planning table:
    for candidate vocab sizes (64…16384), what fraction of all corpus
    tokens the top-k most frequent words cover (the complement is the
    OOV/byte-fallback rate a word-level vocab of that size eats).

    Scale shape: one token explode + vocabulary-sized aggregation;
    the ranking runs over the VOCAB (≪ corpus — the range-partitioned
    ``global_row_number`` kernel, no single-task Window), and the
    curve is a 5-row conditional aggregation over vocab × k. Exact
    integers plus one fixed division, hash-stable. The rank order is
    total (tf desc, word)."""
    docs = _t(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ranked = global_row_number(
        uni, [F.col("tf").desc(), F.col("w")], name="rn"
    )
    tot = ranked.agg(
        F.sum("tf").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    # the k-grid rides on the 1-row total (aggregate barrier — provably
    # bounded under the broadcast; a createDataFrame literal would ship
    # an opaque ExistingRDD the fact-side-broadcast guard rejects)
    ks = tot.select(
        F.explode(
            F.array(
                *[F.lit(k).cast("long") for k in (64, 256, 1024, 4096, 16384)]
            )
        ).alias("k"),
        "total",
        "vocab",
    )
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k", "total", "vocab")
        .agg(
            F.sum(F.when(F.col("rn") <= F.col("k"), F.col("tf")).otherwise(0))
            .alias("covered")
        )
        .select(
            F.col("k").alias("vocab_size"),
            F.col("covered").cast("long").alias("covered_tokens"),
            F.col("total").cast("long").alias("total_tokens"),
            F.least(F.col("k"), F.col("vocab")).cast("long")
            .alias("words_in_vocab"),
            _roundz(
                F.col("covered").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


@register(
    "seqlen_truncation_stats",
    f"""
    WITH t AS (SELECT len({_SQL_TOKS}) AS n FROM documents WHERE
               len({_SQL_TOKS}) > 0)
    SELECT CAST(floor(ln(n) / ln(2)) AS INTEGER) AS len_bucket_log2,
           count(*)::BIGINT AS n_docs,
           sum(n)::BIGINT AS n_tokens,
           sum(greatest(n - 32, 0))::BIGINT AS lost_at_ctx32,
           sum(greatest(n - 64, 0))::BIGINT AS lost_at_ctx64,
           sum(greatest(n - 128, 0))::BIGINT AS lost_at_ctx128
    FROM t GROUP BY 1
    """,
)
def q_seqlen_truncation_stats(spark, sf_dir):
    """Sequence-length histogram + truncation-loss table — the context-
    length planning stat: documents per dyadic length bucket and the
    exact token count a hard truncation at each candidate context
    length would discard (the "pack vs truncate" decision input;
    compare ``doc_pack_assignment``, which is the packing answer).

    One narrow map (token count per doc) + one bounded-cardinality
    aggregation (log2 buckets), map-side combinable; exact integers
    throughout except the bucket id itself, which is
    floor(ln(n)/ln 2) on BOTH engines (same libm ln on identical
    doubles — exact powers of two sit safely off the floor boundary
    because ln(2^k)/ln(2) errs below k+ulp, and a one-ulp wobble
    never crosses floor at these magnitudes)."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(F.size(T.tokens(F.col("text"))).alias("n")).where(
        F.col("n") > 0
    )
    return t.groupBy(
        F.floor(F.log(F.col("n").cast("double")) / F.log(F.lit(2.0)))
        .cast("int")
        .alias("len_bucket_log2")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.greatest(F.col("n") - 32, F.lit(0))).cast("long")
        .alias("lost_at_ctx32"),
        F.sum(F.greatest(F.col("n") - 64, F.lit(0))).cast("long")
        .alias("lost_at_ctx64"),
        F.sum(F.greatest(F.col("n") - 128, F.lit(0))).cast("long")
        .alias("lost_at_ctx128"),
    )


@register(
    "line_dedup_keep_first",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    nu AS (SELECT doc_id, toks,
                  CAST(ceil(len(toks) / 12.0) AS BIGINT) AS n_units FROM t),
    u AS (SELECT doc_id, i AS idx,
                 array_to_string(toks[(i*12+1):(i*12+12)], ' ') AS unit
          FROM nu, unnest(generate_series(0, n_units - 1)) AS g(i)),
    k AS (SELECT doc_id, idx, unit,
                 row_number() OVER (PARTITION BY unit
                                    ORDER BY doc_id, idx) AS rn
          FROM u),
    reb AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(unit, ' ' ORDER BY idx) AS cleaned_text
            FROM k WHERE rn = 1 GROUP BY doc_id)
    SELECT nu.doc_id, nu.n_units,
           coalesce(reb.n_kept, 0)::BIGINT AS n_kept,
           coalesce(reb.cleaned_text, '') AS cleaned_text
    FROM nu LEFT JOIN reb USING (doc_id)
    """,
)
def q_line_dedup_keep_first(spark, sf_dir):
    """Line/paragraph-level exact dedup with keep-first semantics
    (``operators/dedup.py::line_dedup_keep_first``) — the C4/Dolma
    crawl cleaner: every distinct unit survives only at its first
    global (doc_id, idx) occurrence and documents are rebuilt from
    their surviving units. Complements ``substring_dedup_clean``
    (which cuts verbatim k-gram RUNS anywhere) with the
    unit-boundary-aligned policy real crawl pipelines apply to
    boilerplate lines. Spark side is groupBy-struct-min + equi-join
    (no windows); the oracle proves the same keep-first relation via
    SQL row_number. Exact strings and integers — hash-stable."""
    from common_survey_data_pipeline_spark.operators.dedup import (
        line_dedup_keep_first,
    )

    docs = _t(spark, sf_dir, "documents")
    return line_dedup_keep_first(docs, "text", "doc_id", unit_tokens=12)


@register(
    "stratified_sample_exact",
    """
    SELECT lang, doc_id, CAST(rn AS INTEGER) AS sample_rank
    FROM (SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
    WHERE rn <= 20
    """,
)
def q_stratified_sample_exact(spark, sf_dir):
    """Exact-size stratified sampling — eval-set construction: exactly
    min(20, |stratum|) documents per language, selected by
    deterministic content-free hash order (md5 of the id), so the
    sample is reproducible across runs, engines and partitionings and
    unbiased w.r.t. any document property. Complements
    ``quality_weighted_sample`` (weighted Bernoulli) with the
    fixed-quota flavor evaluation suites need.

    Scale shape: per-stratum top-k via a PARTITIONED window (state
    O(1) per row; parallelism = #strata). When strata are few and
    huge (the crawl case: one 'en' stratum ≫ one executor), pre-filter
    by a hash-prefix bound first — keep hash < k/n_s·slack, verify
    ≥ k survivors per stratum, and rank only survivors; the keep-first
    order makes the two-phase plan return the identical sample."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id")
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= 20)
    )


@register(
    "skew_key_stats",
    """
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rn FROM c),
    n AS (SELECT count(*) AS n_keys, sum(cnt) AS n_rows,
                 max(cnt) AS max_cnt FROM c)
    SELECT n.n_rows::BIGINT AS n_rows,
           n.n_keys::BIGINT AS n_keys,
           n.max_cnt::BIGINT AS max_key_rows,
           r50.cnt::BIGINT AS p50_key_rows,
           r99.cnt::BIGINT AS p99_key_rows,
           round(n.max_cnt::DOUBLE * n.n_keys::DOUBLE / n.n_rows::DOUBLE, 6)
             + 0 AS skew_ratio
    FROM n
    JOIN r r50 ON r50.rn = CAST(ceil(0.50 * n.n_keys) AS BIGINT)
    JOIN r r99 ON r99.rn = CAST(ceil(0.99 * n.n_keys) AS BIGINT)
    """,
)
def q_skew_key_stats(spark, sf_dir):
    """Shuffle-key skew diagnosis — the pre-join advisor every big
    pipeline runs before keying a 100 TB shuffle: per-key row counts
    for the candidate key (events.user_id), their max / median / p99
    (EXACT, by rank over the key-count table — keys ≪ rows, so the
    rank runs over the small side), and the skew ratio
    max·n_keys/n_rows (hottest key vs mean — >10 says salt the join
    or lean on AQE skew-split; compare ``j8_salted_skew_join``, the
    treatment this query decides on).

    Scale shape: one map-side-combinable groupBy on the key, then the
    ``global_row_number`` range-partition kernel over the KEY-COUNT
    table (never the raw rows), and three 1-row broadcast joins.
    Exact integers everywhere; the ratio is one fixed division
    sequence of identical ints, rounded at 6."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    r = global_row_number(c, [F.col("cnt"), F.col("user_id")], name="rn")
    n = c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    # the two percentile target ranks ride on the 1-row aggregate
    # (provably bounded broadcast); the ranked key-count table stays on
    # the probe side, and the 2-row hit set re-reduces through its own
    # aggregate before the final scalar join
    pct = n.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("which"),
                    F.ceil(0.50 * F.col("n_keys")).alias("rn"),
                ),
                F.struct(
                    F.lit("p99").alias("which"),
                    F.ceil(0.99 * F.col("n_keys")).alias("rn"),
                ),
            )
        ).alias("s")
    ).select(F.col("s.which").alias("which"), F.col("s.rn").alias("rn"))
    hits = (
        r.join(F.broadcast(pct), "rn")
        .agg(
            F.max(F.when(F.col("which") == "p50", F.col("cnt"))).alias("p50"),
            F.max(F.when(F.col("which") == "p99", F.col("cnt"))).alias("p99"),
        )
    )
    return (
        n.crossJoin(F.broadcast(hits))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("max_cnt").cast("long").alias("max_key_rows"),
            F.col("p50").cast("long").alias("p50_key_rows"),
            F.col("p99").cast("long").alias("p99_key_rows"),
            _roundz(
                F.col("max_cnt").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
        )
    )


@register(
    "ngram_entropy_diversity",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT toks[pos] AS w
            FROM t, unnest(generate_series(1, len(toks))) AS u(pos)),
    uni AS (SELECT w, count(*) AS tf FROM tok GROUP BY w),
    bg AS (SELECT toks[pos] || ' ' || toks[pos + 1] AS g
           FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(pos)),
    bgc AS (SELECT g, count(*) AS tf FROM bg GROUP BY g),
    u1 AS (SELECT count(*) AS types, sum(tf) AS total,
                  sum(tf * CAST(round_even(ln(tf::DOUBLE) / ln(2.0)
                                           * 1000000.0, 0) AS BIGINT))
                    AS qlogsum
           FROM uni),
    b1 AS (SELECT count(*) AS types, sum(tf) AS total,
                  sum(tf * CAST(round_even(ln(tf::DOUBLE) / ln(2.0)
                                           * 1000000.0, 0) AS BIGINT))
                    AS qlogsum
           FROM bgc)
    SELECT u1.total::BIGINT AS n_tokens,
           u1.types::BIGINT AS unigram_types,
           b1.types::BIGINT AS bigram_types,
           round(ln(u1.total::DOUBLE) / ln(2.0)
                 - u1.qlogsum::DOUBLE / u1.total::DOUBLE / 1000000.0, 6) + 0
             AS unigram_entropy_bits,
           round(ln(b1.total::DOUBLE) / ln(2.0)
                 - b1.qlogsum::DOUBLE / b1.total::DOUBLE / 1000000.0, 6) + 0
             AS bigram_entropy_bits,
           round(u1.types::DOUBLE / u1.total::DOUBLE, 6) + 0
             AS type_token_ratio
    FROM u1 CROSS JOIN b1
    """,
)
def q_ngram_entropy_diversity(spark, sf_dir):
    """Corpus diversity dashboard — Shannon entropy of the unigram and
    bigram distributions (bits/gram) plus type-token ratio: the
    repetitiveness/diversity numbers data teams track across corpus
    versions (entropy collapsing = template spam flooding the crawl;
    see ``text_repetition`` for the per-document view this aggregates
    corpus-wide).

    H = log2(T) − (Σ tf·log2 tf)/T, computed over the COUNT tables
    (vocabulary-sized, never the raw token stream after the one
    grouping shuffle). HASH-STABLE: log2(tf) is quantized to integer
    MICRO-BITS per distinct count (rint ≡ round_even on identical
    doubles), tf·qlog sums are exact int64 (Σ ≤ T·max|qlog| ≈ 2⁵² at
    sf1 — re-quantize coarser before 2⁶³ at true corpus scale), and
    the final entropy is one fixed double sequence, rounded at 6."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
    bg = docs.select(F.explode(T.word_ngrams(F.col("text"), 2)).alias("w"))
    qlog = F.expr(
        "tf * CAST(rint(ln(CAST(tf AS DOUBLE)) / ln(2.0) * 1000000.0)"
        " AS BIGINT)"
    )

    def stats(df):
        cnt = df.groupBy("w").agg(F.count(F.lit(1)).alias("tf"))
        return cnt.agg(
            F.count(F.lit(1)).alias("types"),
            F.sum("tf").alias("total"),
            F.sum(qlog).alias("qlogsum"),
        )

    u1 = stats(tok)
    b1 = stats(bg).select(
        F.col("types").alias("btypes"),
        F.col("total").alias("btotal"),
        F.col("qlogsum").alias("bqlogsum"),
    )
    ent = lambda total, qlogsum: _roundz(  # noqa: E731
        F.log2(F.col(total).cast("double"))
        - F.col(qlogsum).cast("double")
        / F.col(total).cast("double")
        / F.lit(1000000.0),
        6,
    )
    return u1.crossJoin(F.broadcast(b1)).select(
        F.col("total").cast("long").alias("n_tokens"),
        F.col("types").cast("long").alias("unigram_types"),
        F.col("btypes").cast("long").alias("bigram_types"),
        ent("total", "qlogsum").alias("unigram_entropy_bits"),
        ent("btotal", "bqlogsum").alias("bigram_entropy_bits"),
        _roundz(
            F.col("types").cast("double") / F.col("total").cast("double"), 6
        ).alias("type_token_ratio"),
    )


@register(
    "pack_efficiency",
    f"""
    WITH packed AS (
      SELECT doc_id, n_tokens,
             cum_tokens,
             ((cum_tokens - n_tokens) // 2048) AS pack_id
      FROM (SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum_tokens
            FROM (SELECT doc_id, len({_SQL_TOKS})::BIGINT AS n_tokens
                  FROM documents)))
    SELECT pack_id::BIGINT AS pack_id,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS pack_tokens,
           sum(CASE WHEN cum_tokens > (pack_id + 1) * 2048
                    THEN 1 ELSE 0 END)::BIGINT AS n_straddlers,
           sum(greatest(cum_tokens - (pack_id + 1) * 2048, 0))::BIGINT
             AS overflow_tokens
    FROM packed GROUP BY pack_id
    """,
)
def q_pack_efficiency(spark, sf_dir):
    """Packing-efficiency report over the 2048-token shard assignment
    (``doc_pack_assignment``'s output, aggregated per shard): documents
    and tokens per pack, how many documents STRADDLE the shard
    boundary, and the token overflow past it — the numbers that decide
    the split-documents-vs-pad policy (straddle rate ≈ mean_doc_len /
    2048; overflow tokens are what gets either truncated, padded
    around, or spilled by the packer).

    Same distributed prefix-sum kernel as the assignment itself
    (``operators/ranking.py::global_cumsum`` — one range shuffle),
    then a pack-keyed aggregation with map-side partials. Exact
    integers throughout."""
    docs = _t(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    cum = global_cumsum(with_tok, ["doc_id"], "n_tokens", "cum_tokens")
    packed = cum.select(
        "n_tokens",
        "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 2048)
        .cast("long")
        .alias("pack_id"),
    )
    boundary = (F.col("pack_id") + 1) * 2048
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.sum((F.col("cum_tokens") > boundary).cast("long"))
        .cast("long")
        .alias("n_straddlers"),
        F.sum(F.greatest(F.col("cum_tokens") - boundary, F.lit(0)))
        .cast("long")
        .alias("overflow_tokens"),
    )


@register(
    "split_contamination_matrix",
    f"""
    WITH t AS (SELECT doc_id % 10 AS bucket, {_SQL_TOKS} AS toks
               FROM documents),
    s AS (SELECT CASE WHEN bucket < 8 THEN 'train'
                      WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
                 unnest({_sql_word_grams(8)}) AS gram
          FROM t),
    d AS (SELECT DISTINCT split, gram FROM s),
    diag AS (SELECT split AS split_a, split AS split_b,
                    count(*) AS shared_grams
             FROM d GROUP BY split),
    cross_ AS (SELECT a.split AS split_a, b.split AS split_b,
                      count(*) AS shared_grams
               FROM d a JOIN d b
                 ON a.gram = b.gram AND a.split < b.split
               GROUP BY a.split, b.split)
    SELECT split_a, split_b, shared_grams::BIGINT AS shared_grams
    FROM (SELECT * FROM diag UNION ALL SELECT * FROM cross_)
    """,
)
def q_split_contamination_matrix(spark, sf_dir):
    """Train/val/test contamination matrix — the release-gate audit
    run before shipping an eval split: distinct 8-gram vocabulary per
    split (diagonal) and the pairwise count of 8-grams SHARED across
    splits (off-diagonal; non-zero train∩val / train∩test cells are
    exactly what ``decontaminate_ngrams`` then removes). Splits are
    the standard hash buckets (doc_id mod 10 → 8/1/1).

    Scale shape: one shingle explode → per-split distinct (one
    gram-keyed shuffle with map-side partial distinct) → a gram-keyed
    self-equi-join of the DISTINCT table (bounded fanout: ≤ |splits|
    rows per gram, so the join output is ≤ 3× the gram table — never
    quadratic in the corpus). Exact integers."""
    docs = _t(spark, sf_dir, "documents")
    split = (
        F.when(F.col("doc_id") % 10 < 8, "train")
        .when(F.col("doc_id") % 10 == 8, "val")
        .otherwise("test")
    )
    # r10 restructure (guide §2.3/§2.4, hash-identical by construction):
    # the old shape materialized the distinct (split, gram) table and
    # SELF-JOINED it on the full 8-word gram STRINGS (one distinct
    # exchange + both join probes re-shuffling ~60-byte keys). Now ONE
    # gram-keyed aggregation collects each gram's split set (≤ 3
    # entries — collect_set partially aggregates map-side), and every
    # matrix cell the gram contributes to — its diagonal memberships
    # (s,s) and its sorted i<j cross pairs — is emitted by a narrow
    # expression and counted. The corpus gram stream is shuffled once
    # instead of three times, and nothing ever joins on a long string
    # key.
    g = (
        docs.select(
            split.alias("split"),
            F.explode(T.word_shingles(F.col("text"), 8)).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.sort_array(F.collect_set("split")).alias("__ss"))
    )
    cells = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("__ss")),
            lambda i: F.transform(
                F.slice(F.col("__ss"), i, F.size("__ss")),
                lambda b: F.struct(
                    F.element_at(F.col("__ss"), i).alias("split_a"),
                    b.alias("split_b"),
                ),
            ),
        )
    )
    return (
        g.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.split_a").alias("split_a"), F.col("c.split_b").alias("split_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
    )


@register(
    "embedding_drift_stats",
    """
    WITH q AS (
      SELECT CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'cand' END AS side,
             i AS pos,
             CAST(round_even(embedding[i]::DOUBLE * 1000000000000.0, 0)
                  AS BIGINT) AS qv
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
    m AS (SELECT pos, side, count(*) AS n, sum(qv) AS qsum
          FROM q GROUP BY pos, side),
    w AS (SELECT pos,
                 max(CASE WHEN side = 'ref' THEN n END) AS n_ref,
                 max(CASE WHEN side = 'cand' THEN n END) AS n_cand,
                 max(CASE WHEN side = 'ref' THEN qsum END) AS qs_ref,
                 max(CASE WHEN side = 'cand' THEN qsum END) AS qs_cand
          FROM m GROUP BY pos)
    SELECT pos::INTEGER AS pos, n_ref::BIGINT AS n_ref,
           n_cand::BIGINT AS n_cand,
           round(abs(qs_ref::DOUBLE / n_ref::DOUBLE
                     - qs_cand::DOUBLE / n_cand::DOUBLE)
                 / 1000000000000.0, 6) + 0 AS mean_shift
    FROM w
    """,
)
def q_embedding_drift_stats(spark, sf_dir):
    """Embedding-distribution drift monitor — the train/serve skew
    check run when a new encoder version (or a new crawl batch) lands:
    per dimension, the absolute shift between the reference batch's
    mean and the candidate batch's mean (batches = vec_id parity here;
    in production, yesterday's corpus vs today's). A spiking dimension
    means the encoder or the upstream distribution moved — re-run
    ``embedding_centroids``/IVF training before trusting the index.

    Same relational vector-mean as ``embedding_centroids`` (posexplode
    → (pos, side)-keyed sum of 1e-12-quantized components in
    decimal(38,0) — exact at any batch size), then a 64-row pivot.
    HASH-STABLE: exact integer sums, one fixed double sequence per
    cell, rounded at 6."""
    emb = _t(spark, sf_dir, "embeddings")
    q = F.expr(
        "CAST(CAST(rint(CAST(v AS DOUBLE) * 1000000000000.0) AS BIGINT)"
        " AS DECIMAL(20,0))"
    )
    side = F.when(F.col("vec_id") % 2 == 0, "ref").otherwise("cand")
    m = (
        emb.select(
            side.alias("side"), F.posexplode("embedding").alias("pos0", "v")
        )
        .groupBy((F.col("pos0") + 1).cast("int").alias("pos"), "side")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(q).alias("qsum"))
    )
    w = m.groupBy("pos").agg(
        F.max(F.when(F.col("side") == "ref", F.col("n"))).alias("n_ref"),
        F.max(F.when(F.col("side") == "cand", F.col("n"))).alias("n_cand"),
        F.max(F.when(F.col("side") == "ref", F.col("qsum"))).alias("qs_ref"),
        F.max(F.when(F.col("side") == "cand", F.col("qsum"))).alias("qs_cand"),
    )
    return w.select(
        "pos",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cand").cast("long").alias("n_cand"),
        _roundz(
            F.abs(
                F.col("qs_ref").cast("double") / F.col("n_ref").cast("double")
                - F.col("qs_cand").cast("double")
                / F.col("n_cand").cast("double")
            )
            / F.lit(1000000000000.0),
            6,
        ).alias("mean_shift"),
    )


@register(
    "quality_score_calibration",
    f"""
    WITH lex(w, wt) AS (VALUES
      {", ".join(f"('{w}', {wt})" for w, wt in _QUALITY_LEXICON)}
    ),
    t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    hit AS (SELECT tok.doc_id, CAST(sum(lex.wt) AS BIGINT) AS wsum
            FROM tok JOIN lex USING (w) GROUP BY tok.doc_id),
    sc AS (SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
                  ({_QUALITY_BIAS} + coalesce(hit.wsum, 0))::BIGINT
                    AS logit_micro
           FROM t LEFT JOIN hit USING (doc_id)),
    d AS (SELECT doc_id, n_tokens, logit_micro,
                 ntile(10) OVER (ORDER BY logit_micro DESC, doc_id)
                   AS decile
          FROM sc)
    SELECT CAST(decile AS INTEGER) AS decile,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           min(logit_micro)::BIGINT AS min_logit_micro,
           max(logit_micro)::BIGINT AS max_logit_micro,
           round(sum(CASE WHEN logit_micro > 0 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 6) + 0 AS keep_rate
    FROM d GROUP BY decile
    """,
)
def q_quality_score_calibration(spark, sf_dir):
    """Classifier calibration table — the threshold-tuning report for
    the ``quality_logit_score`` linear model: corpus deciles by logit
    (decile 1 = highest-scoring), each with document/token volume, the
    exact logit range, and the keep-rate at the current threshold
    (logit > 0). Reading it answers "how many tokens does moving the
    threshold one decile cost?" — the operating-point decision every
    quality-filter deployment makes.

    Reuses the shared ``_quality_doc_scores`` stage (broadcast literal
    lexicon — model inference stays a join, no UDF); the decile runs
    on ``global_ntile``'s range-partition kernel (no single-task
    Window). Exact integers except the keep-rate, one fixed division
    rounded at 6 — and the ntile order (logit desc, doc_id) is total,
    so bucket membership is engine-identical."""
    docs = _t(spark, sf_dir, "documents")
    sc = _quality_doc_scores(spark, docs)
    d = global_ntile(
        sc,
        [F.col("logit_micro").desc(), F.col("doc_id")],
        10,
        name="decile",
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("logit_micro").alias("min_logit_micro"),
        F.max("logit_micro").alias("max_logit_micro"),
        _roundz(
            F.sum((F.col("logit_micro") > 0).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("keep_rate"),
    )


@register(
    "events_join_state_accounting",
    """
    WITH r0 AS (
      SELECT user_id, ts AS r_ts, event_id,
             event_id + CASE WHEN event_id % 13 = 0 THEN 997
                             WHEN event_id % 5 = 0 THEN 7
                             ELSE 0 END AS arr
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, r_ts,
             max(r_ts) OVER (PARTITION BY event_id % 8
                             ORDER BY arr, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)
               - INTERVAL 30 MINUTE AS wm
      FROM r0
    ),
    l AS (SELECT user_id, ts AS l_ts FROM events
          WHERE event_type = 'view'),
    pairs AS (
      SELECT r.r_ts,
             (r.wm IS NOT NULL
              AND r.wm > l.l_ts + INTERVAL 1 HOUR) AS lost
      FROM r JOIN l ON r.user_id = l.user_id
        AND l.l_ts <= r.r_ts
        AND l.l_ts >= r.r_ts - INTERVAL 1 HOUR
    )
    SELECT date_trunc('hour', r_ts)::TIMESTAMP AS window_start,
           count(*) AS n_pairs_batch,
           CAST(sum(lost::BIGINT) AS BIGINT) AS n_pairs_lost,
           CAST(sum((NOT lost)::BIGINT) AS BIGINT) AS n_pairs_streamed
    FROM pairs GROUP BY 1
    """,
)
def q_events_join_state_accounting(spark, sf_dir):
    """Stream-stream join state accounting
    (``streaming/events.py::join_state_accounting``) — the watermark-
    cost report for the ``attribution_join`` shape: per purchase-hour,
    the view→purchase pairs the unbounded batch join finds vs the
    pairs a 30-minute-watermark streaming join would MISS because the
    view's join state was evicted (watermark past ``view.ts + 1h``)
    before the late purchase arrived. Completes the streaming parity
    set: ``events_late_data_accounting`` prices the watermark for
    AGGREGATIONS, this prices it for JOIN STATE — the two numbers an
    operator weighs when choosing the delay. Same pinned jittered-
    arrival model, exact integers, hash-stable."""
    from common_survey_data_pipeline_spark.streaming.events import (
        join_state_accounting,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "arr",
        F.col("event_id")
        + F.when(F.col("event_id") % 13 == 0, 997)
        .when(F.col("event_id") % 5 == 0, 7)
        .otherwise(0),
    )
    return join_state_accounting(ev, arrival_col="arr")


@register(
    "doc_language_confusion",
    f"""
    SELECT lang AS true_lang,
           CASE WHEN best = 0 THEN 'unknown'
                WHEN s_de = best THEN 'de'
                WHEN s_en = best THEN 'en'
                WHEN s_es = best THEN 'es'
                WHEN s_fr = best THEN 'fr'
                ELSE 'unknown' END AS pred_lang,
           count(*) AS n_docs
    FROM (SELECT lang,
                 {_sql_lang_score('de')} AS s_de,
                 {_sql_lang_score('en')} AS s_en,
                 {_sql_lang_score('es')} AS s_es,
                 {_sql_lang_score('fr')} AS s_fr,
                 greatest({_sql_lang_score('de')}, {_sql_lang_score('en')},
                          {_sql_lang_score('es')}, {_sql_lang_score('fr')})
                   AS best
          FROM documents)
    GROUP BY 1, 2
    """,
)
def q_doc_language_confusion(spark, sf_dir):
    """Language-ID confusion matrix — the classifier-eval report for
    the ``text_lang_id`` stopword model against the corpus's labeled
    languages: (true_lang, pred_lang, n_docs) cells, including the
    'zh'→'unknown' column the 4-language stopword model cannot see
    and the cross-language confusions quality pipelines track before
    trusting a lang filter (compare ``curate_corpus``, which APPLIES
    the prediction; this measures it). One narrow map + one
    |langs|²-bounded aggregation — exact integers."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("true_lang"),
            T.lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "winnowing_containment",
    """
    WITH fp AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM (SELECT doc_id, i, md5(substr(text, i::INTEGER, 8)) AS h
              FROM documents,
                   unnest(range(1, greatest(length(text) - 8 + 2, 1))) AS t(i)))
    ),
    dfreq AS (SELECT fp, count(*) AS df FROM fp GROUP BY fp),
    inf AS (SELECT fp.doc_id, fp.fp, dfreq.df FROM fp JOIN dfreq USING (fp)
            WHERE dfreq.df <= 64),
    nfp AS (SELECT doc_id, count(*) AS n_fp FROM inf GROUP BY doc_id),
    keep AS (SELECT doc_id, fp FROM inf WHERE df >= 2),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
      FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.id_a, p.id_b, p.shared_fps,
           round(p.shared_fps::DOUBLE
                 / least(na.n_fp, nb.n_fp)::DOUBLE, 6) + 0 AS containment
    FROM pairs p
    JOIN nfp na ON na.doc_id = p.id_a
    JOIN nfp nb ON nb.doc_id = p.id_b
    WHERE p.shared_fps >= 8
      AND p.shared_fps::DOUBLE / least(na.n_fp, nb.n_fp)::DOUBLE >= 0.5
    """,
)
def q_winnowing_containment(spark, sf_dir):
    """Asymmetric CONTAINMENT detection via winnowing fingerprints —
    the MOSS-style excerpt/quotation detector that symmetric Jaccard
    dedup misses: a short document pasted inside a long one has low
    Jaccard but containment ≈ 1 (shared fingerprints over the SMALLER
    document's sketch). Pairs need containment ≥ 0.5 AND ≥ 8 shared fingerprints
    (the minimum-evidence floor that keeps tiny sketches from
    certifying on 2-of-3 coincidences).

    Scale shape: reuses ``text_fingerprints``' winnowed sketch (the
    per-doc distinct fingerprint table ≪ text), and measures
    containment over the INFORMATIVE sketch — fingerprints shared by
    >64 documents are excluded from BOTH the pair join and the
    denominator (the MOSS stop-fingerprint rule: they are corpus
    boilerplate, carry no pair evidence, and bound the self-join
    fanout at df² ≤ 4096 per fingerprint instead of corpus²;
    dropping them from only the numerator would deflate containment
    as the corpus grows — the round-7 first cut returned zero pairs
    at sf0.1 for exactly that reason). The oracle applies the
    identical rule, so parity is exact; candidate pairs form on a
    plain fp-keyed equi-join and aggregate map-side. The containment
    ratio divides exact integers, rounded at 6 — hash-stable."""
    # r10 restructure (guide §2.3/§2.4, identical output proven by a
    # committed A/B): pairs are generated from the per-fp doc-id list —
    # bounded at 64 ids by the stop-fingerprint rule BEFORE
    # collect_list, so the array is hub-safe at any corpus size — with
    # an i<j expression expansion replacing the old fp-keyed SELF-JOIN.
    #
    # r11 (guide §2.5 — VERDICT r10 item 1): document frequency is a
    # groupBy count with MAP-SIDE PARTIAL aggregation joined back, not
    # the r10 count Window — a window has no partial aggregation and
    # AQE cannot split a window partition, so one boilerplate
    # fingerprint would serialize its whole row set into a single
    # task's sort buffer at 100 TB. Hot fps collapse map-side in the
    # count, the ≤64 stop-fingerprint filter shrinks the build side
    # BEFORE the join (boilerplate fps never enter the hash table), and
    # the shuffled-HASH probe is AQE-skew-splittable. The winnowed
    # sketch is cached so the count side and the probe side share one
    # materialization; the joined informative sketch is cached too
    # (it feeds the denominator and the pair generator). clearCache
    # after consuming in long-lived sessions, as bench.py does.
    fps = q_text_fp(spark, sf_dir).cache()
    dfreq = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= 64)
    )
    inf = fps.join(dfreq.hint("shuffle_hash"), "fp").cache()
    nfp = inf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    # df >= 2 keeps only fps that can witness a pair; ids sorted so the
    # i<j expansion emits id_a < id_b exactly like the old self-join
    g = (
        inf.where(F.col("__df") >= 2)
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("__ids"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("__ids")),
            lambda i: F.transform(
                F.slice(F.col("__ids"), i + 1, F.size("__ids")),
                lambda b: F.struct(
                    F.element_at(F.col("__ids"), i).alias("id_a"),
                    b.alias("id_b"),
                ),
            ),
        )
    )
    pairs = (
        g.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    na = nfp.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("n_a"))
    nb = nfp.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("n_b"))
    cont = F.col("shared_fps").cast("double") / F.least(
        F.col("n_a"), F.col("n_b")
    ).cast("double")
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .where((F.col("shared_fps") >= 8) & (cont >= 0.5))
        .select(
            "id_a",
            "id_b",
            "shared_fps",
            _roundz(cont, 6).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Flagship entry query
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region→nation revenue rollup (q5 star join) — exercises broadcast
    joins, partial aggregation, and parquet pushdown in one plan."""
    return q_q5(spark, sf_dir)
