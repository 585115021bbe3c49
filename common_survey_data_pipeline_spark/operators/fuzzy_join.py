"""String-similarity (Levenshtein) join — the engine's flagship operator.

Re-expresses ``fuzzyjoin::stringdist_left_join(method="lv")`` as used at
``/root/reference/varinfo-update.R:99-105``: a left outer theta-join on
``levenshtein(left_text, right_text) <= max_dist`` that emits the
distance as a column; a left row with k matches fans out to k rows, and
an unmatched left row survives with NULL right columns.

Two physical strategies (SURVEY.md §4.2):

``broadcast``
    BroadcastNestedLoopJoin with Spark's bounded ``levenshtein(l, r,
    threshold)`` (early-exit, Spark >= 3.5). Right for a small right
    side (the reference's ~260-variable survey) — no shuffle at all,
    the left side streams through in place.

``blocked``
    Length-band blocking for big×big joins: ``|len(a) - len(b)| <=
    max_dist`` is a necessary condition for ``lv(a,b) <= max_dist``, so
    bucket left rows by ``floor(len / (max_dist+1))`` and explode each
    right row to every bucket its admissible length band overlaps. The
    theta-join becomes an EQUI join on the bucket id — shuffle-
    partitionable, AQE-skew-splittable, scalable to arbitrarily large
    sides — followed by the cheap length filter and the bounded
    Levenshtein on surviving candidates only. Candidate generation runs
    on DISTINCT left keys, so cost scales with text cardinality, not row
    count; results re-attach to the left by an equi join. Caveat: when
    lengths barely vary (ID-like keys, fixed-width codes) every row
    lands in the same band and the candidate set degenerates toward
    |L|×|R| — that shape belongs to ``deletion``.

``deletion``
    Deletion-neighborhood blocking (the public FastSS / SymSpell
    family) for big×big joins on SHORT keys at small ``max_dist``:
    every string emits the set of variants reachable by deleting up to
    ``max_dist`` characters; ``lv(a,b) <= d`` implies a and b share a
    variant (delete the substituted/deleted chars from a, the
    substituted/inserted ones from b), so an EQUI join on the variant
    string finds every true pair, sharing a variant only bounds
    ``lv <= 2d``, and the bounded Levenshtein verify removes the false
    positives. Candidate volume tracks TRUE matches (variant keys are
    near-unique), not bucket density — the only strategy that survives
    constant-length 100M-row ID pools. Key fan-out is C(len, <=d):
    linear in length at d=1, quadratic at d=2, unsupported beyond.

Both strategies produce identical results (property-tested in
``tests/test_fuzzy_join.py``).

NULL semantics: a NULL left key never matches (Levenshtein with NULL is
NULL). The reference avoids NULLs by pre-filling NA→"" before joining
(varinfo-update.R:98) and appending an empty-text sentinel row on the
right (:61) so empty-text rows match at distance 0; that normalization
lives in the pipeline layer, not here.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

_LEN = "__csdp_len"
_BUCKET = "__csdp_bucket"
_VAR = "__csdp_var"


def _q(name: str) -> str:
    """Backtick-quote a column name (survey columns contain dots, e.g.
    ``QuestionText.2023``, which Spark would otherwise parse as struct
    field navigation)."""
    return "`" + name.replace("`", "``") + "`"


def stringdist_left_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int = 6,
    distance_col: str = "string_distance",
    strategy: str = "auto",
    broadcast_cutoff: int = 10_000,
) -> DataFrame:
    """Left outer join on ``levenshtein(left[left_on], right[right_on])
    <= max_dist``, emitting the distance as ``distance_col``.

    Output columns: all of ``left`` then all of ``right`` then
    ``distance_col`` (INT, NULL for unmatched left rows). ``left_on`` and
    ``right_on`` must be distinct names (rename beforehand otherwise).

    ``strategy='auto'`` picks the physical plan by statistics, like a
    cost-based optimizer: the right side is counted once, and a small
    right side (≤ ``broadcast_cutoff`` rows — the reference's ~260
    survey variables by a wide margin) takes the shuffle-free
    broadcast-NLJ with bounded Levenshtein. A larger right side takes
    deletion-neighborhood blocking when the key shape allows it
    (``max_dist`` ≤ 2 and right keys ≤ 64 chars — one cheap max-length
    aggregate), else the length-band blocked equi-join.
    """
    if left_on == right_on:
        raise ValueError("left_on and right_on must differ; rename one side first")
    if strategy == "auto":
        if right.count() <= broadcast_cutoff:
            strategy = "broadcast"
        else:
            max_len = right.agg(
                F.max(F.length(_q(right_on))).alias("m")
            ).first()["m"]
            strategy = (
                "deletion" if max_dist <= 2 and (max_len or 0) <= 64 else "blocked"
            )
    if strategy == "broadcast":
        return _broadcast_nlj(left, right, left_on, right_on, max_dist, distance_col)
    if strategy == "blocked":
        return _blocked(left, right, left_on, right_on, max_dist, distance_col)
    if strategy == "deletion":
        return _deletion(left, right, left_on, right_on, max_dist, distance_col)
    raise ValueError(f"unknown strategy: {strategy!r}")


def _bounded_lv(l: Column, r: Column, max_dist: int) -> Column:
    """Bounded Levenshtein: distance if <= max_dist else NULL.

    Spark's 3-arg ``levenshtein`` early-exits past the threshold and
    returns -1; map that sentinel to NULL so it composes with filters
    and left-join semantics.
    """
    d = F.levenshtein(l, r, max_dist)
    return F.when(d >= 0, d)


def _broadcast_nlj(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int,
    distance_col: str,
) -> DataFrame:
    lk, rk = "__csdp_lk", "__csdp_rk"
    l2 = left.withColumn(lk, F.col(_q(left_on)))
    r2 = right.withColumn(rk, F.col(_q(right_on)))
    cond = _bounded_lv(l2[lk], r2[rk], max_dist).isNotNull()
    joined = l2.join(F.broadcast(r2), cond, "left")
    return joined.withColumn(
        distance_col,
        _bounded_lv(F.col(lk), F.col(rk), max_dist).cast("int"),
    ).drop(lk, rk)


def _blocked(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int,
    distance_col: str,
) -> DataFrame:
    """Length-band blocked similarity join; equivalent to the NLJ form."""
    width = max_dist + 1

    # Candidate generation over DISTINCT left texts: cost is bounded by
    # key cardinality, and the final re-attach is a plain equi join that
    # Catalyst/AQE can broadcast or shuffle as sizes dictate.
    lt = (
        left.select(F.col(_q(left_on)))
        .where(F.col(_q(left_on)).isNotNull())
        .distinct()
        .withColumn(_LEN, F.length(_q(left_on)))
        .withColumn(_BUCKET, F.floor(F.col(_LEN) / width))
    )
    rt = (
        right.withColumn(_LEN + "_r", F.length(_q(right_on)))
        .withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor((F.col(_LEN + "_r") - max_dist) / width),
                    F.floor((F.col(_LEN + "_r") + max_dist) / width),
                )
            ),
        )
    )
    cand = (
        lt.join(rt, _BUCKET)
        .where(F.abs(F.col(_LEN) - F.col(_LEN + "_r")) <= max_dist)
        .withColumn(
            distance_col, _bounded_lv(F.col(_q(left_on)), F.col(_q(right_on)), max_dist)
        )
        .where(F.col(distance_col).isNotNull())
        .drop(_LEN, _LEN + "_r", _BUCKET)
        .withColumn(distance_col, F.col(distance_col).cast("int"))
    )
    # Re-attach matches to the full left side; unmatched lefts (including
    # NULL keys, which never equi-join) survive with NULL right columns.
    return left.join(cand, on=left_on, how="left")


def _delete_one(col: Column) -> Column:
    """Array of every string reachable by deleting exactly one char."""
    return F.when(
        F.length(col) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - F.lit(1)),
                col.substr(i + F.lit(1), F.length(col)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _variants(col: Column, max_dist: int) -> Column:
    """Deletion neighborhood: the string plus every variant reachable
    with ≤ ``max_dist`` character deletions (distinct)."""
    one = _delete_one(col)
    if max_dist == 1:
        return F.array_distinct(F.concat(F.array(col), one))
    two = F.flatten(F.transform(one, _delete_one))
    return F.array_distinct(F.concat(F.array(col), one, two))


def _deletion(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int,
    distance_col: str,
) -> DataFrame:
    """Deletion-neighborhood blocked similarity join (FastSS/SymSpell
    family); equivalent to the NLJ form for ``max_dist`` in {1, 2}.

    ``lv(a, b) <= d`` guarantees a shared ≤d-deletion variant (delete
    a's substituted+deleted chars and b's substituted+inserted chars
    from an optimal alignment); sharing one only guarantees
    ``lv <= 2d``, so candidates are verified with the bounded
    Levenshtein. Candidate generation runs on DISTINCT texts of BOTH
    sides — variant keys are near-unique, so the equi-join's candidate
    volume tracks true matches, not bucket density."""
    if not 1 <= max_dist <= 2:
        raise ValueError(
            "deletion strategy supports max_dist in {1, 2} (key fan-out is "
            "C(len, <=d)); use 'blocked' or 'broadcast' for larger distances"
        )
    lt = (
        left.select(F.col(_q(left_on)))
        .where(F.col(_q(left_on)).isNotNull())
        .distinct()
        .withColumn(_VAR, F.explode(_variants(F.col(_q(left_on)), max_dist)))
    )
    rt = (
        right.select(F.col(_q(right_on)))
        .where(F.col(_q(right_on)).isNotNull())
        .distinct()
        .withColumn(_VAR, F.explode(_variants(F.col(_q(right_on)), max_dist)))
    )
    # Verify BEFORE deduplicating: the bounded Levenshtein is a map-side
    # filter, so the dropDuplicates shuffle only carries true matches
    # (candidates sharing a variant are bounded by lv <= 2d — roughly
    # half die here at d=1).
    pairs = (
        lt.join(rt, _VAR)
        .drop(_VAR)
        .withColumn(
            distance_col, _bounded_lv(F.col(_q(left_on)), F.col(_q(right_on)), max_dist)
        )
        .where(F.col(distance_col).isNotNull())
        .dropDuplicates([left_on, right_on])
        .withColumn(distance_col, F.col(distance_col).cast("int"))
    )
    # Re-attach the full right rows, then all matches to the full left
    # side; unmatched lefts (incl. NULL keys) survive with NULL rights.
    cand = pairs.join(right, on=right_on)
    return left.join(cand, on=left_on, how="left")


def strdist_neardup_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 1,
    distance_col: str = "string_distance",
    out_a: str = "text_a",
    out_b: str = "text_b",
) -> DataFrame:
    """Edit-distance near-duplicate PAIRS over one string pool — the
    fuzzy-join counterpart of ``minhash_dedup_pairs`` /
    ``embedding_neardup_pairs``: output ``(text_a, text_b,
    string_distance)`` with ``text_a < text_b`` and ``lv <= max_dist``,
    each unordered pair once.

    Same deletion-neighborhood candidate generation as the ``deletion``
    join strategy, but the symmetric self-join shape lets the ``a < b``
    ordering filter run BEFORE the bounded-Levenshtein verify — and no
    left-preservation re-attach joins are needed.

    Two scale refinements over the naive explode-join-dedup:

    - variants join as ``xxhash64`` longs, not strings — the candidate
      shuffle carries 8-byte keys (collisions are harmless: every
      candidate is lv-verified);
    - for ``max_dist=1`` candidate generation is POSITION-AWARE and
      therefore EXACT — zero false candidates, so the bounded-lv verify
      is only a hash-collision guard:

      * equal-length pairs join on ``(delete-i variant, i)``: if
        ``del_i(a) == del_i(b)`` at the SAME position, a and b agree
        everywhere except position i — exactly one substitution, lv=1
        guaranteed (joining on the variant alone also admits lv=2
        pairs like transpositions, which share a variant at DIFFERENT
        positions — on dense ID-like pools those false candidates
        outnumber true pairs ~3:1);
      * length±1 pairs join the shorter string itself against the
        longer side's DISTINCT deletion variants: ``del_j(b) == a``
        means b is a with one insertion, lv=1 guaranteed, and variant
        distinctness makes each pair appear exactly once.

      For ``max_dist=2`` a pair can share many variants, so each side
      carries its hashed-variant array and only the candidate whose
      join key equals ``array_min(array_intersect(va, vb))`` survives —
      still an exact, purely map-side dedup, no post-join shuffle.

    Memory contract of the pinned shuffled-hash joins: unlike
    sort-merge, a hash-relation BUILD cannot spill, so each reduce
    partition's variant slice must fit in a task's fair-share execution
    memory (``0.6*heap / (2*cores)`` worst case). Deployments must grow
    ``spark.sql.shuffle.partitions`` with the key pool AND cap
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` accordingly —
    AQE coalescing otherwise re-merges to 64MB-on-wire partitions whose
    in-memory hash relations are several times larger (measured: a 64x
    key pool needs ~16MB advisory under a 225MB/task fair share; see
    ``tools_scalebench.py --partitions``).
    """
    if not 1 <= max_dist <= 2:
        raise ValueError(
            "deletion blocking supports max_dist in {1, 2}; for larger "
            "distances use stringdist_left_join(strategy='blocked')"
        )
    va, vb = "__csdp_va", "__csdp_vb"
    base = (
        df.select(F.col(_q(text_col)).alias(out_a))
        .where(F.col(out_a).isNotNull())
        .distinct()
        # (r10 measured and rejected: caching this pool — it feeds four
        # consumers at max_dist=1 — made sf1 SLOWER (9.7 → 11.1 s):
        # the distinct's exchange is already shared via ReusedExchange
        # and the cache write + lost AQE coalescing cost more than the
        # narrow recompute it saved.)
    )
    if max_dist == 1:
        s, i = F.col(out_a), F.col("__csdp_i")
        del_i = F.concat(
            s.substr(F.lit(1), i - F.lit(1)),
            s.substr(i + F.lit(1), F.length(s)),
        )
        positions = F.when(
            F.length(s) > 0, F.sequence(F.lit(1), F.length(s))
        ).otherwise(F.array().cast("array<int>"))
        subst = base.select(
            out_a, F.explode(positions).alias("__csdp_i")
        ).select(out_a, F.xxhash64(del_i, i).alias(_VAR))
        # (r10 measured and rejected, twice: (a) caching the deduped
        # pool and (b) persisting this variant table hash-partitioned
        # on the variant key both made sf1 SLOWER (8.5 → 12.0 s for
        # (b)) — writing ~10M cached variant rows costs more than the
        # duplicate build + exchange it saves, and the cache's fixed
        # partitioning forfeits AQE coalescing. The duplicated-subtree
        # self-join below is the measured optimum on this engine.)
        #
        # the variant table is DATA-PROPORTIONAL (pool × key length), so
        # the optimizer's stats-blind default — broadcasting one side of
        # the self-join — is the fact-side-broadcast anti-pattern and a
        # driver OOM at scale; pin the shuffle hash join (no sort needed:
        # variant keys are near-unique 8-byte hashes). Locally this is
        # also ~2.5x faster than the broadcast plan at sf0.1.
        subst_pairs = (
            subst.join(
                subst.select(F.col(out_a).alias(out_b), _VAR).hint(
                    "shuffle_hash"
                ),
                _VAR,
            )
            .where(F.col(out_a) < F.col(out_b))
            .drop(_VAR)
        )
        ident = base.select(out_a, F.xxhash64(s).alias(_VAR))
        longer = base.select(
            F.col(out_a).alias(out_b),
            F.explode(F.array_distinct(_delete_one(F.col(out_a)))).alias(
                "__csdp_v"
            ),
        ).select(out_b, F.xxhash64(F.col("__csdp_v")).alias(_VAR))
        insdel_pairs = (
            ident.join(longer.hint("shuffle_hash"), _VAR)
            .drop(_VAR)
            .select(
                F.least(F.col(out_a), F.col(out_b)).alias(out_a),
                F.greatest(F.col(out_a), F.col(out_b)).alias(out_b),
            )
        )
        cand = subst_pairs.unionByName(insdel_pairs)
    else:
        texts = base.withColumn(
            va,
            F.array_distinct(
                F.transform(
                    _variants(F.col(out_a), max_dist), lambda v: F.xxhash64(v)
                )
            ),
        )
        a = texts.withColumn(_VAR, F.explode(F.col(va)))
        b = a.select(F.col(out_a).alias(out_b), F.col(va).alias(vb), _VAR)
        cand = (
            a.join(b.hint("shuffle_hash"), _VAR)
            .where(F.col(out_a) < F.col(out_b))
            .where(
                F.col(_VAR)
                == F.array_min(F.array_intersect(F.col(va), F.col(vb)))
            )
        )
    return (
        cand.drop(_VAR, va, vb)
        .withColumn(
            distance_col, _bounded_lv(F.col(out_a), F.col(out_b), max_dist)
        )
        .where(F.col(distance_col).isNotNull())
        .withColumn(distance_col, F.col(distance_col).cast("int"))
    )


def with_row_id(
    df: DataFrame,
    name: str = "row_id",
    order_by: Sequence[str | Column] | None = None,
) -> DataFrame:
    """1-based stable row index (R ``rowid_to_column`` parity, SURVEY.md
    §2.5 W1).

    With ``order_by``, ids follow that explicit order — the scalable,
    deterministic contract, computed by the distributed global ranking
    kernel (``operators/ranking.py``: range repartition + local ranks +
    cumulative offsets), never a partition-less Window. Without it, ids
    follow physical partition order (file order for a single-file CSV
    read), captured via ``monotonically_increasing_id`` and densified by
    a global window: correct for metadata-scale frames, but the
    single-partition window is a deliberate non-goal at 100 TB — large
    data must supply ``order_by``.
    """
    if order_by is None:
        df = df.withColumn("__csdp_mid", F.monotonically_increasing_id())
        w = Window.orderBy("__csdp_mid")
        return (
            df.withColumn(name, F.row_number().over(w).cast("long"))
            .drop("__csdp_mid")
        )
    from common_survey_data_pipeline_spark.operators.ranking import (
        global_row_number,
    )

    return global_row_number(df, list(order_by), name=name)


def keep_best_match(
    df: DataFrame,
    group_cols: Sequence[str],
    distance_col: str = "string_distance",
    tiebreakers: Sequence[Column] | None = None,
) -> DataFrame:
    """Top-1 per group by ascending distance, NULL distances last — the
    ``arrange(row_id, string_distance) |> distinct(row_id)`` reduction at
    varinfo-update.R:106-107 (SURVEY.md §2.3 J2).

    The reference's tiebreak among equal distances is join order
    (nondeterministic); this engine requires a deterministic tiebreak
    and defaults to none — pass ``tiebreakers`` (e.g. the matched
    variable name ascending) for reproducible plans.
    """
    order = [F.col(distance_col).asc_nulls_last()]
    if tiebreakers:
        order.extend(tiebreakers)
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__csdp_rn", F.row_number().over(w))
        .where(F.col("__csdp_rn") == 1)
        .drop("__csdp_rn")
    )


def _jw_jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jw(s1: str, s2: str) -> float:
    j = _jw_jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for x, y in zip(s1[:4], s2[:4]):
            if x != y:
                break
            prefix += 1
        j += prefix * 0.1 * (1.0 - j)
    return j


# DataType instance, not a DDL string: the string form is parsed via the
# active SparkSession, which would make this module unimportable before a
# session exists
@F.pandas_udf(DoubleType())
def _jw_kernel(sa: pd.Series, sb: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if x is None or y is None else _jw(x, y)
            for x, y in zip(sa, sb)
        ],
        dtype="float64",
    )


def jaro_winkler(a: Column, b: Column) -> Column:
    """Jaro-Winkler similarity as an Arrow-batched pandas UDF — the
    second string metric of the fuzzy-join family (Levenshtein covers
    edit typos; JW weighs common prefixes, the record-linkage default
    for person/entity names since Winkler 1990).

    Spark has no built-in JW, and the matching-window scan is not
    expressible in `pyspark.sql.functions` — this is the sanctioned
    slow path (vectorized Arrow transfer, per-batch Python kernel,
    defined ONCE at module scope so repeated calls reuse one UDF),
    NEVER a row-at-a-time Python UDF. Keep it on candidate pairs that
    survived a blocking equi-join, not on a raw fact table.

    Semantics pinned to DuckDB's ``jaro_winkler_similarity`` (standard
    parameters: scaling p=0.1, boost threshold 0.7, prefix cap 4;
    empty-vs-anything = 0.0, including empty-vs-empty) and parity-
    tested against it in ``tests/test_fuzzy_join.py``.
    """
    return _jw_kernel(a, b)


def qgram_edit_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int,
    q: int = 4,
    cache_grams: bool = True,
) -> DataFrame:
    """EXACT long-string edit-distance self-join via q-gram PREFIX
    filtering (Ed-Join, Xiao et al. VLDB'08 — the similarity-join
    literature's answer for paragraph-length near-verbatim matching,
    where ``strdist_neardup_pairs``' deletion neighborhoods explode:
    a deletion neighborhood is O(len^d) variants, fine for short keys,
    hopeless for 150-char paragraphs).

    Count argument: one edit alters at most ``q`` of a string's
    q-gram windows, so strings within edit distance ``max_dist`` have
    at most ``q·max_dist`` distinct grams of one side missing from the
    other (each lost distinct gram needs >= 1 destroyed occurrence and
    each destroyed occurrence belongs to one distinct gram). Under a
    GLOBAL gram order, each record's prefix = its first
    ``q·max_dist + 1`` grams; any pair within ``max_dist`` must then
    share a prefix gram — the candidate join is an equi-join on prefix
    grams (rare-first ordering bounds per-key fanout; grams join as
    xxhash64 longs, collisions only ADD candidates) with the classic
    length filter (||s|-|t|| <= d) applied in-join, and the bounded
    ``levenshtein(_, _, max_dist)`` verify (O(d·len) banded, -1 above
    threshold) restores exact precision. No quadratic stage.

    LONG-TEXT CONTRACT: records with fewer than ``q·max_dist + 1``
    grams (length < q·(max_dist+1)) are excluded — below that, two
    strings can be within ``max_dist`` while sharing zero grams, so no
    gram-based filter is complete; that regime belongs to
    ``strdist_neardup_pairs``. Callers join the two operators' outputs
    when a corpus mixes lengths.

    Output: ``(id_a, id_b, edit_dist INT)`` with ``id_a < id_b`` —
    identical to the all-pairs form (property-tested blocked ≡ naive).

    Caching contract: the gram table feeds the prefix side and both
    verify sides; ``cache_grams`` shares one materialization
    (LRU-evictable; long-lived sessions ``clearCache()`` after
    consuming, as bench.py does).
    """
    if max_dist < 0:
        raise ValueError(f"qgram_edit_pairs: max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"qgram_edit_pairs: q must be >= 1, got {q}")
    min_len = q * (max_dist + 1)
    s = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s")
    ).where(F.col("__s").isNotNull() & (F.length("__s") >= min_len))
    grams = s.select(
        "__id",
        F.length("__s").alias("__len"),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length("__s") - (q - 1)),
                lambda i: F.xxhash64(F.col("__s").substr(i, F.lit(q))),
            )
        ).alias("__g"),
    )
    # (r11 measured and REJECTED — VERDICT r10 item 5: computing the
    # rare-first gram order as a map-side-partial groupBy count over
    # the vocabulary-bounded distinct-gram table, BROADCAST back onto
    # the gram stream instead of this count Window. Plan did swap the
    # window sort for a broadcast join as predicted, but the query got
    # SLOWER, not faster: j14 sf0.1 3.49 → 5.22 s, sf1 2.84 → 4.39 s
    # (3-sample adjacent A/B; j15 followed, 1.99 → 2.20 / 2.62 → 3.28).
    # Root cause: the benched pools are BOUNDED by construction
    # (doc_id < 1000 caps the oracle's quadratic twin), so the ordering
    # stage is pure fixed cost — the blocking BroadcastExchange job
    # plus a second evaluation of the gram subtree cost more than the
    # ~157k-row window sort they replaced, at every tested SF. The
    # window stays; its skew exposure is bounded here because the
    # long-text contract (len >= q·(d+1)) keeps per-record gram sets
    # large and near-distinct, so no single gram dominates the way a
    # stop shingle does.)
    tok = grams.select(
        "__id", "__len", F.explode("__g").alias("__t")
    ).withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("__t"))
    )
    ordered = (
        tok.groupBy("__id", "__len")
        .agg(
            F.sort_array(F.collect_list(F.struct("__df", "__t"))).alias(
                "__ord"
            )
        )
        .select(
            "__id",
            "__len",
            F.transform("__ord", lambda x: x["__t"]).alias("__toks"),
        )
    )
    if cache_grams:
        ordered = ordered.cache()
    prefix_len = q * max_dist + 1
    prefixes = ordered.select(
        "__id",
        "__len",
        F.explode(F.slice("__toks", 1, prefix_len)).alias("__p"),
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    # (r10 measured and rejected: an Ed-Join POSITIONAL prefix filter
    # — the PPJoin ubound ≥ alpha prune, provably lossless under the
    # shared global gram order — cut candidate join rows only 8% on
    # this gram-dense corpus (299k → 276k pairs) while its posexplode
    # position bookkeeping cost +0.9 s at sf0.1 and nothing at sf1;
    # likewise a full-gram-set COUNT filter before the DP verify cut
    # 352k candidates to 712 DP calls but shipping the gram arrays
    # through the verify joins cost more than the banded levenshtein
    # it saved. Both reverted — at q·(d+1)-length strings the DP
    # verify is NOT the bottleneck; the rare-first ordering and the
    # candidate join are, and they are already one exchange each.)
    cand = (
        a.join(
            b,
            (F.col("a.__p") == F.col("b.__p"))
            & (F.col("a.__id") < F.col("b.__id"))
            # length filter: d inserts/deletes bound the length gap
            & (
                F.abs(F.col("a.__len") - F.col("b.__len"))
                <= F.lit(max_dist)
            ),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .distinct()
    )
    # (A full-gram-set COUNT filter before the DP verify was measured
    # here and REJECTED: it cut 352k candidates to 712 DP calls, but
    # shipping the ~|s|-long hashed-gram arrays through the two
    # verify joins cost more than the banded levenshtein it saved —
    # the DP verify is ~0.5 s of the sf0.1 query while the candidate
    # join and the rare-first ordering dominate. Guide §2.3: the
    # shuffle bytes ARE the cost.)
    texts = s
    verified = (
        cand.join(
            texts.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa")),
            "id_a",
        )
        .join(
            texts.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb")),
            "id_b",
        )
        .withColumn(
            "edit_dist", F.levenshtein("__sa", "__sb", max_dist)
        )
        .where(F.col("edit_dist") >= 0)  # -1 = beyond the threshold band
        .select("id_a", "id_b", F.col("edit_dist").cast("int").alias("edit_dist"))
    )
    return verified


def editdist_pairs_mixed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 4,
) -> DataFrame:
    """EXACT edit-distance self-join over a MIXED-LENGTH string pool —
    the composition :func:`qgram_edit_pairs`'s long-text contract
    tells callers to build, made first-class with the cutoff chosen
    internally (VERDICT r8 item 7).

    Regime split at ``L = q·(max_dist+1)`` (the shortest length where
    the q-gram prefix filter is complete):

    - strings with ``len >= L`` go through the Ed-Join q-gram prefix
      filter (:func:`qgram_edit_pairs`) — deletion neighborhoods are
      O(len^d) variants and hopeless for paragraph-length strings;
    - strings with ``len < L + max_dist`` go through the
      deletion-neighborhood path (:func:`strdist_neardup_pairs`) —
      below L the gram filter is incomplete (two strings can be within
      ``max_dist`` sharing zero grams), and at these bounded lengths
      the variant fanout is small by construction.

    The ``max_dist``-wide overlap band ``[L, L + max_dist)`` is the
    cross-regime glue: a (short, long) pair must satisfy the length
    filter ``|len_a − len_b| <= max_dist``, so its long member is
    shorter than ``L + max_dist`` and the pair is complete inside the
    deletion pool; pairs with both members in the band are found by
    BOTH paths with identical exact rows, so the closing
    ``drop_duplicates`` (keys only — distances are exact and equal on
    both paths) restores each-pair-once without an extra verify.

    :func:`strdist_neardup_pairs` works at TEXT level (distinct pool),
    so its pairs re-attach ids by joining the pool's (id, text) table
    on each side — duplicate texts fan out to every id combination —
    and identical-text id pairs (edit distance 0, invisible at text
    level) are recovered with a text-keyed self equi-join over the
    short pool (the long pool's exact duplicates already come out of
    the gram path). Inherits ``strdist_neardup_pairs``' ``max_dist in
    {1, 2}`` contract.

    Output: ``(id_a, id_b, edit_dist INT)``, ``id_a < id_b``, each
    unordered pair once — identical to the all-pairs
    ``levenshtein <= max_dist`` oracle (property-tested on corpora
    spanning 5–300 chars). No quadratic stage on any path: candidates
    come from hash-key equi-joins (deletion variants / prefix grams /
    exact text).
    """
    if not 1 <= max_dist <= 2:
        raise ValueError(
            "editdist_pairs_mixed inherits the deletion-neighborhood "
            f"contract: max_dist must be 1 or 2, got {max_dist}"
        )
    cutoff = q * (max_dist + 1)
    # Pin the pool and the short sub-pool ONCE: the three branches
    # consume them ~10× between them, and leaving the source expression
    # in lineage lets project-collapse substitute it into every
    # reference — including the `size(variants) > 0` filters Catalyst
    # infers below each explode, where the whole deletion-neighborhood
    # construction then re-evaluates against the raw source per branch
    # (measured 334s vs 5s at sf0.1 on an 800-string pool). Same
    # caching contract as qgram_edit_pairs' gram table: LRU-evictable,
    # long-lived sessions clearCache() after consuming.
    s = (
        df.select(
            F.col(_q(id_col)).alias("__id"), F.col(_q(text_col)).alias("__s")
        )
        .where(F.col("__s").isNotNull())
        .cache()
    )
    short = s.where(F.length("__s") < cutoff + max_dist).cache()
    long_pairs = qgram_edit_pairs(
        s.where(F.length("__s") >= cutoff), "__s", "__id", max_dist, q
    )
    tp = strdist_neardup_pairs(
        short, "__s", max_dist, distance_col="edit_dist"
    )
    ids_a = short.select(F.col("__id").alias("__ia"), F.col("__s").alias("text_a"))
    ids_b = short.select(F.col("__id").alias("__ib"), F.col("__s").alias("text_b"))
    short_pairs = (
        tp.join(ids_a, "text_a")
        .join(ids_b, "text_b")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            F.col("edit_dist").cast("int").alias("edit_dist"),
        )
    )
    dup_pairs = (
        short.join(
            short.select(
                F.col("__id").alias("__id2"), F.col("__s").alias("__s2")
            ),
            (F.col("__s") == F.col("__s2")) & (F.col("__id") < F.col("__id2")),
        )
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id2").alias("id_b"),
            F.lit(0).cast("int").alias("edit_dist"),
        )
    )
    return (
        long_pairs.unionByName(short_pairs)
        .unionByName(dup_pairs)
        .drop_duplicates(["id_a", "id_b"])
    )
