"""Fuzzy (Levenshtein) join invariants — SURVEY.md §5.2 item 3.

* broadcast NLJ and length-band blocked strategies are equivalent,
* left-row preservation after best-match reduction,
* string_distance == 0 ⟺ exact equality,
* max_dist boundary inclusion/exclusion.
"""

import random

import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    keep_best_match,
    strdist_neardup_pairs,
    stringdist_left_join,
    with_row_id,
)

ALPHABET = "abcd"


def _random_pool(rng, n, max_len=12):
    return [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, max_len)))
        for _ in range(n)
    ]


def _result_set(df, left_on, right_on):
    return {
        (r[left_on], r[right_on], r["string_distance"])
        for r in df.select(left_on, right_on, "string_distance").collect()
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("max_dist", [0, 2, 5])
def test_blocked_equals_broadcast(spark, seed, max_dist):
    rng = random.Random(seed)
    left = spark.createDataFrame(
        [(s,) for s in _random_pool(rng, 60)] + [(None,)], ["ltext"]
    )
    right = spark.createDataFrame([(s,) for s in _random_pool(rng, 40)], ["rtext"])
    a = stringdist_left_join(left, right, "ltext", "rtext", max_dist, strategy="broadcast")
    b = stringdist_left_join(left, right, "ltext", "rtext", max_dist, strategy="blocked")
    assert _result_set(a, "ltext", "rtext") == _result_set(b, "ltext", "rtext")
    assert a.count() == b.count()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("max_dist", [1, 2])
def test_deletion_equals_broadcast(spark, seed, max_dist):
    # incl. NULL left keys, empty strings, duplicated left rows — the
    # deletion strategy must reproduce the NLJ's result exactly
    rng = random.Random(100 + seed)
    pool = _random_pool(rng, 60) + ["", ""]
    left = spark.createDataFrame(
        [(s,) for s in pool] + [(None,), (pool[0],)], ["ltext"]
    )
    right = spark.createDataFrame(
        [(s,) for s in _random_pool(rng, 40) + [""]], ["rtext"]
    )
    a = stringdist_left_join(left, right, "ltext", "rtext", max_dist, strategy="broadcast")
    d = stringdist_left_join(left, right, "ltext", "rtext", max_dist, strategy="deletion")
    assert _result_set(a, "ltext", "rtext") == _result_set(d, "ltext", "rtext")
    assert a.count() == d.count()


def test_deletion_rejects_large_max_dist(spark):
    left = spark.createDataFrame([("abc",)], ["l"])
    right = spark.createDataFrame([("abd",)], ["r"])
    with pytest.raises(ValueError, match="max_dist"):
        stringdist_left_join(left, right, "l", "r", 3, strategy="deletion")


def test_deletion_constant_length_keys(spark):
    # the length-banding worst case: every key the same length —
    # deletion blocking must still find exactly the true d<=1 pairs
    keys = [f"{i:05d}" for i in range(0, 3000, 7)]
    left = spark.createDataFrame([(k,) for k in keys], ["ka"])
    right = spark.createDataFrame([(k,) for k in keys], ["kb"])
    got = stringdist_left_join(left, right, "ka", "kb", 1, strategy="deletion")
    want = stringdist_left_join(left, right, "ka", "kb", 1, strategy="broadcast")
    assert _result_set(got, "ka", "kb") == _result_set(want, "ka", "kb")


@pytest.mark.parametrize("max_dist", [1, 2])
def test_neardup_pairs_equal_bruteforce(spark, max_dist):
    import itertools

    def lv(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    rng = random.Random(42)
    pool = list(set(_random_pool(rng, 80) + [""]))
    want = {
        (min(a, b), max(a, b), lv(min(a, b), max(a, b)))
        for a, b in itertools.combinations(pool, 2)
        if lv(a, b) <= max_dist
    }
    df = spark.createDataFrame([(s,) for s in pool + pool[:5]], ["t"])  # dups too
    got = {
        (r["text_a"], r["text_b"], r["string_distance"])
        for r in strdist_neardup_pairs(df, "t", max_dist=max_dist).collect()
    }
    assert got == want


def test_distance_zero_iff_equal(spark):
    left = spark.createDataFrame([("abc",), ("abd",), ("zzz",)], ["l"])
    right = spark.createDataFrame([("abc",), ("abe",)], ["r"])
    out = stringdist_left_join(left, right, "l", "r", max_dist=1).collect()
    for row in out:
        if row["string_distance"] == 0:
            assert row["l"] == row["r"]
        elif row["l"] == row["r"]:
            assert row["string_distance"] == 0


def test_max_dist_boundary(spark):
    left = spark.createDataFrame([("aaaa",)], ["l"])
    # distance 2 ("aabb") included at max_dist=2, distance 3 ("abbb") excluded
    right = spark.createDataFrame([("aabb",), ("abbb",)], ["r"])
    for strategy in ("broadcast", "blocked", "deletion"):
        got = {
            r["r"]
            for r in stringdist_left_join(
                left, right, "l", "r", max_dist=2, strategy=strategy
            ).collect()
        }
        assert got == {"aabb"}, strategy


def test_left_preservation_after_best_match(spark):
    rng = random.Random(7)
    left = spark.createDataFrame([(s,) for s in _random_pool(rng, 50)], ["ltext"])
    left = with_row_id(left, "row_id")
    right = spark.createDataFrame([(s,) for s in _random_pool(rng, 30)], ["rtext"])
    for strategy in ("broadcast", "blocked"):
        joined = stringdist_left_join(left, right, "ltext", "rtext", 3, strategy=strategy)
        best = keep_best_match(joined, ["row_id"], tiebreakers=[F.col("rtext").asc_nulls_last()])
        assert best.count() == 50
        # one row per original left row, and the kept match is minimal
        mins = (
            joined.groupBy("row_id")
            .agg(F.min("string_distance").alias("mind"))
            .collect()
        )
        mind = {r["row_id"]: r["mind"] for r in mins}
        for r in best.collect():
            assert r["string_distance"] == mind[r["row_id"]]


def test_unmatched_left_rows_survive_with_nulls(spark):
    left = spark.createDataFrame([("aaaaaaaaaa",), ("bbbb",)], ["l"])
    right = spark.createDataFrame([("bbbc",)], ["r"])
    for strategy in ("broadcast", "blocked", "deletion"):
        out = stringdist_left_join(left, right, "l", "r", 1, strategy=strategy)
        rows = {r["l"]: (r["r"], r["string_distance"]) for r in out.collect()}
        assert rows["aaaaaaaaaa"] == (None, None), strategy
        assert rows["bbbb"] == ("bbbc", 1), strategy


def test_with_row_id_is_one_based_dense(spark):
    df = spark.createDataFrame([(c,) for c in "edcba"], ["v"])
    ids = sorted(r["row_id"] for r in with_row_id(df).collect())
    assert ids == [1, 2, 3, 4, 5]
    # explicit order contract
    by_v = {r["v"]: r["row_id"] for r in with_row_id(df, order_by=["v"]).collect()}
    assert by_v == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}


def test_jaro_winkler_matches_duckdb(spark):
    """The pandas-UDF JW kernel is parity-locked to DuckDB's
    jaro_winkler_similarity on random pools (incl. empty strings,
    which DuckDB scores 0.0 even against themselves)."""
    import duckdb

    from common_survey_data_pipeline_spark.operators.fuzzy_join import (
        jaro_winkler,
    )

    rng = random.Random(7)
    pool = _random_pool(rng, 60, max_len=10) + ["", "martha", "marhta"]
    pairs = [(rng.choice(pool), rng.choice(pool)) for _ in range(300)]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        (r["a"], r["b"], round(r["jw"], 10))
        for r in df.select(
            "a", "b", jaro_winkler(F.col("a"), F.col("b")).alias("jw")
        ).collect()
    }
    con = duckdb.connect()
    want = {
        (a, b, round(con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0], 10))
        for a, b in set(pairs)
    }
    assert {(a, b, j) for a, b, j in got} == want


class TestQgramEditJoin:
    """qgram_edit_pairs (Ed-Join prefix filter): blocked ≡ naive on
    generated long strings, contract edges, and exactness of the
    banded verify."""

    @staticmethod
    def _naive(spark, df, max_dist, q):
        from pyspark.sql import functions as F

        min_len = q * (max_dist + 1)
        s = df.select(
            F.col("id").alias("__id"), F.col("s").alias("__s")
        ).where(F.length("__s") >= min_len)
        a = s.select(F.col("__id").alias("id_a"), F.col("__s").alias("sa"))
        b = s.select(F.col("__id").alias("id_b"), F.col("__s").alias("sb"))
        return {
            (r["id_a"], r["id_b"], r["ed"])
            for r in a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("ed", F.levenshtein("sa", "sb"))
            .where(F.col("ed") <= max_dist)
            .select("id_a", "id_b", F.col("ed").cast("int").alias("ed"))
            .collect()
        }

    @staticmethod
    def _corpus(n_base=25, n_variants=3):
        import random

        rng = random.Random(99)
        rows = []
        i = 0
        for _ in range(n_base):
            base = "".join(
                rng.choice("abcdef ") for _ in range(rng.randint(140, 200))
            )
            rows.append((i, base))
            i += 1
            for _ in range(n_variants):
                sl = list(base)
                for _ in range(rng.randint(1, 15)):
                    op = rng.choice("sid")
                    p = rng.randrange(len(sl))
                    if op == "s":
                        sl[p] = rng.choice("abcdef")
                    elif op == "i":
                        sl.insert(p, rng.choice("abcdef"))
                    elif len(sl) > 100:
                        del sl[p]
                rows.append((i, "".join(sl)))
                i += 1
        return rows

    def test_blocked_equals_naive_on_long_strings(self, spark):
        from common_survey_data_pipeline_spark.operators.fuzzy_join import (
            qgram_edit_pairs,
        )

        df = spark.createDataFrame(self._corpus(), "id long, s string")
        got = {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in qgram_edit_pairs(df, "s", "id", max_dist=12).collect()
        }
        want = self._naive(spark, df, 12, 4)
        assert got == want
        assert len(want) >= 40  # the variants really produce pairs
        spark.catalog.clearCache()

    def test_short_strings_excluded_by_contract(self, spark):
        from common_survey_data_pipeline_spark.operators.fuzzy_join import (
            qgram_edit_pairs,
        )

        # identical 10-char strings are within any distance, but below
        # q*(d+1) the gram filter is incomplete — the contract excludes
        # them rather than silently missing a SUBSET of short pairs
        df = spark.createDataFrame(
            [(1, "abcabcabca"), (2, "abcabcabca")], "id long, s string"
        )
        assert qgram_edit_pairs(df, "s", "id", max_dist=12).count() == 0

    def test_zero_distance_finds_exact_duplicates(self, spark):
        from common_survey_data_pipeline_spark.operators.fuzzy_join import (
            qgram_edit_pairs,
        )

        long = "x y z " * 30
        df = spark.createDataFrame(
            [(1, long), (2, long), (3, long + "tail")], "id long, s string"
        )
        rows = {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in qgram_edit_pairs(df, "s", "id", max_dist=0).collect()
        }
        assert rows == {(1, 2, 0)}
        spark.catalog.clearCache()

    def test_rejects_bad_params(self, spark):
        import pytest

        from common_survey_data_pipeline_spark.operators.fuzzy_join import (
            qgram_edit_pairs,
        )

        df = spark.createDataFrame([(1, "abc")], "id long, s string")
        with pytest.raises(ValueError, match="max_dist"):
            qgram_edit_pairs(df, "s", "id", max_dist=-1)
        with pytest.raises(ValueError, match="q must be"):
            qgram_edit_pairs(df, "s", "id", max_dist=1, q=0)


class TestEditdistMixed:
    """editdist_pairs_mixed (VERDICT r8 item 7): the q-gram/deletion
    composition must equal the all-pairs levenshtein on corpora
    spanning short AND long strings, with the regime boundary stitched
    by the overlap band."""

    @staticmethod
    def _naive(spark, df, max_dist):
        from pyspark.sql import functions as F

        s = df.select(
            F.col("id").alias("__id"), F.col("s").alias("__s")
        ).where(F.col("__s").isNotNull())
        a = s.select(F.col("__id").alias("id_a"), F.col("__s").alias("sa"))
        b = s.select(F.col("__id").alias("id_b"), F.col("__s").alias("sb"))
        return {
            (r["id_a"], r["id_b"], r["ed"])
            for r in a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("ed", F.levenshtein("sa", "sb"))
            .where(F.col("ed") <= max_dist)
            .select("id_a", "id_b", F.col("ed").cast("int").alias("ed"))
            .collect()
        }

    @staticmethod
    def _mixed_corpus(seed=7, n=120):
        """Strings of 5-300 chars dense around the q=4/d=2 boundary
        (10-16), with planted 1- and 2-edit variants and exact dups."""
        import random

        rng = random.Random(seed)
        rows, i = [], 0
        lengths = [5, 8, 10, 11, 12, 13, 14, 16, 25, 60, 150, 300]
        for _ in range(n):
            ln = rng.choice(lengths)
            base = "".join(rng.choice("abcde") for _ in range(ln))
            rows.append((i, base)); i += 1
            r = rng.random()
            if r < 0.3:  # 1-edit variant (may cross the boundary)
                sl = list(base)
                op = rng.choice("sid")
                p = rng.randrange(len(sl))
                if op == "s":
                    sl[p] = rng.choice("abcde")
                elif op == "i":
                    sl.insert(p, rng.choice("abcde"))
                else:
                    del sl[p]
                rows.append((i, "".join(sl))); i += 1
            elif r < 0.45:  # exact duplicate
                rows.append((i, base)); i += 1
            elif r < 0.6:  # 2-edit, length +/- 2 (max boundary reach)
                if rng.random() < 0.5:
                    rows.append((i, base + "xy")); i += 1
                elif len(base) > 6:
                    rows.append((i, base[:-2])); i += 1
        return rows

    @pytest.mark.parametrize("max_dist", [1, 2])
    def test_mixed_equals_naive(self, spark, max_dist):
        from common_survey_data_pipeline_spark.operators.fuzzy_join import (
            editdist_pairs_mixed,
        )

        df = spark.createDataFrame(
            self._mixed_corpus(), "id long, s string"
        )
        got = {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in editdist_pairs_mixed(
                df, "s", "id", max_dist=max_dist
            ).collect()
        }
        want = self._naive(spark, df, max_dist)
        assert got == want
        assert len(want) >= 25  # the corpus really spans both regimes
        spark.catalog.clearCache()

    def test_cross_boundary_pair_found(self, spark):
        from common_survey_data_pipeline_spark.operators.fuzzy_join import (
            editdist_pairs_mixed,
        )

        # q=4, d=2 -> cutoff 12: one string below it (len 11), one at it
        # (len 13) within distance 2 — only the overlap band finds this
        df = spark.createDataFrame(
            [(1, "abcdeabcdea"), (2, "abcdeabcdeaxy"),
             (3, "zzzzz"), (4, "zzzzz")],
            "id long, s string",
        )
        rows = {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in editdist_pairs_mixed(df, "s", "id", max_dist=2).collect()
        }
        assert rows == {(1, 2, 2), (3, 4, 0)}
        spark.catalog.clearCache()

    def test_rejects_unsupported_max_dist(self, spark):
        from common_survey_data_pipeline_spark.operators.fuzzy_join import (
            editdist_pairs_mixed,
        )

        df = spark.createDataFrame([(1, "abc")], "id long, s string")
        with pytest.raises(ValueError, match="max_dist"):
            editdist_pairs_mixed(df, "s", "id", max_dist=3)
