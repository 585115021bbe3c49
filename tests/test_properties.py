"""Property-based tests (hypothesis) for the join-family invariants
promised in SURVEY.md §5.2: fuzzy-join left preservation, distance-0 ⟺
equality, blocked ≡ broadcast strategy equivalence, coalesce-join
precedence, and as-of ≡ naive per-row maximum.

Each property collects its random case into ONE Spark run (small data,
bounded examples) — Spark jobs per example are the cost driver.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.coalesce_join import coalesce_left_join
from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    keep_best_match,
    stringdist_left_join,
)
from common_survey_data_pipeline_spark.operators.decontam import (
    crossdoc_duplication,
)
from common_survey_data_pipeline_spark.operators.temporal_joins import asof_join
from common_survey_data_pipeline_spark.streaming.events import attribution_join

# short alphabet → plenty of near-matches within small distances
texts = st.text(alphabet="abcx ", min_size=0, max_size=8)
SETTINGS = dict(max_examples=12, deadline=None)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(lefts=st.lists(texts, min_size=1, max_size=6, unique=True),
       rights=st.lists(texts, min_size=0, max_size=6, unique=True),
       max_dist=st.integers(min_value=0, max_value=3))
@settings(**SETTINGS)
def test_fuzzy_join_matches_reference_model(spark, lefts, rights, max_dist):
    ldf = spark.createDataFrame([(t,) for t in lefts], "lt string")
    rdf = spark.createDataFrame([(t,) for t in rights], "rt string") \
        if rights else spark.createDataFrame([], "rt string")

    for strategy in ("broadcast", "blocked"):
        out = stringdist_left_join(
            ldf, rdf, "lt", "rt", max_dist=max_dist, strategy=strategy
        ).collect()
        got = {(r["lt"], r["rt"], r["string_distance"]) for r in out}
        want = set()
        for lt in lefts:
            matches = [
                (lt, rt, _levenshtein(lt, rt))
                for rt in rights
                if _levenshtein(lt, rt) <= max_dist
            ]
            want |= set(matches) if matches else {(lt, None, None)}
        assert got == want, strategy
        # left preservation: every left value appears
        assert {r["lt"] for r in out} == set(lefts), strategy
        # distance 0 ⟺ exact equality
        for r in out:
            if r["string_distance"] == 0:
                assert r["lt"] == r["rt"]


@given(lefts=st.lists(texts, min_size=1, max_size=5, unique=True),
       rights=st.lists(texts, min_size=1, max_size=5, unique=True))
@settings(**SETTINGS)
def test_best_match_keeps_exactly_one_row_per_left(spark, lefts, rights):
    ldf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lefts)], "row_id long, lt string"
    )
    rdf = spark.createDataFrame([(t,) for t in rights], "rt string")
    fuzzy = stringdist_left_join(ldf, rdf, "lt", "rt", max_dist=4)
    best = keep_best_match(fuzzy, ["row_id"], tiebreakers=[F.col("rt").asc_nulls_last()])
    rows = best.collect()
    assert len(rows) == len(lefts)
    by_id = {r["row_id"]: r for r in rows}
    for i, lt in enumerate(lefts):
        dists = [_levenshtein(lt, rt) for rt in rights]
        md = min(dists)
        if md <= 4:
            # min distance, tie broken by smallest right text
            want_rt = min(rt for rt in rights if _levenshtein(lt, rt) == md)
            assert by_id[i]["rt"] == want_rt
            assert by_id[i]["string_distance"] == md
        else:
            assert by_id[i]["rt"] is None


@given(data=st.lists(
    st.tuples(st.integers(0, 9),
              st.one_of(st.none(), st.integers(0, 99)),
              st.one_of(st.none(), st.integers(0, 99))),
    min_size=1, max_size=8, unique_by=lambda t: t[0]))
@settings(**SETTINGS)
def test_coalesce_join_x_wins_when_nonnull(spark, data):
    x = spark.createDataFrame([(k, v) for k, v, _ in data], "k long, v long")
    y = spark.createDataFrame(
        [(k, w) for k, _, w in data if w is not None], "k long, v long"
    )
    out = {r["k"]: r["v"] for r in coalesce_left_join(x, y, "k").collect()}
    for k, v, w in data:
        assert out[k] == (v if v is not None else w)


@given(
    levents=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    revents=st.lists(st.tuples(st.integers(0, 50), st.integers(0, 9)),
                     min_size=0, max_size=8, unique_by=lambda t: t[0]),
)
@settings(**SETTINGS)
def test_asof_equals_naive_model(spark, levents, revents):
    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=h), i) for i, h in enumerate(levents)],
        "k long, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=h), v) for h, v in revents],
        "k long, ts timestamp, v long",
    ) if revents else spark.createDataFrame([], "k long, ts timestamp, v long")
    got = {r["lid"]: r["v"] for r in asof_join(ldf, rdf, on="k").collect()}
    for i, h in enumerate(levents):
        eligible = [(rh, v) for rh, v in revents if rh <= h]
        want = max(eligible)[1] if eligible else None
        assert got[i] == want


@given(data=st.lists(
    st.tuples(st.integers(0, 2),                       # series key
              st.one_of(st.none(), st.integers(0, 99))),  # reading (None = gap)
    min_size=1, max_size=10))
@settings(**SETTINGS)
def test_locf_fill_matches_sequential_model(spark, data):
    from common_survey_data_pipeline_spark.operators.timeseries import locf_fill

    rows = [(i, k, v) for i, (k, v) in enumerate(data)]
    df = spark.createDataFrame(rows, "i long, k long, v long")
    out = {
        r["i"]: r["value_filled"]
        for r in locf_fill(
            df, "v", partition_cols=["k"], order_cols=["i"]
        ).collect()
    }
    last_seen: dict[int, int | None] = {}
    for i, (k, v) in enumerate(data):
        if v is not None:
            last_seen[k] = v
        assert out[i] == last_seen.get(k)


@given(docs=st.lists(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=6).map("".join),
    min_size=1, max_size=6))
@settings(**SETTINGS)
def test_crossdoc_duplication_matches_set_model(spark, docs):
    # model: per-doc distinct char-bigrams as word 2-grams over a
    # letter-per-word encoding of the same string
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared"])
        for r in crossdoc_duplication(df, n=2).collect()
    }
    grams = [
        {t[i : i + 2] for i in range(len(t) - 1)} for t in docs
    ]
    for i, g in enumerate(grams):
        if not g:
            assert i not in got  # no n-grams -> no row
            continue
        shared = {
            x for x in g if any(x in h for j, h in enumerate(grams) if j != i)
        }
        assert got[i] == (len(g), len(shared))


@given(events=st.lists(
    st.tuples(st.integers(0, 2),        # user
              st.integers(0, 50),       # minutes offset
              st.booleans()),           # True = purchase, False = click
    min_size=1, max_size=12))
@settings(**SETTINGS)
def test_attribution_join_matches_window_model(spark, events):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), "purchase" if p else "click")
        for i, (u, m, p) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    pairs = attribution_join(
        df.where(F.col("event_type") == "purchase"),
        df.where(F.col("event_type") == "click"),
        window="10 minutes",
    )
    got = {(r["purchase_id"], r["click_id"]) for r in pairs.collect()}
    want = {
        (pi, ci)
        for pi, (pu, pm, pp) in enumerate(events) if pp
        for ci, (cu, cm, cp) in enumerate(events)
        if not cp and pu == cu and pm - 10 <= cm < pm
    }
    assert got == want


# ---------------------------------------------------------------------------
# Bounded-frame statistics (ewma_user_value / rolling_median_user_value)
# and multi-touch attribution vs sequential Python models
# ---------------------------------------------------------------------------

purchase_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user_id
        st.integers(min_value=0, max_value=50),     # ts offset (seconds)
        st.floats(min_value=0.0, max_value=100.0,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=25,
)


def _write_events(spark, tmpdir, rows, event_type="purchase"):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(seconds=off), int(u), event_type, float(v), "{}")
        for i, (u, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    return data


@given(rows=purchase_rows)
@settings(max_examples=6, deadline=None)
def test_bounded_frame_stats_match_sequential_model(spark, tmp_path_factory, rows):
    from common_survey_data_pipeline_spark.workload import REGISTRY

    tmpdir = str(tmp_path_factory.mktemp("ev_prop"))
    data = _write_events(spark, tmpdir, rows)

    # sequential per-user models over (ts, event_id) order
    want_ewma, want_med = {}, {}
    by_user = {}
    for eid, ts, u, _t, v, _p in sorted(data, key=lambda r: (r[2], r[1], r[0])):
        hist = by_user.setdefault(u, [])
        arr = hist[-19:] + [v]
        n = len(arr)
        num = sum(x * 0.9 ** (n - 1 - i) for i, x in enumerate(arr))
        den = sum(0.9 ** (n - 1 - i) for i in range(n))
        want_ewma[eid] = num / den
        s = sorted(arr)
        want_med[eid] = (s[(n + 1) // 2 - 1] + s[n // 2]) / 2.0
        by_user[u] = arr

    got_e = {
        r["event_id"]: r["ewma"]
        for r in REGISTRY["ewma_user_value"].fn(spark, tmpdir).collect()
    }
    got_m = {
        r["event_id"]: r["rolling_median"]
        for r in REGISTRY["rolling_median_user_value"].fn(spark, tmpdir).collect()
    }
    assert set(got_e) == set(want_ewma)
    for k in want_ewma:
        assert abs(got_e[k] - want_ewma[k]) < 1e-5
        assert abs(got_m[k] - want_med[k]) < 1e-5


mixed_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user_id
        st.integers(min_value=0, max_value=7200),   # ts offset (seconds)
        st.sampled_from(["view", "purchase"]),
        st.floats(min_value=1.0, max_value=50.0,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=mixed_rows)
@settings(max_examples=6, deadline=None)
def test_multitouch_credit_matches_brute_force(spark, tmp_path_factory, rows):
    from common_survey_data_pipeline_spark.workload import REGISTRY

    tmpdir = str(tmp_path_factory.mktemp("ev_mt"))
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(seconds=off), int(u), t, float(v), "{}")
        for i, (u, off, t, v) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")

    # brute force: per purchase, views of the same user in [ts-1h, ts)
    views = [(u, ts) for _e, ts, u, t, _v, _p in data if t == "view"]
    credit, n_touch = {}, {}
    for _e, pts, pu, t, pv, _p in data:
        if t != "purchase":
            continue
        touches = [
            vts for vu, vts in views
            if vu == pu and pts - dt.timedelta(hours=1) <= vts < pts
        ]
        for vts in touches:
            h = vts.hour
            credit[h] = credit.get(h, 0.0) + pv / len(touches)
            n_touch[h] = n_touch.get(h, 0) + 1

    got = {
        r["view_hour"]: (r["n_touches"], r["credited_value"])
        for r in REGISTRY["multitouch_attribution"].fn(spark, tmpdir).collect()
    }
    assert set(got) == set(credit)
    for h in credit:
        assert got[h][0] == n_touch[h]
        assert abs(got[h][1] - credit[h]) < 1e-3  # query rounds to 4dp


# ---------------------------------------------------------------------------
# SCD2 compression ≡ naive per-key model (null-safe change detection)
# ---------------------------------------------------------------------------


def _scd2_model(rows):
    """Brute-force SCD2: rows = [(key, ts, tiebreak, attr)] → set of
    (key, attr, valid_from, valid_to, version)."""
    out = []
    bykey: dict = {}
    for k, ts, tb, a in rows:
        bykey.setdefault(k, []).append((ts, tb, a))
    for k, seq in bykey.items():
        seq.sort(key=lambda r: (r[0], r[1]))
        versions = []
        prev = object()  # sentinel != anything, None included
        for ts, tb, a in seq:
            if a != prev or not versions:
                versions.append([a, ts, None])
            prev = a
        for i in range(len(versions) - 1):
            versions[i][2] = versions[i + 1][1]
        out.extend(
            (k, a, vf, vt, i + 1) for i, (a, vf, vt) in enumerate(versions)
        )
    return set(out)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),          # key
            st.integers(min_value=0, max_value=5),          # ts
            st.integers(min_value=0, max_value=99),         # tiebreak
            st.one_of(st.none(), st.sampled_from(["A", "B"])),  # attr
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda r: (r[0], r[1], r[2]),
    )
)
@settings(**SETTINGS)
def test_scd2_equals_model_with_nulls(spark, rows):
    from common_survey_data_pipeline_spark.operators.timeseries import (
        scd2_compress,
    )

    df = spark.createDataFrame(
        rows, "k long, ts long, tb long, attr string"
    )
    got = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["version"])
        for r in scd2_compress(df, "k", "attr", "ts", "tb").collect()
    }
    assert got == _scd2_model(rows)


# ---------------------------------------------------------------------------
# Batch threshold alerts ≡ streaming while-loop model (monotone counter)
# ---------------------------------------------------------------------------


def _alerts_model(rows, threshold=100.0):
    """The streaming operator's exact fold: per-user (ts, event_id)
    order, monotone emitted counter."""
    out = []
    bykey: dict = {}
    for ev, k, ts, v in rows:
        bykey.setdefault(k, []).append((ts, ev, v))
    for k, seq in bykey.items():
        seq.sort()
        total, emitted = 0.0, 0
        for ts, ev, v in seq:
            total += v
            while total >= (emitted + 1) * threshold:
                emitted += 1
                out.append((k, emitted, round(total, 6)))
    return sorted(out)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),  # event_id
            st.integers(min_value=0, max_value=2),    # user
            st.integers(min_value=0, max_value=9),    # ts (minute)
            st.sampled_from([-250.0, -60.0, 30.0, 90.0, 150.0, 340.0]),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    )
)
@settings(**SETTINGS)
def test_threshold_alerts_batch_equals_streaming_model(spark, rows):
    import datetime

    from common_survey_data_pipeline_spark.streaming.stateful import (
        threshold_alerts,
    )

    data = [
        (ev, k, datetime.datetime(2024, 1, 1, 0, ts, 0), v)
        for ev, k, ts, v in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )
    got = sorted(
        (r["user_id"], r["alert_no"], round(r["total_at_alert"], 6))
        for r in threshold_alerts(df, threshold=100.0).collect()
    )
    assert got == _alerts_model(rows)


# ---------------------------------------------------------------------------
# Round 6: substring-dup spans ≡ brute-force model; URL canon idempotence
# ---------------------------------------------------------------------------

def _brute_dup_spans(docs: list[str], k: int) -> set[tuple[int, int, int]]:
    """Reference model: (doc_idx, span_start, span_end) of maximal runs
    of positions whose k-gram recurs in at least one OTHER document."""
    grams = []
    for text in docs:
        toks = text.split()
        grams.append([tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)])
    out = set()
    for d, gs in enumerate(grams):
        hits = [
            p + 1  # 1-based, like the operator
            for p, g in enumerate(gs)
            if any(o != d and g in og for o, og in enumerate(grams))
        ]
        run: list[int] = []
        for p in hits + [None]:
            if run and (p is None or p != run[-1] + 1):
                out.add((d, run[0], run[-1] + k - 1))
                run = []
            if p is not None:
                run.append(p)
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=8).map(" ".join),
        min_size=2,
        max_size=5,
    ),
    k=st.integers(min_value=2, max_value=3),
)
@settings(**SETTINGS)
def test_substring_dup_spans_matches_reference_model(spark, docs, k):
    from common_survey_data_pipeline_spark.operators.dedup import (
        substring_dup_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_dup_spans(df, "text", "doc_id", k=k).collect()
    }
    assert got == _brute_dup_spans(docs, k)


_url_hosts = st.sampled_from(
    ["Example.COM", "www.Example.com", "a.b.ORG", "WWW.X.io"]
)
_url_schemes = st.sampled_from(["http", "HTTPS", "https", "HTTP"])
_url_ports = st.sampled_from(["", ":80", ":443", ":8080"])
_url_params = st.lists(
    st.sampled_from(["a=1", "utm_source=x", "b=2", "gclid=z", "fbclid=q"]),
    max_size=4,
)
_url_frags = st.sampled_from(["", "#top", "#sec2"])


@given(
    scheme=_url_schemes,
    host=_url_hosts,
    port=_url_ports,
    params=_url_params,
    frag=_url_frags,
)
@settings(**SETTINGS)
def test_url_canonicalization_idempotent_and_clean(
    spark, scheme, host, port, params, frag
):
    """canon(canon(u)) == canon(u), and every canonical URL is already
    clean: lowercase scheme/host, no www., no default port, no
    fragment, no tracking params."""
    from common_survey_data_pipeline_spark.functions.url import (
        canonicalize_url,
    )

    url = f"{scheme}://{host}{port}/P/q"
    if params:
        url += "?" + "&".join(params)
    url += frag
    df = spark.createDataFrame([(url,)], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    c1 = once.first()["c"]
    c2 = once.select(canonicalize_url(F.col("c")).alias("c2")).first()["c2"]
    assert c1 == c2
    assert c1.split("://")[0] in ("http", "https")
    rest = c1.split("://", 1)[1]
    hostpart = rest.split("/", 1)[0]
    assert hostpart == hostpart.lower()
    assert not hostpart.startswith("www.")
    assert not hostpart.endswith(":80") or c1.startswith("https")
    assert not hostpart.endswith(":443") or c1.startswith("http://")
    assert "#" not in c1
    assert "utm_" not in c1 and "gclid" not in c1 and "fbclid" not in c1
