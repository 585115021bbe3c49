"""functions/url.py canonicalization rules on handcrafted URLs —
cases the synthetic-corpus oracle sweep doesn't reach (no query at
all, unparseable input, every-param-tracking, non-default ports on
both schemes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions.url import (
    canonicalize_url,
    url_host,
)


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]


def test_lowercases_and_strips_www_and_default_port(spark):
    assert (
        _canon(spark, "HTTPS://WWW.Example.COM:443/A/b?x=1#frag")
        == "https://example.com/A/b?x=1"
    )
    assert (
        _canon(spark, "http://www.example.com:80/")
        == "http://example.com/"
    )


def test_keeps_non_default_port_and_path_case(spark):
    assert (
        _canon(spark, "http://Example.com:8080/CaseSensitive")
        == "http://example.com:8080/CaseSensitive"
    )
    # https on http's default port is NOT default — kept
    assert (
        _canon(spark, "https://example.com:80/x")
        == "https://example.com:80/x"
    )


def test_strips_tracking_params_keeps_rest_in_order(spark):
    assert (
        _canon(
            spark,
            "https://e.com/p?utm_source=a&b=2&gclid=xx&a=1&fbclid=y&utm_campaign=z",
        )
        == "https://e.com/p?b=2&a=1"
    )
    # all params tracking -> '?' dropped entirely
    assert (
        _canon(spark, "https://e.com/p?utm_source=a&utm_medium=b")
        == "https://e.com/p"
    )


def test_no_query_no_fragment_roundtrip(spark):
    assert _canon(spark, "https://e.com/p") == "https://e.com/p"
    assert _canon(spark, "https://e.com/p#sec") == "https://e.com/p"


def test_unparseable_input_yields_null(spark):
    df = spark.createDataFrame(
        [("not a url at all",), (None,)], "url string"
    )
    out = df.select(
        canonicalize_url(F.col("url")).alias("c"),
        url_host(F.col("url")).alias("h"),
    ).collect()
    assert all(r["c"] is None and r["h"] is None for r in out)
