"""Unit tests for the PII scrubber (functions/text.py redact_pii /
pii_count): typed-tag replacement, span counting, and the email-before-IP
ordering contract."""

from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.functions import text as T


def _one(spark, s: str):
    df = spark.createDataFrame([(s,)], "raw string")
    return df.select(
        T.redact_pii(F.col("raw")).alias("red"),
        T.pii_count(F.col("raw")).alias("n"),
    ).first()


def test_redacts_each_kind(spark):
    row = _one(
        spark,
        "mail a.b+c@ex-amp.le.org ip 192.168.0.1 tel +1-555-123-4567 end",
    )
    assert row.red == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert row.n == 3


def test_clean_text_untouched(spark):
    s = "no personal data here, just words and 42 numbers."
    row = _one(spark, s)
    assert row.red == s
    assert row.n == 0


def test_email_domain_not_double_counted_as_ip(spark):
    # a dotted quad inside an email's host would match the IPv4 pattern
    # if emails were not scrubbed first — the ordering contract keeps the
    # whole address one <EMAIL> span instead of tearing it into an <IP>
    row = _one(spark, "x a@ex1.2.3.4.com y")
    assert row.red == "x <EMAIL> y"
    assert row.n == 1


def test_multiple_spans_counted(spark):
    row = _one(spark, "a@b.co c@d.io 10.0.0.1 +12345678901")
    assert row.n == 4
    assert row.red == "<EMAIL> <EMAIL> <IP> <PHONE>"


def test_null_text_stays_null(spark):
    df = spark.createDataFrame([(None,)], "raw string")
    row = df.select(
        T.redact_pii(F.col("raw")).alias("red"),
        T.pii_count(F.col("raw")).alias("n"),
    ).first()
    assert row.red is None and row.n is None
