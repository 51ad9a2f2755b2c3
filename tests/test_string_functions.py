"""Unit coverage for the §2.8 string-function library (F9-F18)."""

from pyspark.sql import functions as F

from annual_report_pdf_parsers_spark.functions import strings as S


def run1(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(col_expr.alias("v")).collect()[0].v


def test_f9_isin_strip(spark):
    assert (
        run1(spark, S.collapse_ws(S.strip_isin(F.col("s"))),
             "ACME CORP LU0123456789 BONDS")
        == "ACME CORP BONDS"
    )


def test_f10_charset_purge(spark):
    assert run1(spark, S.purge_charset(F.col("s")), "AB-ç12 (x)%/é") == "AB12 (x)%/"


def test_f11_multi_percent(spark):
    got = run1(
        spark, S.truncate_multi_percent(F.col("s")),
        "BOND 3.5% 2031 extra 4% tail"
    )
    assert got == "BOND 3.5% 2031"
    # single % untouched
    assert (
        run1(spark, S.truncate_multi_percent(F.col("s")), "BOND 3.5% 2031")
        == "BOND 3.5% 2031"
    )


def test_f12_currency_token(spark):
    cur = ["EUR", "USD"]
    assert run1(spark, S.extract_currency_token(F.col("s"), cur),
                "ACME EUR CORP") == "EUR"
    assert run1(spark, S.collapse_ws(
        S.remove_currency_token(F.col("s"), cur)), "ACME EUR CORP") == "ACME CORP"


def test_f13_leading_token(spark):
    assert run1(spark, S.drop_leading_token(F.col("s")),
                "1,250  ACME CORP") == "ACME CORP"


def test_f14_f15_digit_strips(spark):
    assert run1(spark, S.strip_trailing_digits(F.col("s")), "ACME 123") == "ACME "
    assert run1(spark, S.strip_digits(F.col("s")), "EUR123") == "EUR"


def test_f16_fund_rewrite(spark):
    assert (
        run1(spark, S.rewrite_fund_name(F.col("s"), r"^EdR Fund "),
             "EdR Fund GLOBAL BONDS")
        == "GLOBAL BONDS"
    )


def test_f17_extract_by_regex(spark):
    assert (
        run1(spark, S.extract_by_regex(F.col("s"), r"Annual report (.*) \d"),
             "Annual report ALPHA FUND 2025")
        == "ALPHA FUND"
    )


def test_url_canonicalization_edges(spark):
    from annual_report_pdf_parsers_spark.operators.urls import (
        canonicalize_url,
    )
    from pyspark.sql import functions as F

    cases = [
        ("HTTPS://WWW.Ex.COM/a/b/?utm_source=x&q=1&fbclid=z#top",
         "https://ex.com/a/b?q=1"),
        ("http://ex.com/", "http://ex.com"),            # bare trailing slash
        ("https://ex.com/p?utm_campaign=only", "https://ex.com/p"),
        ("https://sub.www-like.org/p?a=1&b=2", "https://sub.www-like.org/p?a=1&b=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [w for _, w in cases]
