"""Unit tests for the URL canonicalization / domain-extraction operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.web import (
    canonicalize_url,
    host_of,
    registered_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # lowercase scheme + host, keep path case
        ("HTTPS://WWW.Example.COM/A/B", "https://www.example.com/A/B"),
        # default ports stripped, non-default kept
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:443/x", "https://a.com/x"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),
        # fragment dropped
        ("https://a.com/x#frag", "https://a.com/x"),
        # utm params dropped, remainder sorted, empties removed
        ("https://a.com/x?utm_source=s&b=2&a=1", "https://a.com/x?a=1&b=2"),
        ("https://a.com/x?utm_a=1&utm_b=2", "https://a.com/x"),
        ("https://a.com/x?b=2&&a=1", "https://a.com/x?a=1&b=2"),
        # trailing slash collapsed; bare root kept
        ("https://a.com/x/", "https://a.com/x"),
        ("https://a.com/x///", "https://a.com/x"),
        ("https://a.com/", "https://a.com/"),
        ("https://a.com", "https://a.com/"),
    ],
)
def test_canonicalize_url_rules(spark, raw, want):
    assert _canon(spark, [raw]) == [want]


def test_registered_domain_public_suffix(spark):
    hosts = [
        ("www.example.com", "example.com"),
        ("cdn1.deep.example.co.uk", "example.co.uk"),
        ("example.co.jp", "example.co.jp"),  # the eTLD+1 itself
        ("a.b.site.com.br", "site.com.br"),
        ("plain.io", "plain.io"),
        # Single-label hosts return as-is — under ANSI mode (the session
        # default) an unguarded element_at(parts, -2) would be a
        # job-killing ArrayIndexOutOfBounds, not a NULL (r10 review).
        ("localhost", "localhost"),
        ("intranet", "intranet"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = [
        r["d"]
        for r in df.select(registered_domain(F.col("host")).alias("d")).collect()
    ]
    assert got == [want for _, want in hosts]


def test_host_of_canonical(spark):
    df = spark.createDataFrame(
        [("https://www.example.com/a?b=1",)], "url string"
    )
    assert df.select(host_of(F.col("url")).alias("h")).collect()[0]["h"] == (
        "www.example.com"
    )
