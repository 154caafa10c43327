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


def test_canonicalize_url_property(spark):
    """Property (r10): for ARBITRARY urls built from components, the
    canonical form is (a) IDEMPOTENT — canonicalizing a canonical url is a
    no-op — and (b) INVARIANT across the messy presentations of the same
    resource: scheme/host case, default ports, utm_* params in any
    position, param order, fragments, trailing slashes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    host_label = st.text(alphabet="abcdefg", min_size=1, max_size=5)
    param = st.tuples(
        st.text(alphabet="abcxyz", min_size=1, max_size=4),
        st.text(alphabet="0123456789", min_size=1, max_size=3),
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.sampled_from(["http", "https"]),
        st.lists(host_label, min_size=2, max_size=3),
        st.lists(st.text(alphabet="abc123", min_size=1, max_size=4), min_size=0, max_size=3),
        st.lists(param, min_size=0, max_size=3, unique_by=lambda p: p[0]),
        st.integers(min_value=0, max_value=2),   # utm insertion point
        st.booleans(),                           # upper-case host
        st.booleans(),                           # default port
        st.booleans(),                           # fragment
        st.booleans(),                           # trailing slash
    )
    def prop(scheme, labels, path_segs, params, utm_at, up, port, frag, slash):
        host = ".".join(labels)
        path = "/" + "/".join(path_segs)
        plist = [f"{k}={v}" for k, v in params]
        messy_params = list(plist)
        messy_params.insert(min(utm_at, len(plist)), "utm_source=feed1")
        messy_host = host.upper() if up else host
        messy_port = (":443" if scheme == "https" else ":80") if port else ""
        messy_path = path + ("/" if slash and path != "/" else "")
        messy = (
            f"{scheme.upper() if up else scheme}://{messy_host}{messy_port}"
            f"{messy_path}"
            + ("?" + "&".join(messy_params) if messy_params else "")
            + ("#frag" if frag else "")
        )
        clean = (
            f"{scheme}://{host}"
            + (path.rstrip("/") or "/")
            + ("?" + "&".join(sorted(plist)) if plist else "")
        )
        df = spark.createDataFrame([(messy,), (clean,)], "url string")
        got = [
            r["c"]
            for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
        ]
        assert got[0] == clean, f"messy {messy!r} -> {got[0]!r}, want {clean!r}"
        assert got[1] == clean, f"not idempotent: {clean!r} -> {got[1]!r}"

    prop()


def _duck_canon(url):
    import duckdb

    from aws_etl_fiap_spark.queries.web_q import sql_canonicalize_ctes

    sql = (
        "WITH urls AS (SELECT 0 AS doc_id, $url AS url),\n"
        + sql_canonicalize_ctes()
        + "\nSELECT canonical_url, host, registered_domain FROM doms"
    )
    return duckdb.connect().execute(sql, {"url": url}).fetchone()


def _spark_canon(spark, url):
    from aws_etl_fiap_spark.operators.web import (
        canonicalize_url,
        host_of,
        registered_domain,
    )

    row = (
        spark.createDataFrame([(url,)], "url string")
        .select(canonicalize_url(F.col("url")).alias("c"))
        .withColumn("h", host_of(F.col("c")))
        .withColumn("d", registered_domain(F.col("h")))
        .collect()[0]
    )
    return (row.c, row.h, row.d)


def test_canonicalize_twins_on_degenerate_urls(spark):
    """r13 fuzz regression: the oracle's sorted-query rebuild used a bare
    array_to_string, which is NULL over an empty list in DuckDB (all
    params utm_*, or no query string) where Spark's array_join is '' —
    NULL-poisoning the whole canonical URL through the '?' concat.  The
    registered fixture always carries a non-utm param so the gate never
    reached it; these degenerate crawl-reality shapes did.  Fixed with
    the same coalesce guard sql_main_content documents."""
    cases = [
        "http://",                       # empty host, no query
        "https://example.com?utm_a=1",   # query filters to nothing
        "http://example.com?",           # bare '?'
        "http://example.com#only-frag",
        "ftp://X.CO.UK:443/a//",
        "http://localhost/x?b=2&a=1",    # single-label host
    ]
    for url in cases:
        assert _spark_canon(spark, url) == _duck_canon(url), url


def test_canonicalize_twins_fuzz_property(spark):
    """Adversarial URL compositions (ports, userinfo, repeated separators,
    unicode, %-escapes, uppercase two-level TLDs): Spark canonicalize ->
    host -> eTLD+1 must equal the shared DuckDB mirror byte-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from([
        "http://", "https://", "HTTPS://", "example", "EXAMPLE", ".com",
        ".CO.UK", ".co.uk", ".io", ":80", ":443", ":8080", "/", "/path",
        "//", "?", "&", "=", "utm_x=1", "ref=a", "a=b", "#frag", "#",
        "user:pass@", "café", "%20", "+", ".", "www.", "sub.",
        "?q=z&q=a",
    ])
    urls = st.lists(frag, min_size=1, max_size=10).map("".join)

    @settings(max_examples=15, deadline=None)
    @given(urls)
    def prop(url):
        assert _spark_canon(spark, url) == _duck_canon(url), url

    prop()
