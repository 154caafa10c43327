"""Web-corpus curation queries: canonical-URL dedup + domain policy rollup.

[EXT] north star — the reference has no web surface (its one source is the
B3 ticker API, src/glue/b3_collector.py:62-68).  The synthetic URL fixture
is derived deterministically from (doc_id, source) on BOTH engines, so the
entire normalize -> canonicalize -> eTLD+1 -> policy-rollup pipeline sits
behind an exact value gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.web import (
    canonicalize_url,
    host_of,
    registered_domain,
    synth_url,
)
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

#: Domain-level exclusion policy (crawl blocklists are domain-granular).
BLOCKED_DOMAINS: tuple[str, ...] = (
    "src7media.org",
    "src13media.co.uk",
    "src3media.io",
)

def sql_canonicalize_ctes(src: str = "urls") -> str:
    """The c1..doms DuckDB canonicalization mirror over a CTE named ``src``
    holding (doc_id, url) — ONE source of truth shared by the registered
    oracle below and the adversarial twin fuzz in tests/test_web.py.

    The ``coalesce(..., '')`` on the sorted-query rebuild is load-bearing
    (r13 fuzz finding): DuckDB's array_to_string over an EMPTY list —
    every param filtered as utm_*, or no query string at all — returns
    NULL where Spark's array_join returns '', which NULL-poisoned the
    whole canonical URL through the '?' concat.  The registered fixture
    always carries a non-utm param so the gate never reached it; arbitrary
    crawl URLs do.  Same engine gap sql_main_content already guards."""
    return f"""c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM {src}),
c2 AS (
    SELECT doc_id, nf,
        lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
            AS hostport,
        regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
    FROM c1
),
c3 AS (
    SELECT doc_id, scheme,
        CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
             ELSE hostport END AS host,
        regexp_extract(rest, '^([^?]*)', 1) AS rawpath,
        regexp_extract(rest, '\\?(.*)$', 1) AS qstr
    FROM c2
),
c4 AS (
    SELECT doc_id, scheme, host,
        CASE WHEN regexp_matches(rawpath, './$')
             THEN regexp_replace(rawpath, '/+$', '')
             ELSE rawpath END AS trimmed,
        coalesce(array_to_string(
            list_sort(list_filter(string_split(qstr, '&'),
                                  p -> p <> '' AND NOT regexp_matches(p, '^utm_'))),
            '&'), '') AS cq
    FROM c3
),
curls AS (
    SELECT doc_id, host,
        scheme || '://' || host
        || CASE WHEN trimmed = '' THEN '/' ELSE trimmed END
        || CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canonical_url
    FROM c4
),
doms AS (
    SELECT doc_id, host, canonical_url,
        CASE WHEN regexp_matches(host, '\\.(co\\.uk|com\\.br|co\\.jp)$')
                  AND len(string_split(host, '.')) >= 3
             THEN concat_ws('.', string_split(host, '.')[-3],
                            string_split(host, '.')[-2], string_split(host, '.')[-1])
             ELSE concat_ws('.', string_split(host, '.')[-2],
                            string_split(host, '.')[-1]) END AS registered_domain
    FROM curls
)"""


_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, source,
        CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END AS scheme,
        CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
             WHEN doc_id % 3 = 1 THEN 'cdn' || CAST(doc_id % 5 AS VARCHAR) || '.'
             ELSE '' END AS sub,
        CASE WHEN doc_id % 4 = 0 THEN '.com'
             WHEN doc_id % 4 = 1 THEN '.org'
             WHEN doc_id % 4 = 2 THEN '.co.uk'
             ELSE '.io' END AS tld
    FROM documents
),
urls AS (
    SELECT doc_id,
        scheme || '://' || sub
        || CASE WHEN doc_id % 7 < 3 THEN upper(source || 'media' || tld)
                ELSE source || 'media' || tld END
        || CASE WHEN doc_id % 13 = 0
                THEN CASE WHEN scheme = 'https' THEN ':443' ELSE ':80' END
                ELSE '' END
        || '/articles/' || CAST(doc_id % 25 AS VARCHAR)
        || CASE WHEN doc_id % 19 = 0 THEN '/' ELSE '' END
        || '?'
        || CASE WHEN doc_id % 11 < 5
                THEN 'utm_campaign=c' || CAST(doc_id % 9 AS VARCHAR)
                     || '&ref=' || source
                     || '&utm_source=feed' || CAST(doc_id % 6 AS VARCHAR)
                ELSE 'utm_source=feed' || CAST(doc_id % 6 AS VARCHAR)
                     || '&utm_campaign=c' || CAST(doc_id % 9 AS VARCHAR)
                     || '&ref=' || source END
        || CASE WHEN doc_id % 17 = 0 THEN '#section-2' ELSE '' END AS url
    FROM raw
),
{sql_canonicalize_ctes()}
SELECT registered_domain,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT host) AS n_hosts,
       COUNT(DISTINCT canonical_url) AS n_urls,
       COUNT(*) - COUNT(DISTINCT canonical_url) AS n_dup_docs,
       MAX(CASE WHEN registered_domain IN {BLOCKED_DOMAINS!r} THEN 1 ELSE 0 END)
           AS blocked,
       MIN(canonical_url) AS sample_url
FROM doms
GROUP BY registered_domain
"""


@query("web_domain_policy_rollup", oracle=_ORACLE)
def web_domain_policy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Crawl-corpus URL curation in one pass: synthesize the messy
    URL fixture, canonicalize (lowercase scheme/host, strip default ports
    and utm_* params, sort the query string, drop fragments, collapse
    trailing slashes), extract the eTLD+1 registered domain under a
    public-suffix sample, then roll up per-domain: doc count, distinct
    hosts, distinct canonical URLs, canonical-duplicate count, and a
    broadcast blocklist policy flag.

    100 TB shape: synthesis + canonicalization + domain extraction are all
    codegen'd string/array expressions (zero Python, zero shuffle); the
    only exchanges are the distinct-count expand keyed by domain — the
    rollup's natural key — and the blocklist is a literal predicate (no
    join at all).  Canonical-URL dedup at crawl scale is this exact plan
    with the rollup key swapped to canonical_url."""
    docs = load_table(spark, sf_dir, "documents")
    url = synth_url(F.col("doc_id"), F.col("source"))
    canon = canonicalize_url(url)
    with_cols = docs.select(
        F.col("doc_id"), canon.alias("canonical_url")
    ).withColumn("host", host_of(F.col("canonical_url"))).withColumn(
        "registered_domain", registered_domain(F.col("host"))
    )
    flagged = with_cols.withColumn(
        "blocked_row",
        F.when(F.col("registered_domain").isin(*BLOCKED_DOMAINS), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    return flagged.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("canonical_url").alias("n_urls"),
        (F.count(F.lit(1)) - F.countDistinct("canonical_url")).alias("n_dup_docs"),
        F.max("blocked_row").alias("blocked"),
        F.min("canonical_url").alias("sample_url"),
    )
