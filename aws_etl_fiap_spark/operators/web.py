"""URL canonicalization / web-corpus curation operators ([EXT] north star).

The reference (hgribeiro/aws-etl-fiap) has no web surface at all — its only
source is the B3 ticker API (src/glue/b3_collector.py:62-68); these operators
extend the engine toward the web-scale training-data pipeline (SURVEY.md
§2.13): canonical-URL dedup and registered-domain policy rollups are the
first stage of every crawl-corpus curation funnel.

Everything is JVM-side expression work (regexp / array functions) — zero
Python in the hot path, zero shuffles before the final rollup — and every
rule is mirrored by the DuckDB oracle in queries/web_q.py, so the whole
normalization pipeline sits behind an exact value gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal public-suffix sample (the full list is publicsuffix.org — public
#: data): suffixes under which registration happens one label deeper.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = ("co.uk", "com.br", "co.jp")

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_AUTHORITY_PREFIX_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def synth_url(doc_id: Column, source: Column) -> Column:
    """Deterministic messy URL synthesized from (doc_id, source).

    The corpus carries no URLs (TESTDATA.md), so — like text.redact_pii's
    synthetic PII — the fixture derives one per document, exercising every
    canonicalization rule.  Residue classes are chosen so that documents
    whose canonical-relevant residues agree (doc_id mod 300, same source)
    still differ in the MESSY-only bits (case %7, port %13, param order
    %11, fragment %17, trailing slash %19): canonical duplicates whose raw
    strings differ — the case URL dedup exists for.
    """
    scheme = F.when(doc_id % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    sub = (
        F.when(doc_id % 3 == 0, F.lit("WWW."))
        .when(
            doc_id % 3 == 1,
            F.concat(F.lit("cdn"), (doc_id % 5).cast("string"), F.lit(".")),
        )
        .otherwise(F.lit(""))
    )
    tld = (
        F.when(doc_id % 4 == 0, F.lit(".com"))
        .when(doc_id % 4 == 1, F.lit(".org"))
        .when(doc_id % 4 == 2, F.lit(".co.uk"))
        .otherwise(F.lit(".io"))
    )
    base = F.concat(source, F.lit("media"), tld)
    host = F.concat(sub, F.when(doc_id % 7 < 3, F.upper(base)).otherwise(base))
    port = F.when(
        doc_id % 13 == 0,
        F.when(scheme == F.lit("https"), F.lit(":443")).otherwise(F.lit(":80")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/articles/"),
        (doc_id % 25).cast("string"),
        F.when(doc_id % 19 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    ref = F.concat(F.lit("ref="), source)
    utm = F.concat(F.lit("utm_campaign=c"), (doc_id % 9).cast("string"))
    track = F.concat(F.lit("utm_source=feed"), (doc_id % 6).cast("string"))
    query = F.when(
        doc_id % 11 < 5, F.concat_ws("&", utm, ref, track)
    ).otherwise(F.concat_ws("&", track, utm, ref))
    frag = F.when(doc_id % 17 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, F.lit("?"), query, frag)


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped, utm_*
    tracking params dropped, remaining query params sorted, fragment
    removed, trailing path slashes collapsed (empty path -> "/")."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(no_frag, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == F.lit("http"), F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_replace(no_frag, _AUTHORITY_PREFIX_RE, "")
    rawpath = F.regexp_extract(rest, "^([^?]*)", 1)
    trimmed = F.when(
        rawpath.rlike("./$"), F.regexp_replace(rawpath, "/+$", "")
    ).otherwise(rawpath)
    path = F.when(trimmed == F.lit(""), F.lit("/")).otherwise(trimmed)
    qstr = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.filter(
        F.split(qstr, "&"),
        lambda p: (p != F.lit("")) & (~p.rlike("^utm_")),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == F.lit(""), F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )


def host_of(canonical_url: Column) -> Column:
    """Host of an already-canonical URL (no port, already lowercase)."""
    return F.regexp_extract(canonical_url, _HOSTPORT_RE, 1)


def registered_domain(host: Column) -> Column:
    """eTLD+1 under the TWO_LEVEL_SUFFIXES sample list: last two host
    labels, or last three when the host ends in a two-level public suffix.

    Single-label hosts (localhost, bare intranet names) return as-is: the
    session runs ANSI mode (Spark 4 default), where an unguarded
    element_at(parts, -2) on a 1-element array is a JOB-KILLING
    ArrayIndexOutOfBounds, not a NULL — at crawl scale one intranet URL
    would fail the whole rollup (r10 adversarial review).  CaseWhen
    evaluates branch values lazily per row, so the size guard below makes
    the negative indexes safe."""
    parts = F.split(host, "\\.")
    two_level = host.rlike(
        "\\.(" + "|".join(s.replace(".", "\\.") for s in TWO_LEVEL_SUFFIXES) + ")$"
    )
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(F.size(parts) < 2, host)
        .when(two_level & (F.size(parts) >= 3), last3)
        .otherwise(last2)
    )
