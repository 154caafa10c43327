"""Web-text hygiene (operators/webtext.py): boilerplate extraction and
Unicode sanitation — per-rule classification, DuckDB-twin parity, and the
web curation funnel composition (r12 verdict tasks 5-6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.webtext import (
    MAX_LINK_DENSITY,
    MIN_BLOCK_WORDS,
    MIN_STOPWORD_FRAC,
    extract_main_content,
    sql_main_content,
    sql_n_blocks,
    sql_n_kept,
    unicode_sanitize,
)

# One block per classification outcome, each decided by exactly one rule.
CONTENT = (
    "<p>key agg row scan slow fast table value part hash extra words</p>"
)  # 12 words, no links -> kept by word count
PROSE_SHORT = (
    "<p>this is the best of the data in it</p>"
)  # 9 words, 4 stopwords (0.44 >= 0.25) -> kept by stopword density
LINKY = (
    '<li><a href="/m">read the full article on the data table of the site'
    "</a> see more words here</li>"
)  # 15 words (passes word count) but anchor chars dominate -> dropped by
# link density ALONE
NAV = (
    '<div><a href="/">Home</a> <a href="/a">About</a>'
    ' <a href="/c">Contact</a></div>'
)  # 3 words, link-saturated -> dropped
SHORT_PLAIN = "<p>tiny fragment here</p>"  # 3 words, 0 stopwords -> dropped


def _extract(spark, html):
    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    return extract_main_content(df, "html").collect()[0]


def test_block_kept_by_word_count(spark):
    row = _extract(spark, CONTENT)
    assert row.n_kept == 1
    assert row.main_content == (
        "key agg row scan slow fast table value part hash extra words"
    )


def test_block_kept_by_stopword_density(spark):
    row = _extract(spark, PROSE_SHORT)
    assert row.n_kept == 1
    assert row.main_content == "this is the best of the data in it"


def test_block_dropped_by_link_density_alone(spark):
    # the block passes the word-count rule, so only link density drops it
    row = _extract(spark, LINKY)
    assert row.n_blocks == 1 and row.n_kept == 0
    assert row.main_content == ""


def test_nav_and_short_blocks_dropped(spark):
    row = _extract(spark, NAV + SHORT_PLAIN)
    assert row.n_blocks == 2 and row.n_kept == 0


def test_multi_block_join_order(spark):
    row = _extract(spark, NAV + CONTENT + LINKY + PROSE_SHORT)
    assert row.n_blocks == 4 and row.n_kept == 2
    assert row.main_content == (
        "key agg row scan slow fast table value part hash extra words"
        " this is the best of the data in it"
    )


def test_tag_strip_and_whitespace_squeeze(spark):
    html = "<p>alpha <b>bold</b>\tbeta   gamma delta epsilon zeta eta theta iota kappa</p>"
    row = _extract(spark, html)
    assert row.main_content == (
        "alpha bold beta gamma delta epsilon zeta eta theta iota kappa"
    )


def test_extract_matches_duckdb_twin_property(spark):
    """Random compositions of the five block archetypes: Spark extraction
    equals the DuckDB twin byte-exactly (the same guarantee the driver
    hash enforces at the gate, here across many shapes)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blocks = st.lists(
        st.sampled_from([CONTENT, PROSE_SHORT, LINKY, NAV, SHORT_PLAIN]),
        min_size=0,
        max_size=5,
    )

    @settings(max_examples=8, deadline=None)
    @given(blocks)
    def prop(bs):
        html = "".join(bs)
        df = spark.createDataFrame([(0, html)], "doc_id long, html string")
        got = extract_main_content(df, "html").collect()[0]
        con = duckdb.connect()
        want = con.execute(
            f"SELECT {sql_main_content('$html')}, {sql_n_blocks('$html')},"
            f" {sql_n_kept('$html')}",
            {"html": html},
        ).fetchone()
        assert (got.main_content, got.n_blocks, got.n_kept) == want

    prop()


def test_thresholds_are_sane():
    assert 0 < MAX_LINK_DENSITY < 1
    assert MIN_BLOCK_WORDS >= 1
    assert 0 < MIN_STOPWORD_FRAC < 1


def test_unicode_sanitize_mojibake(spark):
    df = spark.createDataFrame(
        [(0, "visit the caf\u00c3\u00a9 soon")], "doc_id long, text string"
    )
    row = unicode_sanitize(df).collect()[0]
    assert row.sanitized == "visit the caf\u00e9 soon"
    assert row.repaired and row.n_controls_removed == 0


def test_unicode_sanitize_nfc_composes(spark):
    df = spark.createDataFrame(
        [(0, "re\u0301sume\u0301 text")], "doc_id long, text string"
    )
    row = unicode_sanitize(df).collect()[0]
    assert row.sanitized == "r\u00e9sum\u00e9 text"
    assert row.repaired


def test_unicode_sanitize_control_scrub_keeps_tabs_newlines(spark):
    df = spark.createDataFrame(
        [(0, "a\x01b\x07c\td\ne")], "doc_id long, text string"
    )
    row = unicode_sanitize(df).collect()[0]
    assert row.sanitized == "abc\td\ne"
    assert row.n_controls_removed == 2 and not row.repaired


def test_unicode_sanitize_clean_text_untouched(spark):
    df = spark.createDataFrame(
        [(0, "perfectly clean ascii")], "doc_id long, text string"
    )
    row = unicode_sanitize(df).collect()[0]
    assert row.sanitized == "perfectly clean ascii"
    assert not row.repaired and row.n_controls_removed == 0


def test_unicode_sanitize_invalid_mojibake_survives(spark):
    """Text containing a tripwire char that is NOT a valid UTF-8 byte
    stream must pass through un-repaired (the round-trip attempt fails
    loudly inside the heuristic, quietly for the caller)."""
    df = spark.createDataFrame(
        [(0, "\u00c3 alone is not utf8")], "doc_id long, text string"
    )
    row = unicode_sanitize(df).collect()[0]
    assert row.sanitized == "\u00c3 alone is not utf8"
    assert not row.repaired


def test_unicode_sanitize_null_passthrough(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    row = unicode_sanitize(df).collect()[0]
    assert row.sanitized is None


def test_web_funnel_drops_boilerplate_only_pages(spark):
    """curate_web_corpus: a page with zero kept blocks exits at the
    extraction stage; content pages flow through to the plain funnel."""
    from aws_etl_fiap_spark.plans.corpus import web_curation_funnel_counts

    pages = spark.createDataFrame(
        [(1, NAV), (2, NAV + CONTENT), (3, NAV + CONTENT)],
        "doc_id long, html string",
    )
    counts = {
        r.stage: r.n_docs for r in web_curation_funnel_counts(pages).collect()
    }
    assert counts["raw"] == 3
    assert counts["extracted"] == 2
    assert counts["sanitized"] == 2
    # the two surviving pages have IDENTICAL extracted text -> exact dedup
    assert counts["exact_dedup"] <= counts["quality"]


def test_extraction_plan_is_scan_stage_only(spark):
    """100 TB posture: extraction + sanitation wrap the scan in a single
    stage — no Exchange appears anywhere in the plan (the boilerplate
    bytes never shuffle)."""
    from aws_etl_fiap_spark.plans.corpus import curate_web_corpus

    pages = spark.createDataFrame(
        [(1, NAV + CONTENT)], "doc_id long, html string"
    )
    plan = (
        curate_web_corpus(pages)["sanitized"]
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# --- r13 property extensions: idempotence / fixpoint laws ------------------


def test_extract_is_idempotent_property(spark):
    """extract(extract(x)) == extract(x) as a LAW, not a sample: the
    extracted output is tag-free (link density 0) and is the union of
    kept blocks, so it re-passes the keep rule whenever it is non-empty —
    each kept block passed via word count (counts only aggregate upward
    under union) or via stopword density (the union's fraction is a
    weighted average of passing fractions, so it stays >= the threshold)
    — and the empty output splits into zero non-empty blocks.  Exercised
    over every classification-fixture combination, including the
    all-boilerplate empty case."""
    combos = [
        CONTENT,
        PROSE_SHORT,
        NAV,  # -> empty extraction
        NAV + CONTENT,
        LINKY + PROSE_SHORT,
        CONTENT + PROSE_SHORT + NAV + LINKY + SHORT_PLAIN,
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(combos)], "doc_id long, html string"
    )
    once = extract_main_content(df, "html").select(
        "doc_id", F.col("main_content").alias("html")
    )
    twice = extract_main_content(once, "html")
    rows = {
        r.doc_id: r
        for r in twice.join(
            extract_main_content(df, "html").select(
                "doc_id", F.col("main_content").alias("first_pass")
            ),
            "doc_id",
        ).collect()
    }
    assert len(rows) == len(combos)
    for r in rows.values():
        assert r.main_content == r.first_pass, r
        # the re-extraction sees one tag-free block (or none when empty)
        assert r.n_kept == (1 if r.first_pass else 0), r


def test_sanitize_is_idempotent_on_single_layer_property(spark):
    """sanitize(sanitize(x)) == sanitize(x) on the operator's declared
    input class (clean text, NFD sequences, control damage, and SINGLE
    mojibake layers): the second pass must be a complete no-op —
    repaired=false and n_controls_removed=0 — because repair output
    contains no remaining markers-with-valid-roundtrip, NFC is
    idempotent, and the scrub removed every control."""
    cases = [
        "plain ascii text",
        "visit the cafÃ© soon",  # single mojibake layer
        "résumé text",  # NFD -> NFC
        "ctrl\x01 damage\x07 here",
        "Ã alone is not utf8",  # tripwire without valid roundtrip
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    once = unicode_sanitize(df).select(
        "doc_id", F.col("sanitized").alias("text")
    )
    rows = unicode_sanitize(once).collect()
    for r in rows:
        assert not r.repaired, r
        assert r.n_controls_removed == 0, r
        assert r.sanitized == r.text, r


def test_sanitize_peels_one_mojibake_layer_per_pass(spark):
    """DOUBLE-encoded mojibake is repaired one layer per pass (the ftfy
    explain-one-step contract, pinned so a future 'loop to fixpoint'
    change is a deliberate semantics change, not an accident): pass 1
    yields the singly-encoded artifact with repaired=true, pass 2
    finishes the job, pass 3 is a no-op."""
    single = "cafÃ©"
    double = single.encode("utf-8").decode("latin-1")
    df = spark.createDataFrame([(0, double)], "doc_id long, text string")
    p1 = unicode_sanitize(df).collect()[0]
    assert p1.repaired and p1.sanitized == single
    p2 = unicode_sanitize(
        spark.createDataFrame([(0, p1.sanitized)], "doc_id long, text string")
    ).collect()[0]
    assert p2.repaired and p2.sanitized == "café"
    p3 = unicode_sanitize(
        spark.createDataFrame([(0, p2.sanitized)], "doc_id long, text string")
    ).collect()[0]
    assert not p3.repaired and p3.sanitized == "café"


def test_extract_twins_agree_on_unicode_whitespace(spark):
    """r13 fuzz regression: Java \\s includes \\x0b where RE2's does not,
    and DuckDB's trim strips the Unicode Zs category (NBSP & friends)
    where Spark's strips only 0x20 — a bare U+00A0 document diverged
    between the twins (Spark counted a non-empty block, DuckDB did not).
    The shared explicit _WS_RUN class replaces both engines' \\s/trim
    semantics; this pins the repaired cases byte-exactly."""
    import duckdb

    cases = [
        "\u00a0",                      # the original falsifying example
        "\u00a0<p>word\u00a0list</p>\u2009",
        "a\x0bb",                      # VT: Java-\s-only member
        "\u3000\u200a lead and trail \u202f",
        "\u200b",                      # ZWSP: NOT whitespace in either
        CONTENT + "\u00a0" + PROSE_SHORT,
    ]
    con = duckdb.connect()
    for html in cases:
        df = spark.createDataFrame([(0, html)], "doc_id long, html string")
        got = extract_main_content(df, "html").collect()[0]
        want = con.execute(
            f"SELECT {sql_main_content('$html')}, {sql_n_blocks('$html')},"
            f" {sql_n_kept('$html')}",
            {"html": html},
        ).fetchone()
        assert (got.main_content, got.n_blocks, got.n_kept) == want, html
