"""Unit tests for the round-6 quality/text additions: PII redaction,
repetition stats, the single-pass DQ audit, and the salted big-big join —
hand-computed expectations on crafted rows (the sf0.01 oracle parity runs in
test_oracle_parity.py; these pin the operator semantics directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.cleaning import audit_checks
from aws_etl_fiap_spark.operators.text import redact_pii, repetition_stats


def test_redact_pii_counts_and_sequencing(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@x.example.org or visit https://x.example.org/u?id=1 tel +1 (555) 010-9999 ok"),
            (2, "no pii here at all"),
            # URL embedding an @ must be consumed by the URL rule, not the
            # email rule (sequencing: URL replaces first).
            (3, "see https://u:p@host.example.com/path now"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert (rows[1]["n_url"], rows[1]["n_email"], rows[1]["n_phone"]) == (1, 1, 1)
    # Conservative phone matching (late-r9): the space-grouped prefix
    # "+1 (555)" stays, only the solid dashed run redacts — a space in the
    # class made ANY run of space-separated numbers collapse into <PHONE>.
    assert rows[1]["redacted"] == "mail me at <EMAIL> or visit <URL> tel +1 (555) <PHONE> ok"
    assert (rows[2]["n_url"], rows[2]["n_email"], rows[2]["n_phone"]) == (0, 0, 0)
    assert rows[2]["redacted"] == "no pii here at all"
    assert (rows[3]["n_url"], rows[3]["n_email"], rows[3]["n_phone"]) == (1, 0, 0)
    assert rows[3]["redacted"] == "see <URL> now"


def test_repetition_stats_hand_computed(spark):
    # "a a a b": 4 tokens, 2 distinct, top token 'a' x3, bigrams
    # ["a a","a a","a b"] -> top bigram "a a" x2 of 3.
    df = spark.createDataFrame([(1, "a a a b"), (2, "x")], "doc_id int, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(df, "text").collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["distinct_ratio"] == 0.5
    assert rows[1]["top_token_frac"] == 0.75
    assert rows[1]["top_bigram_frac"] == 2.0 / 3.0
    # single token: no bigram -> NULL, ratios degenerate to 1.
    assert rows[2]["n_tokens"] == 1
    assert rows[2]["distinct_ratio"] == 1.0
    assert rows[2]["top_bigram_frac"] is None


def test_audit_checks_single_pass_and_counts(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 0.0), (4, 2.0)],
        "k bigint, v double",
    )
    out = audit_checks(
        df,
        [("null_k", F.col("k").isNull()), ("nonpositive_v", F.col("v") <= 0)],
    )
    rows = {r["check_name"]: r for r in out.collect()}
    assert rows["null_k"]["n_fail"] == 1
    assert rows["nonpositive_v"]["n_fail"] == 2
    assert all(r["n_rows"] == 4 for r in rows.values())
    # Single-pass claim: exactly one scan of the source feeds one aggregate
    # (no per-check re-read, the reference's recount anti-pattern).
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE's toString prints final + initial plan; count scans in the final
    # section only.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("LocalTableScan") + final.count("Scan ExistingRDD") <= 1


def test_salted_join_matches_plain_with_nulls_and_dupes(spark):
    big = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0), (None, 99.0), (5, 50.0)],
        "k bigint, v double",
    )
    small = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b2"), (3, "c")], "sk bigint, tag string"
    )
    from aws_etl_fiap_spark.operators.skew import salted_join

    salted = salted_join(big, small, "k", "sk", salt_source=["k", "v"], n_salts=4)
    plain = big.join(small, big["k"] == small["sk"])
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_skew_salted_bigbig_plans_no_broadcast(spark, sf_smoke):
    """The registered salted big-big join must exercise the REAL shuffle
    path: its scoped autoBroadcastJoinThreshold=-1 has to keep both the
    static planner and AQE's runtime rewrite away from a broadcast.  This
    gate used to run inline in the query body via executedPlan() on every
    invocation (~0.2-0.3 s of planning latency per bench run); it is a
    plan INVARIANT, so it belongs here."""
    from aws_etl_fiap_spark.confs import scoped_conf
    from aws_etl_fiap_spark.operators.skew import salted_join
    from aws_etl_fiap_spark.sources.readers import load_table

    sf = sf_smoke
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    # mirror of the registered query's construction, WITHOUT the final
    # eager checkpoint (which would hide the join behind a cache scan)
    with scoped_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        joined = salted_join(
            li, orders,
            big_key="l_orderkey", small_key="o_orderkey",
            salt_source=["l_orderkey", "l_linenumber"], n_salts=8,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" not in final, final
    # and the salted shape is actually present: a shuffle join on the
    # (key, salt) pair somewhere in the final plan
    assert "SortMergeJoin" in final or "ShuffledHashJoin" in final, final


def test_snapshot_diff_classifies_all_transitions(spark):
    from aws_etl_fiap_spark.operators.cleaning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),      # unchanged -> dropped
            (2, "b", 2.5),      # value update
            (3, "c", 3.0),      # NULL -> value must classify as update
            (5, "e", 5.0),      # insert
        ],                       # 4 deleted
        "k bigint, s string, v double",
    )
    out = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert out == {2: "updated", 3: "updated", 4: "deleted", 5: "inserted"}


def test_gapfill_zero_fills_and_forward_fills(spark):
    # One type, buckets at 00:00 and 00:30 -> spine has 00:10/00:20 gaps
    # that must appear with n_events=0 and the 00:00 total forward-filled.
    from aws_etl_fiap_spark.queries.quality_q import timeseries_gapfill_ffill  # noqa: F401
    from pyspark.sql import Window
    from aws_etl_fiap_spark.functions.parity import dec_sum

    ev = spark.createDataFrame(
        [("x", "2024-01-01 00:01:00", 1.5), ("x", "2024-01-01 00:33:00", 2.5)],
        "event_type string, ts_s string, value double",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    sparse = (
        ev.groupBy("event_type", F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value", 2).alias("tv"))
        .select("event_type", F.col("window.start").alias("b"), "n", "tv")
    )
    bounds = sparse.groupBy("event_type").agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("b0", "b1", F.expr("interval 10 minutes"))).alias("b"),
    )
    w = Window.partitionBy("event_type").orderBy("b")
    rows = (
        spine.join(sparse, ["event_type", "b"], "left")
        .select(
            "b",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("tv", ignorenulls=True).over(w).alias("ff"),
        )
        .orderBy("b")
        .collect()
    )
    assert [r["n"] for r in rows] == [1, 0, 0, 1]
    assert [float(r["ff"]) for r in rows] == [1.5, 1.5, 1.5, 2.5]


def test_decontaminate_exact_hits_and_broadcast_free_zero(spark):
    """A train doc sharing a full 3-gram with the bench set is counted; a
    disjoint doc scores 0; short docs (<3 tokens) are out of scope."""
    from aws_etl_fiap_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    train = spark.createDataFrame(
        [
            (10, "x a b c y"),     # shares shingle "a b c" -> 1 hit of 3
            (11, "p q r s"),       # disjoint -> 0 hits of 2
            (12, "one two"),       # < 3 tokens -> no row
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontaminate(train, bench).collect()}
    assert set(rows) == {10, 11}
    assert rows[10]["n_shingles"] == 3 and rows[10]["n_hits"] == 1
    assert rows[11]["n_shingles"] == 2 and rows[11]["n_hits"] == 0


def test_scd2_collapse_versions_and_intervals(spark):
    """Consecutive duplicate states collapse; reverting to an earlier state
    opens a NEW version; intervals chain with no gaps and one open tail."""
    from aws_etl_fiap_spark.operators.windows import scd2_collapse

    rows = [
        (1, "A", "2024-01-01 00:00:00", 1),
        (1, "A", "2024-01-02 00:00:00", 2),  # dup -> same version
        (1, "B", "2024-01-03 00:00:00", 3),
        (1, "A", "2024-01-04 00:00:00", 4),  # revert -> version 3, not 1
        (2, "Z", "2024-01-01 00:00:00", 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, state string, ts string, event_id long")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = scd2_collapse(df, "user_id", "state", "ts", "event_id")
    got = sorted(
        (r["user_id"], r["version"], r["state"], str(r["effective_from"]),
         str(r["effective_to"]), r["is_current"])
        for r in out.collect()
    )
    assert got == [
        (1, 1, "A", "2024-01-01 00:00:00", "2024-01-03 00:00:00", 0),
        (1, 2, "B", "2024-01-03 00:00:00", "2024-01-04 00:00:00", 0),
        (1, 3, "A", "2024-01-04 00:00:00", "None", 1),
        (2, 1, "Z", "2024-01-01 00:00:00", "None", 1),
    ]


def test_char_entropy_bounds_and_known_values(spark):
    """H(single char)=0; H(uniform over 4 chars)=2 bits; always within
    [0, log2(n_unique)]."""
    import math

    from aws_etl_fiap_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "aabb")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["n_unique_chars"] == 1
    assert abs(got[2]["entropy"] - 2.0) < 1e-12
    assert abs(got[3]["entropy"] - 1.0) < 1e-12
    for r in got.values():
        assert -1e-12 <= r["entropy"] <= math.log2(r["n_unique_chars"]) + 1e-12


def test_histogram_clamps_edges_and_conserves_mass(spark):
    """Out-of-range values clamp to the edge buckets; counts sum to the
    non-null row count; per-bucket min/max stay inside the clamp."""
    from aws_etl_fiap_spark.operators.aggregates import equi_width_histogram

    vals = [(-5.0,), (0.0,), (9.99,), (10.0,), (55.0,), (99.0,), (150.0,), (None,)]
    df = spark.createDataFrame(vals, "x double")
    hist = equi_width_histogram(df, "x", 0.0, 100.0, 10).collect()
    by_bucket = {r["bucket"]: r for r in hist}
    assert set(by_bucket) == {0, 1, 5, 9}
    assert by_bucket[0]["n_rows"] == 3          # -5 clamps into bucket 0
    assert by_bucket[9]["n_rows"] == 2          # 99 and the 150 clamp
    assert sum(r["n_rows"] for r in hist) == 7  # null dropped
    assert by_bucket[9]["max_value"] == 150.0   # true max survives the clamp


def test_bm25_single_doc_matches_closed_form(spark):
    """One matching doc, one term: score reduces to the closed-form BM25
    with df=1 over the 2-doc corpus."""
    import math

    from aws_etl_fiap_spark.operators.text import BM25_B, BM25_K1, bm25_scores

    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "other text here")], "doc_id long, text string"
    )
    rows = bm25_scores(df, ("hello",)).collect()
    assert [r["doc_id"] for r in rows] == [1]
    n_docs, avgdl, dl, tf, dfreq = 2, 3.0, 3, 2, 1
    idf = math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
    expect = idf * (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl))
    )
    assert abs(rows[0]["bm25"] - expect) < 1e-12


def test_scd2_null_state_transitions_are_changes(spark):
    """IS DISTINCT FROM semantics: entering / leaving a null state opens a
    new version; consecutive nulls collapse."""
    from aws_etl_fiap_spark.operators.windows import scd2_collapse

    rows = [
        (1, "A", "2024-01-01 00:00:00", 1),
        (1, None, "2024-01-02 00:00:00", 2),
        (1, None, "2024-01-03 00:00:00", 3),  # collapses into version 2
        (1, "A", "2024-01-04 00:00:00", 4),
    ]
    df = spark.createDataFrame(rows, "user_id long, state string, ts string, event_id long")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = sorted(
        (r["version"], r["state"]) for r in
        scd2_collapse(df, "user_id", "state", "ts", "event_id").collect()
    )
    assert out == [(1, "A"), (2, None), (3, "A")]


def test_tfidf_top_terms_hand_computed(spark):
    """3-doc corpus with a shared stopword: the doc-specific term must
    outrank the ubiquitous one (idf of a term in all docs is exactly 1.0
    after smoothing's +1, and tf*1 < tf*(ln(2)+1) here)."""
    import math

    from aws_etl_fiap_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "the cat the cat the"), (2, "the dog"), (3, "the bird bird")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.term): (r.tf, r.tfidf, r.rnk)
        for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    }
    # doc 1: 'cat' tf=2 idf=ln(4/2)+1; 'the' tf=3 idf=ln(4/4)+1=1.0
    cat = math.floor(2 * (math.log(2.0) + 1.0) * 1e6 + 0.5) / 1e6
    assert rows[(1, "cat")][2] == 1 and abs(rows[(1, "cat")][1] - cat) < 1e-9
    assert rows[(1, "the")] == (3, 3.0, 2)
    # doc 3: 'bird' (tf=2, doc-specific) outranks 'the' (tf=1)
    assert rows[(3, "bird")][2] == 1 and rows[(3, "the")][2] == 2


# --------------------------------------------------- gopher rules --


def test_gopher_rules_signature_and_keep(spark):
    import pyspark.sql.functions as F

    from aws_etl_fiap_spark.operators.text import gopher_quality_rules

    rows = [
        # long, good word-length, has stopwords, varied -> keeps
        (1, " ".join(["the"] + [f"w{i:03d}" for i in range(40)])),
        # short word soup, no stopwords, repetitive
        (2, "spam spam spam spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality_rules(df).collect()}
    assert got[1]["keep"] is True and got[1]["failed"] == ""
    assert got[2]["keep"] is False
    assert set(got[2]["failed"].split(",")) == {
        "few_stop", "repetitive", "short",
    }


def test_gopher_rules_failed_order_is_sorted(spark):
    from aws_etl_fiap_spark.operators.text import gopher_quality_rules

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    (r,) = gopher_quality_rules(df).collect()
    parts = r["failed"].split(",")
    assert parts == sorted(parts)


def test_gopher_rules_is_projection_only(spark, sf_smoke):
    from aws_etl_fiap_spark.operators.text import gopher_quality_rules
    from aws_etl_fiap_spark.sources.readers import load_table

    df = gopher_quality_rules(load_table(spark, sf_smoke, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_redact_pii_leaves_numeric_prose_alone(spark):
    """Late-r9 review: a space inside the phone character class made any
    run of space-separated numbers totaling >= 8 chars collapse into one
    <PHONE>, destroying numeric training text."""
    from aws_etl_fiap_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "scores were 10 20 30 overall"),
            (2, "in 2020 2021 we shipped"),
            (3, "revenue 1 000 000 USD"),
            (4, "call 555-010-9999 today"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    for i in (1, 2, 3):
        assert rows[i]["n_phone"] == 0 and "<PHONE>" not in rows[i]["redacted"]
    assert rows[4]["n_phone"] == 1
    assert rows[4]["redacted"] == "call <PHONE> today"


def test_chunk_documents_no_redundant_final_chunk(spark):
    """Late-r9 review: a stride start inside the final overlap window
    emitted a chunk that was a strict SUBSET of the previous one
    (64 tokens / 64-16 chunking yielded chunk 0 = tokens 1-64 AND
    chunk 1 = tokens 49-64), duplicating training data."""
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.text import chunk_documents

    text64 = " ".join(f"w{i}" for i in range(64))
    text70 = " ".join(f"w{i}" for i in range(70))
    df = spark.createDataFrame(
        [(1, text64), (2, text70), (3, "a b")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=64, overlap=16)
    got = {
        (r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"] for r in out.collect()
    }
    assert got == {
        (1, 0): 64,           # exactly one chunk: start 48 would re-emit 49-64
        (2, 0): 64, (2, 1): 22,  # second chunk adds tokens 65-70 (6 new)
        (3, 0): 2,            # short doc yields itself
    }
    # every token of doc 2 is covered (nothing skipped)
    covered = (
        out.filter(F.col("doc_id") == 2)
        .select(F.explode(F.split("chunk", " ")).alias("w"))
        .distinct()
        .count()
    )
    assert covered == 70
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=64, overlap=-10)


def test_lang_id_zero_evidence_is_null(spark):
    """Late-r9 review: documents with zero stopword hits in every language
    were systematically labeled 'en' (the tie-break's first entry)."""
    from aws_etl_fiap_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [(1, "zzz qqq xxx"), (2, "the cat of the hat")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df, "text").collect()}
    assert got[1] is None and got[2] == "en"


def test_fingerprint_empty_text_is_zero_not_null(spark):
    """Late-r9 review: sequence(1, 0) descends for empty text, null-padding
    the zip_with and returning NULL — grouping merged empty docs with
    null-fingerprint docs."""
    from aws_etl_fiap_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", fingerprint("text").alias("fp")
    ).collect()}
    assert got[1] == 0 and got[2] is None
    assert got[3] == 1 * 97 + 2 * 98


def test_kn_bigram_discount_clamp_keeps_nll_finite(spark):
    """Late-r9 review: discount >= min_bigram_count pushed the discounted
    term negative and, when it outweighed the continuation mass, handed ln
    a negative argument (NaN avg_nll); the docstring's max(c-d, 0) clamp
    is now real."""
    import math

    from aws_etl_fiap_spark.operators.text import kn_bigram_nll

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y")], "doc_id long, text string"
    )
    rows = kn_bigram_nll(df, min_bigram_count=1, discount=1.5).collect()
    assert rows and all(
        r["avg_nll"] is not None and math.isfinite(r["avg_nll"]) and r["avg_nll"] > 0
        for r in rows
    )


def test_bigram_lm_families_match_python_models_property(spark):
    """Property (r10): the three bigram-LM families — Kneser-Ney,
    stupid-backoff NLL, and PMI — equal brute-force Python models on
    ARBITRARY corpora INCLUDING multi-/leading-space text: empty tokens
    must not mint '' unigrams or ('w','') bigrams (the r10 _lm_tokens fix;
    query and oracle previously AGREED on the garbage — only a model
    catches that class)."""
    import math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.text import (
        bigram_pmi,
        bigram_lm_nll,
        kn_bigram_nll,
    )

    word = st.sampled_from(["a", "b", "ab", "ba"])
    sep = st.sampled_from([" ", "  ", " a ", "   "])
    doc = st.lists(word, min_size=2, max_size=6).flatmap(
        lambda ws: sep.map(lambda s: s.join(ws))
    )

    def toks(text):
        return [t for t in text.split(" ") if t]

    def models(docs):
        db = []
        for i, d in enumerate(docs):
            t = toks(d)
            db += [(i, t[j], t[j + 1]) for j in range(len(t) - 1)]
        uc = Counter(w for d in docs for w in toks(d))
        n_tok = sum(uc.values())
        types = Counter((a, b) for _, a, b in db)
        kept = {p: c for p, c in types.items() if c >= 2}
        # stupid backoff
        bo = {}
        for i, _ in enumerate(docs):
            inst = [(a, b) for (j, a, b) in db if j == i]
            if not inst:
                continue
            nlls = [
                -math.log(kept[(a, b)] / uc[a])
                if (a, b) in kept
                else -math.log(0.4 * uc[b] / n_tok)
                for a, b in inst
            ]
            bo[i] = (len(inst), sum(nlls) / len(inst))
        # Kneser-Ney
        ctx = Counter()
        n_follow = Counter()
        n_precede = Counter()
        for (a, b), c in types.items():
            ctx[a] += c
            n_follow[a] += 1
            n_precede[b] += 1
        B = len(types)
        kn = {}
        for i, _ in enumerate(docs):
            inst = [(a, b) for (j, a, b) in db if j == i]
            if not inst:
                continue
            nlls = []
            for a, b in inst:
                seen = (
                    max(kept[(a, b)] - 0.75, 0.0) / ctx[a] if (a, b) in kept else 0.0
                )
                cont = (0.75 * n_follow[a] / ctx[a]) * n_precede[b] / B
                nlls.append(-math.log(seen + cont))
            kn[i] = (len(inst), sum(nlls) / len(inst))
        # PMI over all bigrams (floor 1 so tiny corpora emit rows)
        n_bi = len(db)
        pmi = {
            (a, b): math.log((c / n_bi) / ((uc[a] / n_tok) * (uc[b] / n_tok)))
            for (a, b), c in types.items()
        }
        return bo, kn, pmi

    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=3))
    def prop(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        bo_want, kn_want, pmi_want = models(docs)

        got_bo = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
            for r in bigram_lm_nll(df).collect()
        }
        assert set(got_bo) == set(bo_want)
        for i, (n, nll) in bo_want.items():
            assert got_bo[i][0] == n and abs(got_bo[i][1] - nll) < 1e-9, docs[i]

        got_kn = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
            for r in kn_bigram_nll(df).collect()
        }
        assert set(got_kn) == set(kn_want)
        for i, (n, nll) in kn_want.items():
            assert got_kn[i][0] == n and abs(got_kn[i][1] - nll) < 1e-9, docs[i]

        got_pmi = {
            (r["w1"], r["w2"]): (r["c_ab"], r["pmi"])
            for r in bigram_pmi(df, min_count=1).collect()
        }
        assert set(got_pmi) == set(pmi_want)
        for p, v in pmi_want.items():
            assert abs(got_pmi[p][1] - v) < 1e-9, p

    prop()


def test_bm25_matches_python_model_property(spark):
    """Property (r10): BM25 over arbitrary corpora equals the textbook
    Python model — idf ln(1+(N-df+.5)/(df+.5)), tf saturation with the
    dl/avgdl length normalization (dl = raw split size, the module's
    documented token-count convention)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.text import BM25_B, BM25_K1, bm25_scores

    word = st.sampled_from(["a", "b", "c", "dd"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)
    TERMS = ("a", "b")

    def model(docs):
        dls = {i: len(d.split(" ")) for i, d in enumerate(docs)}
        n, avgdl = len(docs), sum(dls.values()) / len(docs)
        tf = {
            (i, t): d.split(" ").count(t)
            for i, d in enumerate(docs)
            for t in TERMS
            if t in d.split(" ")
        }
        dfreq = {t: sum(1 for (_, t2) in tf if t2 == t) for t in TERMS}
        out = {}
        for (i, t), f in tf.items():
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            den = f + BM25_K1 * (1.0 - BM25_B + BM25_B * dls[i] / avgdl)
            out[i] = out.get(i, 0.0) + idf * f * (BM25_K1 + 1.0) / den
        return out

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def prop(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        got = {
            r["doc_id"]: r["bm25"] for r in bm25_scores(df, TERMS).collect()
        }
        want = model(docs)
        assert set(got) == set(want)
        for i, v in want.items():
            assert abs(got[i] - v) < 1e-9, (docs[i], got[i], v)

    prop()


def test_chunk_documents_matches_python_model_property(spark):
    """Property (r10): chunk_documents equals the Python slicing model for
    arbitrary doc lengths and (chunk, overlap) shapes — full coverage (every
    token in some chunk), stride spacing, no redundant final chunk (the r9
    fix), short docs yield themselves."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.text import chunk_documents

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=40), min_size=1, max_size=4
        ),  # doc lengths in tokens (0 = empty-ish single token)
        st.sampled_from([(8, 0), (8, 2), (8, 7), (5, 1), (3, 0)]),
    )
    def prop(lengths, shape):
        chunk, overlap = shape
        stride = chunk - overlap
        docs = [
            (i, " ".join(f"t{j}" for j in range(max(n, 1))))
            for i, n in enumerate(lengths)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_id"], r["chunk_idx"], r["chunk"])
            for r in chunk_documents(
                df, chunk_tokens=chunk, overlap=overlap
            ).collect()
        }
        want = set()
        for i, text in docs:
            toks = text.split(" ")
            last_start = max(len(toks) - overlap - 1, 0)
            starts = list(range(0, last_start + 1, stride))
            for s in starts:
                want.add((i, s // stride, " ".join(toks[s : s + chunk])))
        assert got == want
        # coverage: every token index falls inside some chunk window
        for i, text in docs:
            n = len(text.split(" "))
            covered = set()
            for s in range(0, max(n - overlap - 1, 0) + 1, stride):
                covered |= set(range(s, min(s + chunk, n)))
            assert covered == set(range(n))

    prop()


def test_tfidf_top_terms_matches_python_model_property(spark):
    """Property (r10): per-doc TF-IDF top-k (sklearn smooth_idf form,
    6dp-rounded scores, term tie-break) equals the Python model on
    arbitrary corpora — ranks, scores, AND the exact cut at k."""
    import math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.text import tfidf_top_terms

    word = st.sampled_from(["u", "v", "w", "uu", "vv"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)
    K = 2

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def model(docs):
        n = len(docs)
        tfs = {i: Counter(d.split(" ")) for i, d in enumerate(docs)}
        dfreq = Counter(t for tf in tfs.values() for t in tf)
        out = set()
        for i, tf in tfs.items():
            scored = sorted(
                (
                    (-r6(c * (math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0)), t, c)
                    for t, c in tf.items()
                ),
            )
            for rnk, (neg, t, c) in enumerate(scored[:K], start=1):
                out.add((i, t, c, -neg, rnk))
        return out

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def prop(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        got = {
            (r["doc_id"], r["term"], r["tf"], r["tfidf"], r["rnk"])
            for r in tfidf_top_terms(df, k=K).collect()
        }
        assert got == model(docs)

    prop()


def test_repetition_stats_matches_python_model_property(spark):
    """Property (r10): the in-row repetition signals (distinct ratio, top
    token mass, top bigram mass) equal the Counter model on arbitrary
    docs — including single-token documents (the ANSI descending-sequence
    guard path) and fully-repeated text."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.text import repetition_stats

    word = st.sampled_from(["e", "f", "ee"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def prop(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["distinct_ratio"],
                r["top_token_frac"],
                r["top_bigram_frac"],
            )
            for r in repetition_stats(df, "text").collect()
        }
        for i, d in enumerate(docs):
            t = d.split(" ")
            n = len(t)
            bg = [f"{a} {b}" for a, b in zip(t, t[1:])]
            want = (
                n,
                len(set(t)) / n,
                max(Counter(t).values()) / n,
                max(Counter(bg).values()) / (n - 1) if n >= 2 else None,
            )
            g = got[i]
            assert g[0] == want[0]
            assert abs(g[1] - want[1]) < 1e-12 and abs(g[2] - want[2]) < 1e-12
            if want[3] is None:
                assert g[3] is None
            else:
                assert abs(g[3] - want[3]) < 1e-12

    prop()


def test_char_entropy_and_quality_score_match_models_property(spark):
    """Property (r10): char_entropy equals the Shannon model (bits) and
    quality_score the documented three-term formula, on arbitrary text
    including one-character and all-same-character documents."""
    import math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.text import (
        LID_STOPWORDS,
        char_entropy,
        quality_score,
    )

    word = st.sampled_from(["the", "of", "zz", "q", "banana"])
    doc = st.lists(word, min_size=1, max_size=10).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def prop(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        got_e = {
            r["doc_id"]: (r["n_unique_chars"], r["entropy"])
            for r in char_entropy(df).collect()
        }
        for i, d in enumerate(docs):
            cnt = Counter(d)
            n = len(d)
            want_h = -sum(
                (c / n) * math.log2(c / n) for c in cnt.values()
            )
            assert got_e[i][0] == len(cnt)
            assert abs(got_e[i][1] - want_h) < 1e-9, d

        got_q = {
            r["doc_id"]: r["quality"]
            for r in quality_score(df, "text").collect()
        }
        en = set(LID_STOPWORDS["en"])
        for i, d in enumerate(docs):
            toks = d.split(" ")
            n = len(toks)
            stop = sum(1 for t in toks if t in en) / n
            avg = len(d.replace(" ", "")) / n
            want = (
                min(n / 100.0, 1.0) * 0.4
                + min(stop * 5.0, 1.0) * 0.4
                + (0.2 if 3.0 <= avg <= 12.0 else 0.0)
            )
            assert abs(got_q[i] - want) < 1e-12, d

    prop()


def test_funnel_conversion_matches_python_model_property(spark, tmp_path):
    """Property (r10): the 3-stage ordered funnel (first qualifying event
    STRICTLY AFTER the previous stage) equals a brute-force Python fold on
    arbitrary tiny event logs — timestamp TIES across stages (a click at
    exactly view_ts must NOT count), duplicate events, stage skips, users
    with no view (absent from the result)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.queries.quality_q import events_funnel_conversion

    base = dt.datetime(2024, 1, 1)
    ev = st.tuples(
        st.integers(min_value=1, max_value=3),                      # user_id
        st.sampled_from(["view", "click", "purchase", "other"]),    # type
        st.integers(min_value=0, max_value=6),                      # ts offset
    )

    def model(events):
        out = {}
        for uid in {u for u, _, _ in events}:
            mine = [(t, k) for u, k, t in events if u == uid]
            views = [t for t, k in mine if k == "view"]
            if not views:
                continue
            view_ts = min(views)
            clicks = [t for t, k in mine if k == "click" and t > view_ts]
            click_ts = min(clicks) if clicks else None
            purchase_ts = None
            if click_ts is not None:
                buys = [t for t, k in mine if k == "purchase" and t > click_ts]
                purchase_ts = min(buys) if buys else None
            stage = 3 if purchase_ts is not None else 2 if click_ts else 1
            out[uid] = (
                base + dt.timedelta(seconds=view_ts),
                None if click_ts is None else base + dt.timedelta(seconds=click_ts),
                None if purchase_ts is None else base + dt.timedelta(seconds=purchase_ts),
                stage,
            )
        return out

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=12))
    def prop(events):
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(events)), pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(seconds=t) for _, _, t in events],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _, _ in events], pa.int64()),
                "event_type": pa.array([k for _, k, _ in events]),
                "value": pa.array([1.0] * len(events), pa.float64()),
                "props": pa.array(["{}"] * len(events)),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        got = {
            r.user_id: (r.view_ts, r.click_ts, r.purchase_ts, r.reached_stage)
            for r in events_funnel_conversion(spark, str(tmp_path)).collect()
        }
        assert got == model(events)

    prop()


def test_session_window_matches_python_model_property(spark, tmp_path):
    """Property (r10): F.session_window gap sessions equal a Python fold —
    the BOUNDARY tie is the point (an event at exactly prev + gap MERGES
    into the session: Spark coalesces touching windows — this property
    falsified the ``>=``-breaks reading the two session oracles encoded),
    plus duplicate timestamps and interleaved users.  3-second gap so ties
    land on integers."""
    import datetime as dt
    from decimal import Decimal

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.events import session_window_agg
    from aws_etl_fiap_spark.sources.readers import load_table
    from aws_etl_fiap_spark.functions.parity import dec_sum

    base = dt.datetime(2024, 1, 1)
    GAP = 3
    ev = st.tuples(
        st.integers(min_value=1, max_value=2),    # user_id
        st.integers(min_value=0, max_value=12),   # ts offset (seconds)
        st.integers(min_value=-9, max_value=9),   # value (as x.5 halves)
    )

    def model(events):
        out = {}
        for uid in {u for u, _, _ in events}:
            mine = sorted((t, v) for u, t, v in events if u == uid)
            sessions, cur = [], [mine[0]]
            for t, v in mine[1:]:
                if t > cur[-1][0] + GAP:
                    sessions.append(cur)
                    cur = []
                cur.append((t, v))
            sessions.append(cur)
            for s in sessions:
                key = (
                    uid,
                    base + dt.timedelta(seconds=s[0][0]),
                    base + dt.timedelta(seconds=s[-1][0] + GAP),
                )
                total = Decimal(sum(v for _, v in s)) / 2
                out[key] = (len(s), Decimal(f"{total:.2f}"))
        return out

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=12))
    def prop(events):
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(events)), pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(seconds=t) for _, t, _ in events],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _, _ in events], pa.int64()),
                "event_type": pa.array(["view"] * len(events)),
                "value": pa.array([v / 2 for _, _, v in events], pa.float64()),
                "props": pa.array(["{}"] * len(events)),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        df = session_window_agg(
            load_table(spark, str(tmp_path), "events"),
            "ts",
            f"{GAP} seconds",
            keys=["user_id"],
            aggs=[
                F.count(F.lit(1)).alias("n_events"),
                dec_sum("value", 2).alias("total_value"),
            ],
        )
        got = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
            for r in df.collect()
        }
        assert got == model(events)

    prop()


def test_gapfill_ffill_matches_python_model_property(spark, tmp_path):
    """Property (r10): dense-spine gap-fill + forward-fill equals a Python
    fold — zero-filled counts on generated gap buckets, ffill across MULTI-
    bucket gaps, all-NULL buckets (dec_sum -> NULL) that must INHERIT the
    previous value, and a leading all-NULL bucket whose ffill stays NULL."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.queries.quality_q import timeseries_gapfill_ffill

    base = dt.datetime(2024, 1, 1)
    ev = st.tuples(
        st.sampled_from(["a", "b"]),             # event_type
        st.integers(min_value=0, max_value=9),   # bucket index (10-min each)
        st.one_of(st.none(), st.integers(min_value=-8, max_value=8)),  # halves
    )

    def model(events):
        out = {}
        for et in {e for e, _, _ in events}:
            mine = [(b, v) for e, b, v in events if e == et]
            buckets = sorted({b for b, _ in mine})
            carry = None
            for b in range(buckets[0], buckets[-1] + 1):
                here = [v for bb, v in mine if bb == b]
                vals = [v for v in here if v is not None]
                if vals:
                    carry = float(sum(vals)) / 2
                out[(et, base + dt.timedelta(minutes=10 * b))] = (
                    len(here),
                    carry,
                )
        return out

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=14))
    def prop(events):
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(events)), pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=10 * b) for _, b, _ in events],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(events), pa.int64()),
                "event_type": pa.array([e for e, _, _ in events]),
                "value": pa.array(
                    [None if v is None else v / 2 for _, _, v in events],
                    pa.float64(),
                ),
                "props": pa.array(["{}"] * len(events)),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        got = {
            (r.event_type, r.bucket): (r.n_events, r.ffill_value)
            for r in timeseries_gapfill_ffill(spark, str(tmp_path)).collect()
        }
        assert got == model(events)

    prop()


def _events_table(rows):
    """pyarrow events table from (event_id, ts, user_id, event_type, value)."""
    import pyarrow as pa

    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


def test_cohort_retention_matches_python_model_property(spark, tmp_path):
    """Property (r10): the retention triangle (cohort = first-activity week,
    distinct actives per week offset) equals a Python fold — Monday week
    boundaries (a Sunday event belongs to the PREVIOUS Monday's week),
    multi-event weeks counted once, gap weeks absent."""
    import datetime as dt

    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.queries.quality_q import events_cohort_retention

    base = dt.datetime(2024, 1, 1)  # a Monday
    ev = st.tuples(
        st.integers(min_value=1, max_value=3),    # user_id
        st.integers(min_value=0, max_value=27),   # day offset (4 weeks)
    )

    def model(events):
        def week(day):
            d = (base + dt.timedelta(days=day)).date()
            return d - dt.timedelta(days=d.weekday())

        out = {}
        firsts = {}
        for u, day in events:
            w = week(day)
            firsts[u] = min(firsts.get(u, w), w)
        for u, day in set(events):
            w = week(day)
            key = (firsts[u], (w - firsts[u]).days // 7)
            out.setdefault(key, set()).add(u)
        return {k: len(v) for k, v in out.items()}

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=15))
    def prop(events):
        rows = [
            (i, base + dt.timedelta(days=day, hours=i % 24), u, "view", 1.0)
            for i, (u, day) in enumerate(events)
        ]
        pq.write_table(_events_table(rows), str(tmp_path / "events.parquet"))
        got = {
            (r.cohort_week, r.week_offset): r.n_users
            for r in events_cohort_retention(spark, str(tmp_path)).collect()
        }
        assert got == model(events)

    prop()


def test_rolling_wau_matches_python_model_property(spark, tmp_path):
    """Property (r10): rolling 7-day distinct actives via the explode +
    calendar-semi-join scheme equals the brute-force Python count over
    [day-6, day] — output restricted to OBSERVED days, users active on
    several window days counted once, sparse calendars with gaps."""
    import datetime as dt

    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.queries.stats_q import events_rolling_wau_7d

    base = dt.datetime(2024, 1, 1)
    ev = st.tuples(
        st.integers(min_value=1, max_value=4),    # user_id
        st.integers(min_value=0, max_value=13),   # day offset
    )

    def model(events):
        active = {(u, d) for u, d in events}
        days = sorted({d for _, d in active})
        return {
            (base + dt.timedelta(days=d)).date(): len(
                {u for u, ad in active if d - 6 <= ad <= d}
            )
            for d in days
        }

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=15))
    def prop(events):
        rows = [
            (i, base + dt.timedelta(days=d, minutes=i), u, "view", 1.0)
            for i, (u, d) in enumerate(events)
        ]
        pq.write_table(_events_table(rows), str(tmp_path / "events.parquet"))
        got = {
            r.day: r.wau
            for r in events_rolling_wau_7d(spark, str(tmp_path)).collect()
        }
        assert got == model(events)

    prop()


def test_quantile_outliers_matches_python_model_property(spark, tmp_path):
    """Property (r10): PERCENTILE_DISC quartiles + Tukey fences equal the
    textbook discrete-quantile model (smallest element with cumulative
    fraction >= p) — heavy ties, single-element groups (IQR 0: everything
    inside the fences), NULL values skipped by the quantile but still
    counted in n_events."""
    import datetime as dt
    import math

    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.queries.quality_q import events_quantile_outliers

    base = dt.datetime(2024, 1, 1)
    ev = st.tuples(
        st.sampled_from(["a", "b"]),
        st.one_of(st.none(), st.integers(min_value=-40, max_value=40)),
    )

    def disc(vals, p):
        return vals[math.ceil(p * len(vals)) - 1] if vals else None

    def model(events):
        out = {}
        for et in {e for e, _ in events}:
            raw = [v for e, v in events if e == et]
            vals = sorted(v / 2 for v in raw if v is not None)
            q1, q3 = disc(vals, 0.25), disc(vals, 0.75)
            if q1 is None:
                out[(et, None, None)] = (len(raw), 0, 0)
                continue
            low, high = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
            out[(et, q1, q3)] = (
                len(raw),
                sum(1 for v in vals if v < low),
                sum(1 for v in vals if v > high),
            )
        return out

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=16))
    def prop(events):
        rows = [
            (i, base + dt.timedelta(minutes=i), 1, et,
             None if v is None else v / 2)
            for i, (et, v) in enumerate(events)
        ]
        pq.write_table(_events_table(rows), str(tmp_path / "events.parquet"))
        got = {
            (r.event_type, r.q1, r.q3): (
                r.n_events, r.n_low_outliers, r.n_high_outliers
            )
            for r in events_quantile_outliers(spark, str(tmp_path)).collect()
        }
        assert got == model(events)

    prop()


def test_interval_overlap_promo_matches_python_model_property(spark, tmp_path):
    """Property (r10): the day-binned interval-overlap join equals a Python
    fold — sessions spanning midnight meet BOTH days' promo windows, a
    session touching a window edge exactly (12:00 or 14:00) is a candidate
    with zero overlap (strict > for n_overlapping), and single-event
    sessions have zero-length intervals.  Offsets are biased onto the
    12:00/14:00 edges so the tie cases actually generate."""
    import datetime as dt

    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.queries.joins_q import join_interval_overlap_promo

    base = dt.datetime(2024, 1, 1)
    minute = st.one_of(
        st.integers(min_value=0, max_value=2879),
        st.sampled_from([719, 720, 721, 839, 840, 841, 2159, 2160, 2280]),
    )
    ev = st.tuples(st.integers(min_value=1, max_value=2), minute)

    def model(events):
        sessions = []
        for uid in {u for u, _ in events}:
            ts = sorted(m for u, m in events if u == uid)
            cur = [ts[0]]
            for t in ts[1:]:
                if t - cur[-1] > 30:
                    sessions.append((cur[0], cur[-1]))
                    cur = []
                cur.append(t)
            sessions.append((cur[0], cur[-1]))
        days = sorted({m // 1440 for _, m in events})
        out = {}
        for d in days:
            wstart, wend = d * 1440 + 720, d * 1440 + 840
            cands = [
                (s, e)
                for s, e in sessions
                if s // 1440 <= d <= e // 1440
            ]
            overlaps = [
                max(0, (min(e, wend) - max(s, wstart)) * 60_000_000)
                for s, e in cands
            ]
            out[(base + dt.timedelta(days=d)).date()] = (
                len(cands),
                sum(1 for o in overlaps if o > 0),
                sum(overlaps) if cands else None,
            )
        return {k: v for k, v in out.items() if v[0] > 0}

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=14))
    def prop(events):
        # Distinct (user, minute): duplicate timestamps inside one user
        # collapse to one event anyway for interval purposes, but keep them
        # unique so the model's session fold stays order-free.
        events = sorted(set(events))
        rows = [
            (i, base + dt.timedelta(minutes=m), u, "view", 1.0)
            for i, (u, m) in enumerate(events)
        ]
        pq.write_table(_events_table(rows), str(tmp_path / "events.parquet"))
        got = {
            r.promo_day: (
                r.n_candidate_sessions,
                r.n_overlapping,
                r.total_overlap_us,
            )
            for r in join_interval_overlap_promo(spark, str(tmp_path)).collect()
        }
        assert got == model(events)

    prop()


def test_tumbling_and_sliding_windows_match_python_model_property(spark):
    """Property (r10): F.window assignment equals the arithmetic model —
    windows are [start, end): an event at EXACTLY a boundary belongs to
    the window that STARTS there, never the one that ends there; sliding
    windows hold each event in exactly duration/slide windows.  4s/2s
    windows over integer-second events make boundary ties common."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.events import (
        sliding_window_agg,
        tumbling_window_agg,
    )

    base = dt.datetime(2024, 1, 1)
    ev = st.integers(min_value=0, max_value=12)  # seconds; ties likely

    def t(s):
        return base + dt.timedelta(seconds=s)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=14))
    def prop(secs):
        df = spark.createDataFrame(
            [(t(s),) for s in secs], "ts timestamp_ntz"
        )
        got_t = {
            (r.window_start, r.window_end): r.n
            for r in tumbling_window_agg(
                df, "ts", "4 seconds", keys=[],
                aggs=[F.count(F.lit(1)).alias("n")],
            ).collect()
        }
        want_t = {}
        for s in secs:
            w0 = (s // 4) * 4
            key = (t(w0), t(w0 + 4))
            want_t[key] = want_t.get(key, 0) + 1
        assert got_t == want_t

        got_s = {
            (r.window_start, r.window_end): r.n
            for r in sliding_window_agg(
                df, "ts", "4 seconds", "2 seconds", keys=[],
                aggs=[F.count(F.lit(1)).alias("n")],
            ).collect()
        }
        want_s = {}
        for s in secs:
            for w0 in ((s // 2) * 2, (s // 2) * 2 - 2):
                if w0 <= s < w0 + 4:
                    key = (t(w0), t(w0 + 4))
                    want_s[key] = want_s.get(key, 0) + 1
        assert got_s == want_s

    prop()


def test_topk_with_other_matches_python_model_property(spark, tmp_path):
    """Property (r10): the top-k-plus-other rollup equals a Python fold
    under the deterministic (count DESC, source ASC) tiebreak — COUNT TIES
    at the k boundary must resolve alphabetically, a source literally
    named 'other' merges into the tail bucket, and languages with <= k
    sources have no 'other' row."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.queries.analytics2_q import (
        text_top_sources_with_other,
    )

    doc = st.tuples(
        st.sampled_from(["en", "pt"]),
        st.sampled_from(["s1", "s2", "s3", "other"]),
    )

    def model(docs):
        grid = {}
        for lang, src in docs:
            grid[(lang, src)] = grid.get((lang, src), 0) + 1
        out = {}
        for lang in {l for l, _ in docs}:
            ranked = sorted(
                ((s, n) for (l, s), n in grid.items() if l == lang),
                key=lambda x: (-x[1], x[0]),
            )
            for i, (s, n) in enumerate(ranked):
                label = s if i < 2 else "other"
                out[(lang, label)] = out.get((lang, label), 0) + n
        return out

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=14))
    def prop(docs):
        pq.write_table(
            pa.table(
                {
                    "lang": pa.array([l for l, _ in docs]),
                    "source": pa.array([s for _, s in docs]),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = {
            (r.lang, r.source_label): r.n_docs
            for r in text_top_sources_with_other(spark, str(tmp_path)).collect()
        }
        assert got == model(docs)

    prop()


def test_column_profile_matches_python_model_property(spark):
    """Property (r10): the one-scan Expand profiler equals the Python
    fold — n_distinct excludes NULL (SQL COUNT(DISTINCT)), all-NULL
    columns profile (n, n, 0), constant columns (distinct 1)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.cleaning import column_profile

    cell = st.one_of(st.none(), st.integers(0, 3))

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.tuples(cell, cell, cell), min_size=1, max_size=12))
    def prop(rows):
        df = spark.createDataFrame(rows, "a int, b int, c int")
        got = {
            r.column_name: (r.n_rows, r.n_nulls, r.n_distinct)
            for r in column_profile(df, ["a", "b", "c"]).collect()
        }
        want = {}
        for i, name in enumerate(["a", "b", "c"]):
            col = [r[i] for r in rows]
            want[name] = (
                len(col),
                sum(1 for v in col if v is None),
                len({v for v in col if v is not None}),
            )
        assert got == want

    prop()


def test_equi_width_histogram_matches_python_model_property(spark):
    """Property (r10): the explicit floor-arithmetic bucketing equals the
    Python model bit-for-bit — values exactly AT bucket edges (floor puts
    them in the upper bucket), below-lo and at/above-hi clamping into the
    end buckets, NULLs excluded, exact decimal sums."""
    import math
    from decimal import Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.aggregates import equi_width_histogram

    LO, HI, NB = 0.0, 8.0, 4  # width 2.0: halves land exactly on edges
    val = st.one_of(st.none(), st.integers(-8, 24).map(lambda c: c / 2.0))

    @settings(max_examples=6, deadline=None)
    @given(st.lists(val, min_size=1, max_size=16))
    def prop(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {
            r.bucket: (r.n_rows, Decimal(f"{r.sum_value:.2f}"),
                       r.min_value, r.max_value, r.bucket_lo, r.bucket_hi)
            for r in equi_width_histogram(df, "x", LO, HI, NB).collect()
        }
        width = (HI - LO) / NB
        want = {}
        for v in vals:
            if v is None:
                continue
            b = min(NB - 1, max(0, math.floor((v - LO) / width)))
            n, s, mn, mx = want.get(b, (0, Decimal(0), None, None))
            want[b] = (
                n + 1,
                s + Decimal(f"{v:.2f}"),
                v if mn is None else min(mn, v),
                v if mx is None else max(mx, v),
            )
        want = {
            b: (n, Decimal(f"{s:.2f}"), mn, mx,
                LO + b * width, LO + (b + 1) * width)
            for b, (n, s, mn, mx) in want.items()
        }
        assert got == want

    prop()


def test_token_count_family_matches_python_models_property(spark):
    """Property (r10): the two token counters equal their Python models —
    whitespace split counts separators+1 (the documented raw form), the
    BPE-ish alnum-run counter drops empty edge strings so leading/trailing
    punctuation does not inflate the count."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.text import token_count, word_token_count

    text = st.text(alphabet=" ab1.,-", min_size=0, max_size=16)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(text, min_size=1, max_size=10))
    def prop(texts):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "i int, t string")
        got = {
            r.i: (r.tc, r.wc)
            for r in df.select(
                "i",
                token_count("t").alias("tc"),
                word_token_count("t").alias("wc"),
            ).collect()
        }
        want = {
            i: (
                len(t.split(" ")) if t != "" else 1,
                len([w for w in re.split(r"[^a-z0-9A-Z]+", t) if w]),
            )
            for i, t in enumerate(texts)
        }
        assert got == want

    prop()
