"""Inverted text index (operators/textindex.py): build/search correctness
against a direct text predicate, both layouts, and the pruning contract."""

import pyspark.sql.functions as F

from aws_etl_fiap_spark.operators.textindex import (
    build_postings,
    conjunctive_search,
    read_postings_for,
    sql_contains_all_terms,
    write_inverted_index,
)
from aws_etl_fiap_spark.sources.readers import load_table

TERMS = ["spark", "vector", "customer"]


def _direct_hits(docs, terms):
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    cond = F.lit(True)
    for t in terms:
        cond = cond & F.array_contains(toks, t.lower())
    return {r[0] for r in docs.filter(cond).select("doc_id").collect()}


def test_postings_search_equals_direct_predicate(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    hits = conjunctive_search(build_postings(docs), TERMS)
    assert {r[0] for r in hits.collect()} == _direct_hits(docs, TERMS)


def test_postings_are_per_doc_distinct(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    p = build_postings(docs)
    assert p.count() == p.distinct().count()


def test_both_layouts_roundtrip(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    want = _direct_hits(docs, TERMS)
    for layout in ("term", "bucket"):
        path = str(tmp_path / f"idx_{layout}")
        write_inverted_index(docs, path, layout=layout, n_buckets=8)
        postings = read_postings_for(
            spark, path, TERMS, layout=layout, n_buckets=8
        )
        hits = conjunctive_search(postings, TERMS)
        assert {r[0] for r in hits.collect()} == want, layout


def test_bucket_scan_is_partition_pruned(spark, sf_smoke, tmp_path):
    import re

    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path, layout="bucket", n_buckets=16)
    postings = read_postings_for(spark, path, TERMS, "bucket", 16)
    plan = postings._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and re.search(r"bucket#\d+[^\[\]]* IN \(", pf.group(1)), plan
    # and the residual term predicate reaches the parquet reader
    assert "In(term, " in plan


def test_duplicate_and_case_insensitive_terms(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    p = build_postings(docs)
    a = {r[0] for r in conjunctive_search(p, ["Spark", "spark"]).collect()}
    b = {r[0] for r in conjunctive_search(p, ["spark"]).collect()}
    assert a == b


def test_sql_twin_matches_spark_tokenizer(spark, sf_smoke):
    import duckdb

    docs = load_table(spark, sf_smoke, "documents")
    want = _direct_hits(docs, TERMS)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    got = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE "
            + sql_contains_all_terms("text", TERMS)
        ).fetchall()
    }
    assert got == want


def test_empty_term_set_refused():
    """r10 review: 'all of no terms' is ambiguous — refuse loudly on both
    the Spark and SQL-twin sides; and quoted terms render as valid SQL."""
    import pytest as _pytest

    from aws_etl_fiap_spark.operators.textindex import (
        conjunctive_search,
        sql_contains_all_terms,
    )

    with _pytest.raises(ValueError, match="at least one term"):
        conjunctive_search(None, [])
    with _pytest.raises(ValueError, match="at least one term"):
        sql_contains_all_terms("text", [])
    sql = sql_contains_all_terms("text", ["o'brien"])
    assert "'o''brien'" in sql


def test_index_roundtrip_search_matches_python_model_property(spark, tmp_path):
    """Property (r10): build_postings -> bucket-partitioned write ->
    pruned read -> conjunctive_search equals the Python set model (docs
    whose tokenized DISTINCT term set covers the query) on arbitrary tiny
    corpora — mixed-case queries, punctuation separators, digit terms,
    repeated terms in one doc, and query terms absent from the corpus.  A
    wrong bucket id on either the write or the pruned-read side surfaces
    as a lost document."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.textindex import (
        build_postings,
        conjunctive_search,
        read_postings_for,
        write_inverted_index,
    )

    VOCAB = ["ab", "cd", "e1", "fg", "zz"]
    word = st.sampled_from(VOCAB + ["AB", "Cd-cd", "xq"])
    doc = st.lists(word, min_size=0, max_size=5)
    qterm = st.sampled_from(VOCAB + ["AB", "missing"])

    def tokens(text):
        return {t for t in re.split(r"[^a-z0-9]+", text.lower()) if t}

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(doc, min_size=1, max_size=6),
        st.sets(qterm, min_size=1, max_size=3),
    )
    def prop(docs, terms):
        texts = [" ".join(d) for d in docs]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        want = {
            i
            for i, t in enumerate(texts)
            if {q.lower() for q in terms} <= tokens(t)
        }
        # In-memory postings path.
        got = {
            r.doc_id
            for r in conjunctive_search(build_postings(df), terms).collect()
        }
        assert got == want
        # Materialized bucket-partitioned index + pruned read path.
        idx = str(tmp_path / "idx")
        write_inverted_index(df, idx, n_buckets=4)
        got_idx = {
            r.doc_id
            for r in conjunctive_search(
                read_postings_for(spark, idx, sorted(terms), n_buckets=4),
                terms,
            ).collect()
        }
        assert got_idx == want

    prop()


def test_missing_index_path_raises_not_empty(spark, tmp_path):
    """A nonexistent index path is a broken caller, not an empty index:
    PATH_NOT_FOUND must surface instead of being silently read as zero
    postings (ADVICE r10 — the handler is narrowed to
    UNABLE_TO_INFER_SCHEMA, the empty-materialization signature)."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        read_postings_for(spark, str(tmp_path / "no_such_index"), ["spark"])


def test_empty_corpus_index_reads_as_typed_empty(spark, tmp_path):
    """An index materialized from ZERO documents has no parquet footers;
    the read path must treat that one case as a valid empty index with the
    contractual doc_id-long schema."""
    docs = spark.createDataFrame([], "doc_id long, text string")
    idx = str(tmp_path / "empty_idx")
    write_inverted_index(docs, idx, n_buckets=4)
    back = read_postings_for(spark, idx, ["spark"], n_buckets=4)
    assert back.count() == 0
    assert dict(back.dtypes)["doc_id"] == "bigint"


def test_layout_mismatch_raises(spark, sf_smoke, tmp_path):
    """r11 verdict residue: the index DIRECTORY carries its layout (build-
    time sidecar).  A reader passing the wrong layout would prune wrong
    directories / fabricate a frame shape the build never wrote — raise."""
    import pytest

    docs = load_table(spark, sf_smoke, "documents").limit(5)
    term_idx = str(tmp_path / "term_idx")
    write_inverted_index(docs, term_idx, layout="term")
    with pytest.raises(ValueError, match="built with layout 'term'"):
        read_postings_for(spark, term_idx, TERMS, layout="bucket", n_buckets=8)
    bucket_idx = str(tmp_path / "bucket_idx")
    write_inverted_index(docs, bucket_idx, layout="bucket", n_buckets=8)
    with pytest.raises(ValueError, match="built with layout 'bucket'"):
        read_postings_for(spark, bucket_idx, TERMS, layout="term")


def test_bucket_count_mismatch_raises(spark, sf_smoke, tmp_path):
    """A reader with the wrong n_buckets computes DIFFERENT bucket ids
    for the query terms, so partition pruning silently reads the wrong
    directories and drops hits — the sidecar makes that loud."""
    import pytest

    docs = load_table(spark, sf_smoke, "documents").limit(5)
    idx = str(tmp_path / "idx8")
    write_inverted_index(docs, idx, layout="bucket", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets=8.*requested 16"):
        read_postings_for(spark, idx, TERMS, layout="bucket", n_buckets=16)


def test_empty_term_layout_index_never_grows_bucket_column(spark, tmp_path):
    """The r11 residue exactly: an EMPTY term-layout index read with
    layout='bucket' used to fabricate a (doc_id, term, bucket) frame the
    build never wrote.  With the sidecar it raises; read with the RIGHT
    layout, the empty frame has the term-layout schema (no bucket)."""
    import pytest

    docs = spark.createDataFrame([], "doc_id long, text string")
    idx = str(tmp_path / "empty_term_idx")
    write_inverted_index(docs, idx, layout="term")
    with pytest.raises(ValueError, match="built with layout 'term'"):
        read_postings_for(spark, idx, ["spark"], layout="bucket")
    back = read_postings_for(spark, idx, ["spark"], layout="term")
    assert back.count() == 0
    assert set(back.columns) == {"doc_id", "term"}


def test_sidecar_invisible_to_postings_scan(spark, sf_smoke, tmp_path):
    """The sidecar is underscore-prefixed, so Spark's file listing never
    feeds it to the parquet reader — the postings scan result is byte-
    identical to the in-memory build."""
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    idx = str(tmp_path / "idx_sidecar")
    write_inverted_index(docs, idx, layout="bucket", n_buckets=4)
    whole = spark.read.parquet(idx).select("doc_id", "term")
    direct = build_postings(docs)
    assert whole.exceptAll(direct).count() == 0
    assert direct.exceptAll(whole).count() == 0


def test_presidecar_index_keeps_legacy_behavior(spark, sf_smoke, tmp_path):
    """A postings directory WITHOUT a sidecar (hand-built, pre-r12 index)
    keeps the caller-trusting read: no validation, caller args win."""
    import os

    docs = load_table(spark, sf_smoke, "documents").limit(10)
    idx = str(tmp_path / "idx_legacy")
    write_inverted_index(docs, idx, layout="bucket", n_buckets=4)
    os.remove(os.path.join(idx, "_index_meta.json"))
    hits = conjunctive_search(
        read_postings_for(spark, idx, TERMS, layout="bucket", n_buckets=4),
        TERMS,
    )
    assert hits.count() == len(_direct_hits(docs, TERMS))


def test_string_doc_ids_refused_at_build(spark, tmp_path):
    """write_inverted_index enforces the doc_id-long contract loudly: a
    string-id corpus would otherwise materialize an index whose empty-read
    fallback frame is type-mismatched (ADVICE r10)."""
    import pytest

    docs = spark.createDataFrame([("d1", "hello spark")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integral"):
        write_inverted_index(docs, str(tmp_path / "bad_idx"))
