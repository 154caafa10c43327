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


def test_string_doc_ids_roundtrip(spark, tmp_path):
    """String doc-ids (UUIDs, URLs, content hashes — the common real-world
    id type) build, prune, and search exactly like long ids (r12 verdict
    task 3: this used to raise); the sidecar records the id type so the
    empty-read fallback matches what the build wrote."""
    docs = spark.createDataFrame(
        [
            ("doc/a", "spark vector customer"),
            ("doc/b", "spark only here"),
            ("doc/c", "vector customer spark wins"),
        ],
        "doc_id string, text string",
    )
    idx = str(tmp_path / "str_idx")
    write_inverted_index(docs, idx, layout="bucket", n_buckets=4)
    hits = conjunctive_search(
        read_postings_for(spark, idx, TERMS, layout="bucket", n_buckets=4),
        TERMS,
    )
    assert {r.doc_id for r in hits.collect()} == {"doc/a", "doc/c"}
    # Empty string-id corpus: the fallback frame is typed from the sidecar
    # (doc_id string), not the legacy long assumption.
    empty = spark.createDataFrame([], "doc_id string, text string")
    eidx = str(tmp_path / "str_empty_idx")
    write_inverted_index(empty, eidx, n_buckets=4)
    back = read_postings_for(spark, eidx, ["spark"], n_buckets=4)
    assert back.count() == 0
    assert dict(back.dtypes)["doc_id"] == "string"


def test_float_doc_ids_refused_at_build(spark, tmp_path):
    """Non-integral, non-string ids still raise with remediation: an
    equality join on float ids is a correctness trap the index must not
    launder."""
    import pytest

    docs = spark.createDataFrame(
        [(1.5, "hello spark")], "doc_id double, text string"
    )
    with pytest.raises(ValueError, match="integral or string"):
        write_inverted_index(docs, str(tmp_path / "bad_idx"))


def test_sidecar_write_is_atomic_and_corruption_is_typed(
    spark, sf_smoke, tmp_path
):
    """ADVICE r12: the sidecar lands via temp+rename (no .inprogress file
    survives a successful build; rebuilds never expose a half-written
    JSON), and a hand-corrupted sidecar raises a ValueError naming the
    path instead of a raw JSONDecodeError."""
    import os

    import pytest

    docs = load_table(spark, sf_smoke, "documents").limit(10)
    idx = str(tmp_path / "idx_atomic")
    write_inverted_index(docs, idx, layout="bucket", n_buckets=4)
    write_inverted_index(docs, idx, layout="bucket", n_buckets=4)  # rebuild
    assert os.path.exists(os.path.join(idx, "_index_meta.json"))
    assert not os.path.exists(
        os.path.join(idx, "_index_meta.json.inprogress")
    )
    with open(os.path.join(idx, "_index_meta.json"), "w") as fh:
        fh.write('{"layout": "buck')  # truncated mid-write
    # drop Hadoop's checksum twin so the read reaches JSON parsing (a CRC
    # mismatch would already fail loudly on its own)
    crc = os.path.join(idx, "._index_meta.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="corrupt index sidecar.*idx_atomic"):
        read_postings_for(spark, idx, TERMS, layout="bucket", n_buckets=4)


def test_index_lifecycle_rebuild_and_sidecar_upgrade_property(spark, tmp_path):
    """Property (r13, verdict task 4a): the index LIFECYCLE on one
    directory — build, rebuild with different layout/params (STATIC
    overwrite must replace the sidecar with the data, never leave a stale
    one), corpus shrink (ghost postings must not survive), sidecar
    deletion (pre-sidecar legacy dir keeps caller-trusting reads), and
    the upgrade path (a rebuild over a legacy dir restores validation).
    After every step, a search through the CURRENT build params equals
    the Python set model of the CURRENT corpus, and a mismatched-params
    read raises iff a sidecar is present."""
    import os
    import re

    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    VOCAB = ["ab", "cd", "e1", "fg", "zz"]
    doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=4)
    corpus = st.lists(doc, min_size=0, max_size=5)
    layout_cfg = st.sampled_from(
        [("bucket", 4), ("bucket", 8), ("term", 0)]
    )
    step = st.one_of(
        st.tuples(st.just("rebuild"), corpus, layout_cfg),
        st.tuples(st.just("strip_sidecar"), st.none(), st.none()),
    )

    def tokens(text):
        return {t for t in re.split(r"[^a-z0-9]+", text.lower()) if t}

    def model_hits(texts, terms):
        return {
            i for i, t in enumerate(texts) if set(terms) <= tokens(t)
        }

    def search(idx, terms, layout, n_buckets):
        postings = read_postings_for(
            spark, idx, sorted(terms), layout=layout, n_buckets=n_buckets
        )
        return {r.doc_id for r in conjunctive_search(postings, terms).collect()}

    @settings(max_examples=4, deadline=None)
    @given(corpus, layout_cfg, st.lists(step, min_size=1, max_size=3))
    def prop(init_docs, init_cfg, steps):
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="idxlife_")
        idx = tmp + "/idx"
        try:
            texts = [" ".join(d) for d in init_docs]
            layout, n_buckets = init_cfg

            def build(ts, lo, nb):
                df = spark.createDataFrame(
                    list(enumerate(ts)) or [(0, "")],
                    "doc_id long, text string",
                ) if ts else spark.createDataFrame([], "doc_id long, text string")
                write_inverted_index(
                    df, idx, layout=lo, n_buckets=max(nb, 1)
                )

            build(texts, layout, n_buckets)
            has_sidecar = True
            terms = {"ab", "zz"}
            for kind, new_corpus, new_cfg in steps:
                if kind == "strip_sidecar":
                    meta = os.path.join(idx, "_index_meta.json")
                    if os.path.exists(meta):
                        os.remove(meta)
                    has_sidecar = False
                else:
                    texts = [" ".join(d) for d in new_corpus]
                    layout, n_buckets = new_cfg
                    build(texts, layout, n_buckets)
                    has_sidecar = True  # upgrade path: rebuild restores it
                # CURRENT params always serve the CURRENT corpus exactly
                # (ghost postings from a pre-shrink build would surface
                # as phantom doc_ids here).
                got = search(idx, terms, layout, max(n_buckets, 1))
                assert got == model_hits(texts, terms)
                # a mismatched read raises iff the sidecar is present
                wrong_layout = "term" if layout == "bucket" else "bucket"
                if has_sidecar:
                    with pytest.raises(ValueError, match="built with"):
                        search(idx, terms, wrong_layout, 8)
                    if layout == "bucket" and max(n_buckets, 1) != 16:
                        with pytest.raises(ValueError, match="n_buckets"):
                            search(idx, terms, "bucket", 16)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    prop()
