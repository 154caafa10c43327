"""Distributed BPE-style tokenizer training ([EXT] north star).

The reference has no tokenizer surface; this extends the engine toward
training-data pipelines (SURVEY.md §2.13 "token counting" made trainable):
learn byte-pair merges from corpus word frequencies with every heavy stage
distributed — word counting, symbol-pair counting, merge application — and
only the argmax merge decision (ONE row per iteration) on the driver, the
same bounded-collect discipline as kmeans_lloyd's centroid step.

Merge-application semantics: one single-pass leftmost non-overlapping
``replace`` of `` a b `` with `` ab `` over the space-padded symbol
sequence.  For runs like ``a b a b`` a single pass consumes the shared
separator space and merges only the first occurrence — canonical BPE
re-scans; we document the single-pass variant instead, because BOTH engines
(Spark ``replace`` and DuckDB ``replace``) implement exactly this scan, which
is what puts the whole trainer behind an exact cross-engine value gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.sources.readers import spread_input


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased alnum runs — the BPE training corpus
    compressed from O(corpus tokens) to O(vocabulary).  The corpus scan is
    spread to session parallelism first (guide §2.5): a one-row-group
    fixture otherwise tokenizes the whole corpus on one core."""
    words = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
    ).alias("word")
    src = spread_input(docs.select(F.col(text_col)))
    return src.select(words).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over (word, freq, seq) weighted by word
    frequency.  seq is the space-padded symbol string; adjacent pairs are
    zipped INSIDE the row with an array expression and explode straight
    into the map-side-combined pair aggregate — one shuffle keyed by pair.
    (The first cut ran posexplode + a LEAD window partitioned by word,
    which shuffled every exploded symbol by word just to look one element
    ahead inside an array it already had whole — a full extra exchange per
    merge round, r13 plan audit.)  Emitted pair multiset is identical: the
    i-th adjacent pair of each word's symbol sequence, weighted by freq."""
    toks = F.filter(F.split(F.col("seq"), " "), lambda x: x != F.lit(""))
    # when() guard: F.sequence(0, -1) DESCENDS for single-symbol words
    # (the repo's recurring auto-descent trap) — emit no pairs instead.
    pairs_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(2)),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("left_sym"),
                F.element_at(toks, i + 2).alias("right_sym"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left_sym:string,right_sym:string>>"))
    pairs = seqs.select("freq", F.explode(pairs_arr).alias("p"))
    return pairs.groupBy(
        F.col("p.left_sym").alias("left_sym"), F.col("p.right_sym").alias("right_sym")
    ).agg(F.sum("freq").alias("cnt"))


def _train(docs: DataFrame, text_col: str, n_merges: int):
    """Shared trainer core: returns (merge list, vocabulary frame with the
    merge chain applied).  The corpus collapses to its vocabulary ONCE
    (localCheckpoint); each round is one distributed pair-count plus a
    1-row ordered-limit collect — the bounded-collect discipline of
    kmeans_lloyd's centroid step."""
    seqs = word_frequencies(docs, text_col).select(
        "word",
        "freq",
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
            F.lit(" "),
        ).alias("seq"),
    )
    seqs = seqs.localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for i in range(1, n_merges + 1):
        best = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best:
            break
        r = best[0]
        merges.append((i, r["left_sym"], r["right_sym"], r["cnt"]))
        seqs = seqs.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f" {r['left_sym']} {r['right_sym']} "),
                F.lit(f" {r['left_sym']}{r['right_sym']} "),
            ),
        )
    return merges, seqs


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    top_after: int = 3,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; return the merge table plus the
    ``top_after`` best remaining pairs AFTER the final merge (pinning that
    merges were APPLIED, not merely selected).

    Output: stage (1..n_merges for chosen merges, then n_merges+1.. for the
    residual top pairs), left_sym, right_sym, cnt, selected (1 = learned
    merge, 0 = residual pair).

    100 TB shape: the corpus collapses to its vocabulary once (one
    hash aggregate); each merge round is one distributed pair-count over
    O(vocab) rows plus a 1-row ordered-limit collect; merge application is
    a codegen'd string ``replace`` — no Python, no growing driver state.
    Real trainers run ~30k merges — same loop, batched count refreshes.
    """
    spark = docs.sparkSession
    merges, seqs = _train(docs, text_col, n_merges)
    learned = spark.createDataFrame(
        merges, "stage int, left_sym string, right_sym string, cnt bigint"
    ).withColumn("selected", F.lit(1))
    # orderBy+limit compiles to TakeOrdered (distributed top-k, no global
    # sort); the row_number window then runs on ``top_after`` rows only.
    resid_w = Window.orderBy(F.col("cnt").desc(), "left_sym", "right_sym")
    residual = (
        _pair_counts(seqs)
        .orderBy(F.col("cnt").desc(), "left_sym", "right_sym")
        .limit(top_after)
        .withColumn("rn", F.row_number().over(resid_w))
        .select(
            (F.col("rn") + len(merges)).cast("int").alias("stage"),
            "left_sym",
            "right_sym",
            "cnt",
            F.lit(0).alias("selected"),
        )
    )
    return learned.unionByName(residual)


def bpe_encode(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 3,
) -> DataFrame:
    """Apply the trained merge table back to the corpus — tokenizer
    APPLICATION, the read side of :func:`bpe_train_merges`: per document,
    the BPE token count after ``n_merges`` learned merges, alongside the
    pre-merge symbol (= character) count and the whitespace word count.

    100 TB shape: encoding never touches document strings row-by-row — the
    merge chain (a codegen'd ``replace`` cascade) runs over the DISTINCT
    WORD vocabulary, yielding one ``(word, n_sym)`` row per word type;
    documents reduce to ``(doc, word, cnt)`` occurrence counts (one hash
    aggregate) and a word-keyed join (AQE broadcasts the vocabulary when
    it is small; Zipf-hot words are per-doc collapsed first, so the probe
    side carries distinct (doc, word) pairs, not raw token instances)
    brings the per-type symbol count back for an exact per-doc total.

    Output: (doc id, n_words, n_chars, n_bpe_tokens) — n_chars is the
    token count a merge-free byte tokenizer would emit, so
    n_chars - n_bpe_tokens is exactly the per-doc savings of the learned
    merges.
    """
    _, seqs = _train(docs, text_col, n_merges)
    vocab = seqs.select(
        "word",
        F.size(
            F.filter(F.split(F.col("seq"), " "), lambda x: x != F.lit(""))
        ).cast("long").alias("n_sym"),
        F.length("word").cast("long").alias("n_char"),
    )
    words = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
    ).alias("word")
    occ = (
        docs.select(F.col(id_col), words)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        occ.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_char")).cast("bigint").alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_sym")).cast("bigint").alias("n_bpe_tokens"),
        )
    )
