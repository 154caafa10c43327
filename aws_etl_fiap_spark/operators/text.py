"""Text-analysis operators for LLM-training-data pipelines ([EXT] north star):
tokenization, token/char stats, quality scoring, language-ID heuristic,
document fingerprinting.

Everything is built-in Catalyst expressions (split / transform / filter /
aggregate higher-order functions) — no Python in the row path, so these run
JVM-side at full codegen speed over 100 TB of documents. The expressions are
pure integer/IEEE arithmetic, so a SQL oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword LID heuristic.
# Order matters: it is the deterministic tie-break priority.
LID_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "that", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不", "人", "这"),
}


def tokenize(df: DataFrame, text_col: str, out: str = "tokens") -> DataFrame:
    """Whitespace tokenization (documents.text is space-separated)."""
    return df.withColumn(out, F.split(F.col(text_col), " "))


def token_count(text_col: str) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.col(text_col), " "))


def word_token_count(text_col: str) -> Column:
    """BPE-ish token count: alnum runs only (drops punctuation/whitespace).

    ``split`` on the non-alnum class can produce empty edge strings; filter
    them out so the count is runs, not separators+1.
    """
    parts = F.split(F.col(text_col), "[^a-z0-9A-Z]+")
    return F.size(F.filter(parts, lambda x: x != F.lit("")))


def stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """How many tokens appear in ``words`` (with multiplicity)."""
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def quality_score(df: DataFrame, text_col: str, out: str = "quality") -> DataFrame:
    """Heuristic document quality in [0, 1]: length saturation, stopword
    ratio, average token length band — the standard cheap pre-filters before
    expensive LLM-data curation stages.

    score = 0.4 * min(n_tokens/100, 1)
          + 0.4 * min(stopword_ratio * 5, 1)
          + 0.2 * (3 <= avg_token_len <= 12)
    Pure IEEE arithmetic — oracle-reproducible exactly.
    """
    tokens = F.split(F.col(text_col), " ")
    n_tokens = F.size(tokens).cast("double")
    stop_ratio = (
        stopword_hits(tokens, LID_STOPWORDS["en"]).cast("double") / n_tokens
    )
    avg_len = (
        F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double") / n_tokens
    )
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.4
        + F.when((avg_len >= 3.0) & (avg_len <= 12.0), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_tokens", F.size(tokens))
        .withColumn("avg_token_len", avg_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn(out, score)
    )


def lang_id(df: DataFrame, text_col: str, out: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID: per-language hit counts, argmax with the
    LID_STOPWORDS key order as deterministic tie-break."""
    tokens = F.split(F.col(text_col), " ")
    langs = list(LID_STOPWORDS)
    for lang in langs:
        df = df.withColumn(f"__hits_{lang}", stopword_hits(tokens, LID_STOPWORDS[lang]))
    # First language (in priority order) whose score equals the max wins;
    # ZERO hits in every language is no evidence at all — predict NULL,
    # not the tie-break's first entry (code/symbol/uncovered-language docs
    # would otherwise be systematically labeled 'en').
    best = F.greatest(*[F.col(f"__hits_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(F.col(f"__hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    df = df.withColumn(out, F.when(best > 0, pred))
    return df.drop(*[f"__hits_{lang}" for lang in langs])


def fingerprint(text_col: str) -> Column:
    """Position-weighted character fingerprint: sum_i (i+1) * codepoint(c_i).

    A cheap order-sensitive document signature (anagram-proof, unlike a bag
    of chars); exact integer arithmetic, identical in any engine. For
    locality-sensitive near-dup detection use dedup.py's MinHash instead.
    """
    chars = F.split(F.col(text_col), "")
    weighted = F.zip_with(
        chars,
        F.sequence(F.lit(1), F.length(F.col(text_col))),
        lambda c, i: i.cast("long") * F.ascii(c).cast("long"),
    )
    # Empty text is the descending-sequence trap again: sequence(1, 0) is
    # [1, 0] while chars is [], so zip_with null-pads and the aggregate
    # returns NULL — grouping would silently merge empty docs with nulls.
    # An empty weighted sum is 0 by definition.
    return F.when(F.length(F.col(text_col)) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training chunking shape (context-window packing happens downstream).

    Expression-only: token array -> start positions every (chunk_tokens -
    overlap) -> slice + re-join per window -> explode. One narrow pass, no
    shuffle, no Python; at 100 TB this pipelines inside the scan stage.
    Output: (id, chunk_idx, n_chunk_tokens, chunk) with chunk_idx dense from
    0 — every document yields >= 1 chunk (short docs yield themselves).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens (a negative "
                         "overlap would silently skip tokens between chunks)")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    # Last start: size - overlap - 1, NOT size - 1 — a start inside the
    # final overlap window emits a chunk that is a strict SUBSET of the
    # previous one (e.g. 64 tokens / stride 48: start 48 re-emits tokens
    # 49-64 already covered by chunk 0), duplicating training data.
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - F.lit(overlap + 1), F.lit(0)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.slice(toks, s + 1, chunk_tokens).alias("win"),
        ),
    )
    ex = df.select(F.col(id_col), F.explode(chunks).alias("c"))
    return ex.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.win").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("c.win")).alias("chunk"),
    )


# PII redaction rule table: (name, pattern, replacement tag), applied IN
# ORDER — URLs first (an URL may embed userinfo/digits that the narrower
# rules would half-redact), then emails, then phone-shaped digit runs over
# the already-redacted text.  The patterns deliberately stay inside the
# common Java-regex / RE2 subset (no backreferences, no lookaround) so the
# exact same strings drive Spark's codegen'd regexp_* and any RE2-based
# engine (both implement leftmost-first greedy matching for this subset).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # No space in the class: with it, ANY run of space-separated numbers
    # totaling >= 8 chars ("scores were 10 20 30", "in 2020 2021",
    # "revenue 1 000 000") collapsed into one <PHONE>, destroying numeric
    # prose.  The conservative trade: space-grouped phone formats stay
    # unredacted (dash/paren/solid formats still match); without
    # lookaround (the RE2-portable subset) a space-tolerant pattern
    # cannot be stopped from bridging independent numbers.
    ("phone", r"\+?[0-9][0-9()-]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str, out: str = "redacted") -> DataFrame:
    """PII scrubbing for training corpora: replace URLs / emails / phone
    numbers with typed tags and count each redaction class per document.

    Counts are taken on the PROGRESSIVELY redacted text (the email count
    runs after URL replacement, the phone count after both), so a string is
    attributed to exactly one class no matter how rules overlap.  All three
    passes are built-in ``regexp_*`` expressions — JVM-side, one narrow
    projection, no shuffle, codegen'd; at 100 TB this fuses into the scan
    stage like any other projection.
    """
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pattern, tag in PII_RULES:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pattern), F.lit(0))).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pattern, tag)
    return df.select("*", *counts, cur.alias(out))


def repetition_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token ratio,
    most-frequent-token mass, and most-frequent-bigram mass — the cheap
    boilerplate/degenerate-text detectors that run before any model-based
    quality filter.

    Expression-only (split / array_distinct / transform / filter over the
    in-row token array): zero shuffle, zero Python — each document is scored
    inside the scan stage.  Cost is O(distinct x tokens) per row, bounded by
    the document length itself; the alternative explode -> groupBy(doc,
    token) -> max path costs two shuffles of the full corpus, which is the
    wrong trade at 100 TB for bounded-length documents (chunk first if your
    documents are unbounded).
    """
    toks = F.split(F.col(text_col), " ")
    # Guard the bigram build: sequence(0, size-2) on a 1-token document is
    # sequence(0, -1), which Spark treats as DESCENDING ([0, -1]) and then
    # faults on t[-1+1=0+1] under ANSI indexing — single-token rows must
    # short-circuit to an empty array (CASE only evaluates the taken branch).
    df = df.withColumn("__t", toks).withColumn(
        "__bg",
        F.when(
            F.size(F.col("__t")) >= 2,
            F.expr("transform(sequence(0, size(__t)-2), i -> concat(__t[i], ' ', __t[i+1]))"),
        ).otherwise(F.expr("CAST(array() AS array<string>)")),
    )

    def top_mass(arr: Column) -> Column:
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda x: F.size(F.filter(arr, lambda y: y == x)),
            )
        ).cast("double")

    n = F.size(F.col("__t"))
    out = df.select(
        "*",
        n.alias("n_tokens"),
        (F.size(F.array_distinct(F.col("__t"))).cast("double") / n).alias("distinct_ratio"),
        (top_mass(F.col("__t")) / n).alias("top_token_frac"),
        F.when(
            n >= 2, top_mass(F.col("__bg")) / (n - 1).cast("double")
        ).alias("top_bigram_frac"),
    )
    return out.drop("__t", "__bg")


# Okapi BM25 constants (the standard defaults in Lucene/Elasticsearch).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag-of-terms query:
    ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` — the keyword-retrieval
    scorer behind corpus search / targeted-subset selection in a training
    -data pipeline.

    Plan shape for 100 TB: tokenize -> explode -> FILTER to the query terms
    (the filter lands before the shuffle, so only matching postings move) ->
    per-(doc, term) counts; document frequencies per term (|terms| rows) and
    the global (N, avgdl) scalar both BROADCAST back, so the only exchanges
    over corpus-sized data are the two map-side-combined aggregates. Output:
    one row per document containing >= 1 query term: (id, bm25 — unrounded;
    callers round for cross-engine hashing).
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col).alias("__id"), F.size(toks).alias("dl"), toks.alias("__t"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # tf feeds BOTH the per-term document frequencies and the scorer; without
    # the checkpoint each consumer re-runs the corpus explode — at scale that
    # doubles the dominant cost (same pattern as dedup.ngram_jaccard_pairs).
    tf = (
        base.select("__id", "dl", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("__id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + BM25_K1 * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
    )
    contrib = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / denom
    return (
        scored.groupBy("__id")
        .agg(F.sum(contrib).alias("bm25"))
        .withColumnRenamed("__id", id_col)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` terms by smoothed TF-IDF
    ``tf * (ln((1 + N) / (1 + df)) + 1)`` (the sklearn ``smooth_idf``
    formulation — never divides by zero, never goes negative). BM25
    (:func:`bm25_scores`) answers "which documents match this query";
    this answers the transpose, "which terms characterize this document" —
    the tagging/topic-surfacing pass of a corpus curation pipeline.

    Plan shape for 100 TB: one exploded (doc, term) count aggregate
    (map-side combined), per-term document frequencies aggregated FROM the
    tf frame (vocabulary-sized, broadcast back with the N scalar), then the
    per-doc top-k window — the only corpus-sized exchanges are the tf
    aggregate and the final window partitioned by document.

    Determinism across engines: scores are rounded HALF_UP to 6 dp BEFORE
    ranking, ties broken by term, so a last-ulp ``ln`` divergence between
    libm and DuckDB cannot flip the rank order.  Output: (id, term, tf,
    tfidf, rnk <= k).
    """
    from pyspark.sql import Window

    from aws_etl_fiap_spark.functions.parity import round_half_up

    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        base.select("__id", F.explode("__t").alias("term"))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", round_half_up(F.col("tf") * idf, 6))
    )
    w = Window.partitionBy("__id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("__id").alias(id_col), "term", "tf", "tfidf", "rnk")
    )


def char_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Shannon entropy (bits) of the per-document character distribution,
    plus the distinct-character count — a cheap degenerate-text detector
    (near-zero entropy = one repeated symbol; high entropy = noise/binary
    junk) used alongside the repetition/quality signals.

    explode(chars) -> count per (doc, char) -> -sum(p log2 p). The explode
    multiplies rows by document length, but both aggregates are map-side
    combined on (doc, char) keys, so the shuffle carries at most
    |alphabet| rows per document, not the characters themselves. Empty
    documents carry no distribution and are filtered out (engines disagree
    on splitting ''). Output: (id, n_unique_chars, entropy — unrounded).
    """
    chars = df.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col).alias("__id"),
        F.length(F.col(text_col)).alias("n"),
        F.explode(F.split(F.col(text_col), "")).alias("c"),
    )
    counts = chars.groupBy("__id", "n", "c").agg(F.count(F.lit(1)).alias("cnt"))
    p = F.col("cnt").cast("double") / F.col("n").cast("double")
    return (
        counts.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_unique_chars"),
            (-F.sum(p * F.log2(p))).alias("entropy"),
        )
        .withColumnRenamed("__id", id_col)
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 25,
) -> DataFrame:
    """Corpus-level collocation mining: pointwise mutual information of
    adjacent token bigrams, ``pmi = ln( (c_ab / N_bi) / ((c_a/N) * (c_b/N)) )``
    with a count floor — the classic phrase-detection pass (word2vec-style
    phrasing, vocabulary induction) before tokenizer training.

    Plan shape: one exploded-unigram aggregate and one exploded-bigram
    aggregate (both map-side combined), scalar totals and the unigram
    vocabulary BROADCAST back onto the bigram counts — the corpus never
    shuffles except inside the two count aggregates.  Output: (w1, w2,
    c_ab, pmi — unrounded; callers round for cross-engine hashing).
    """
    toks = _lm_tokens(text_col)
    base = df.select(toks.alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    bi = (
        base.select(
            F.explode(
                _bigram_expr(F.col("__t"))
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").alias("n_tok"))
    n_bi = base.select(
        F.sum(F.greatest(F.size("__t") - 1, F.lit(0))).alias("n_bi")
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    p_ab = F.col("c_ab").cast("double") / F.col("n_bi").cast("double")
    p_a = F.col("c_a").cast("double") / F.col("n_tok").cast("double")
    p_b = F.col("c_b").cast("double") / F.col("n_tok").cast("double")
    return scored.select(
        "w1", "w2", "c_ab", F.log(p_ab / (p_a * p_b)).alias("pmi")
    )


def gopher_quality_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite rule-based quality filter with PER-RULE provenance (the
    Gopher/MassiveText-style document gate, public recipe: keep a document
    only if every heuristic passes, and record WHICH rules failed so
    curation can audit its losses by reason):

    - ``short``       n_words < 25
    - ``word_len``    mean word length outside [3.9, 4.6]
    - ``few_stop``    zero distinct English stopwords
    - ``repetitive``  most frequent word > 12% of all words

    Everything is a single codegen'd projection — no shuffle, no UDF; the
    repetition scan is O(vocab x words) per document inside the row, which
    beats an explode + per-doc groupBy (a corpus-sized shuffle) for the
    bounded per-document vocabularies real text has.  ``failed`` is the
    comma-joined sorted rule list (empty string = keep) so downstream
    rollups can group by failure signature without array-type hashing
    hazards."""
    toks = F.split(F.col(text_col), " ")
    n_words = F.size(toks)
    mwl = (
        F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast(
            "double"
        )
        / n_words
    )
    stop_distinct = F.size(
        F.filter(
            F.array_distinct(toks), lambda x: x.isin(*LID_STOPWORDS["en"])
        )
    )
    top_ratio = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda x: F.size(F.filter(toks, lambda y: y == x)),
            )
        ).cast("double")
        / n_words
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mwl)
        .withColumn("stop_distinct", stop_distinct)
        .withColumn("top_word_ratio", top_ratio)
    )
    rules = [
        ("few_stop", F.col("stop_distinct") < 1),
        ("repetitive", F.col("top_word_ratio") > 0.12),
        ("short", F.col("n_words") < 25),
        (
            "word_len",
            (F.col("mean_word_len") < 3.9) | (F.col("mean_word_len") > 4.6),
        ),
    ]  # alphabetical: `failed` joins in deterministic order
    failed = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    return out.withColumn("failed", failed).withColumn(
        "keep", F.col("failed") == ""
    )


def bigram_lm_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_bigram_count: int = 2,
    backoff: float = 0.4,
) -> DataFrame:
    """[EXT] Bigram language-model fluency scoring with stupid backoff —
    the CCNet/KenLM-style quality signal one tier above unigram surprisal
    (`text_unigram_surprisal`): per-document average negative log
    likelihood under the corpus's own bigram model,

        p(w2 | w1) = c(w1,w2) / c(w1)            if c(w1,w2) >= floor
                   = backoff * c(w2) / N          otherwise (stupid backoff)

    High avg NLL = disfluent token soup; low = fluent/boilerplate.  The
    ``min_bigram_count`` floor is KenLM-style pruning: singleton bigrams
    take the backoff path, which shrinks the bigram table by the long tail
    — that is what keeps the count model broadcastable (at 100 TB the
    pruned bigram table is O(frequent-bigram vocabulary), not O(corpus)).

    Plan shape: two map-side-combined count aggregates (unigrams, pruned
    bigrams); doc bigrams come from an expression-only zip_with (no
    positional self-join); the count tables and the scalar total broadcast
    back onto the exploded corpus — the corpus itself shuffles only into
    the final per-document aggregate.  Output: (id, n_bigrams, avg_nll —
    unrounded; callers round for cross-engine hashing).
    """
    toks = _lm_tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    bi = (
        base.select(
            F.explode(
                _bigram_expr(F.col("__t"))
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_bigram_count)
    )
    n_tok = uni.agg(F.sum("c").alias("n_tok"))
    doc_bi = base.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("__t"), 1, F.size("__t") - 1),
                F.slice(F.col("__t"), 2, F.size("__t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_w2"))
    scored = (
        doc_bi.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tok))
    )
    nll = F.when(
        F.col("c_ab").isNotNull(),
        -F.log(F.col("c_ab").cast("double") / F.col("c_w1").cast("double")),
    ).otherwise(
        -F.log(
            F.lit(backoff) * F.col("c_w2").cast("double")
            / F.col("n_tok").cast("double")
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum(nll) / F.count(F.lit(1))).alias("avg_nll"),
    )


def _bigram_expr(arr) -> Column:
    """Adjacent-pair struct array over a token array (zip_with over two
    shifted slices — no positional self-join, no explode-then-window);
    the ONE definition of a bigram shared by the PMI, stupid-backoff and
    Kneser-Ney paths."""
    return F.zip_with(
        F.slice(arr, 1, F.size(arr) - 1),
        F.slice(arr, 2, F.size(arr) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def _lm_tokens(text_col: str) -> Column:
    """Space tokens with EMPTY tokens dropped BEFORE pairing — the ONE
    tokenization of the three bigram-LM families (PMI, stupid backoff,
    Kneser-Ney).  A raw split mints '' unigrams and ('w','') bigrams on
    any multi-/leading-/trailing-space text; query and oracle previously
    AGREED on that garbage — the consistent-wrongness class only a
    model/property can catch (r10 review; the unigram tokenizer family
    took the same fix in r9).  Filter-then-pair: 'a  b' bigrams to
    ('a','b'), matching the linguistic adjacency."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document adjacent token pairs, expression-only (zip_with over two
    shifted slices — no positional self-join, no explode-then-window)."""
    toks = _lm_tokens(text_col)
    return df.select(
        F.col(id_col),
        F.explode(
            _bigram_expr(toks)
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")


def kn_bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_bigram_count: int = 2,
    discount: float = 0.75,
) -> DataFrame:
    """[EXT] Interpolated Kneser-Ney bigram scoring — the smoothing the
    CCNet/KenLM quality-filter models actually use, one rigor tier above
    :func:`bigram_lm_nll`'s stupid backoff.  Per bigram instance,

        P(w2 | w1) = max(c(w1,w2) - d, 0) / c_ctx(w1)
                   + (d * N1+(w1,.) / c_ctx(w1)) * N1+(.,w2) / B

    with c_ctx(w1) the bigram-context count (occurrences of w1 with a
    successor), N1+(w1,.) / N1+(.,w2) the distinct-successor /
    distinct-predecessor type counts, and B the total bigram type count —
    the continuation distribution that makes KN rank "York after New"
    correctly where raw-frequency backoff does not.  Bigrams below
    ``min_bigram_count`` take the continuation-only path (KenLM-style
    pruning: the discounted term is dropped, a documented probability
    deficit), which is what keeps the broadcast probability table
    O(frequent-bigram vocabulary) instead of O(all bigram types).

    Scale shape: the full bigram TYPE table is built once with a single
    map-side-combined aggregate and immediately reduced to three
    vocabulary-sized tables (c_ctx, N1+ forward, N1+ backward) plus one
    scalar — only those and the PRUNED count table broadcast back onto the
    corpus, so the corpus itself shuffles exactly once, into the final
    per-document aggregate.  Every per-word term is > 0 by construction
    (each scored pair exists in the type table), so ln never sees 0.

    Output: (id, n_bigrams, avg_nll — unrounded; callers round for
    cross-engine hashing).  Docs with fewer than 2 tokens have no bigrams
    and drop out, same as :func:`bigram_lm_nll`.
    """
    d = float(discount)
    db = _doc_bigrams(df, id_col, text_col)
    types = (
        db.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    kept = types.filter(F.col("c_ab") >= min_bigram_count)
    # ONE pass over the type table for both w1-keyed stats (and one
    # broadcast join instead of two against the corpus-sized frame).
    ctx = types.groupBy("w1").agg(
        F.sum("c_ab").alias("c_ctx"), F.count(F.lit(1)).alias("n_follow")
    )
    n1b = types.groupBy("w2").agg(F.count(F.lit(1)).alias("n_precede"))
    bt = types.agg(F.count(F.lit(1)).alias("n_types"))
    scored = (
        db.join(F.broadcast(kept), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(n1b), "w2")
        .crossJoin(F.broadcast(bt))
    )
    c_ctx = F.col("c_ctx").cast("double")
    # the max(c - d, 0) clamp from the docstring formula: a discount >=
    # min_bigram_count would otherwise push `seen` negative and, when
    # |seen| > cont, hand ln a negative argument (NaN avg_nll)
    seen = F.when(
        F.col("c_ab").isNotNull(),
        F.greatest(F.col("c_ab").cast("double") - F.lit(d), F.lit(0.0)) / c_ctx,
    ).otherwise(F.lit(0.0))
    cont = (
        (F.lit(d) * F.col("n_follow").cast("double") / c_ctx)
        * F.col("n_precede").cast("double")
        / F.col("n_types").cast("double")
    )
    nll = -F.log(seen + cont)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum(nll) / F.count(F.lit(1))).alias("avg_nll"),
    )
