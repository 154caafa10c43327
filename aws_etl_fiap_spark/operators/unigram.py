"""Unigram-LM (SentencePiece-style) subword segmentation ([EXT] north star).

The third tokenizer family next to whitespace/regex counting (text.py) and
BPE (bpe.py): Kudo 2018's unigram language model segments each word into
the piece sequence with MAXIMUM likelihood under per-piece probabilities —
here the frequency seed estimate over all substrings (the initialization
step of SentencePiece's EM; the reference pipeline has no tokenizer at all,
so this extends the engine the same way bpe.py does).

Determinism / cross-engine contract (same strategy as operators/ml.py):

- piece counts and the normalizer are exact BIGINT aggregates;
- each piece cost quantizes to 9 dp (round-half-up) the moment the log is
  taken — libm/Math.log may differ in the last ulp, the quantization
  absorbs it;
- the Viterbi DP is UNROLLED RELATIONALLY: ``best[i] = MIN over j of
  (best[j] + cost(word[j..i]))`` as a min-STRUCT aggregate per position,
  so ties on cost break to the FEWEST pieces deterministically, and every
  candidate value is the same doubles added in the same order on both
  engines — a DuckDB CTE chain re-derives the identical trajectory;
- per-word NLL quantizes to 6 dp before the exact decimal doc-level sum.

Scale shape: the corpus collapses to its word VOCABULARY in one
aggregate; substring generation, the cost table, and all ``max_word_len``
DP rounds run on vocab-sized frames (eagerly checkpointed per round, the
BFS/LPA pattern); the only corpus-sized work is the vocabulary aggregate
and the final word-keyed stats join against the broadcast (model-sized)
best-segmentation table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, round_half_up

#: Bounded-horizon contract: the DP unrolls to this many positions, and
#: segmentation RAISES if the corpus contains a longer word — silent
#: truncation would diverge from the oracle's unrolled CTE chain.
MAX_WORD_LEN = 12
MAX_PIECE_LEN = 6


def _words(df: DataFrame, text_col: str) -> DataFrame:
    """Word vocabulary = NON-EMPTY space-separated tokens.  The empty
    token (consecutive/leading/trailing spaces) must be excluded: round-8
    advice — ``F.sequence(0, length('') - 1)`` AUTO-DESCENDS to [0, -1]
    (and the L sequence to [1, 0]), emitting bogus j=-1 / L=0 substrings
    and empty pieces that DuckDB's ``range()`` (which never descends)
    does not produce, silently poisoning piece counts on any
    non-single-spaced corpus."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def _substrings(words: DataFrame, max_piece_len: int) -> DataFrame:
    """All (w, wcnt, j, L, piece) substring occurrences, start j 0-based."""
    st = words.select(
        "w", "wcnt", F.explode(F.sequence(F.lit(0), F.length("w") - 1)).alias("j")
    )
    sub = st.select(
        "w",
        "wcnt",
        "j",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(max_piece_len), F.length("w") - F.col("j")),
            )
        ).alias("L"),
    )
    return sub.withColumn(
        "piece", F.col("w").substr(F.col("j") + 1, F.col("L"))
    )


def unigram_piece_costs(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    min_count: int = 2,
    words: DataFrame | None = None,
) -> DataFrame:
    """(piece, cnt, cost): frequency-estimated unigram piece model.

    cnt = exact occurrences of the substring across the corpus (weighted
    by word frequency); pieces below ``min_count`` are pruned EXCEPT
    single characters (kept unconditionally so every word stays
    segmentable); cost = round9(-ln(cnt / total)) with total summed over
    the kept vocabulary.  ``words``: a caller that already computed (and
    checkpointed) the :func:`_words` vocabulary passes it so the corpus
    explode+aggregate runs once, not twice (r14, guide §5)."""
    if words is None:
        words = _words(df, text_col)
    counts = (
        _substrings(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("wcnt").cast("long").alias("cnt"))
    )
    kept = counts.filter(
        (F.col("cnt") >= min_count) | (F.length("piece") == 1)
    )
    tot = kept.agg(F.sum("cnt").cast("long").alias("total"))
    return kept.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        round_half_up(
            -F.log(F.col("cnt").cast("double") / F.col("total").cast("double")),
            9,
        ).alias("cost"),
    )


def unigram_segment_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    min_count: int = 2,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Viterbi-optimal unigram segmentation statistics per document:
    ``(doc_id, n_words, n_pieces, nll)`` where n_pieces is the total
    piece count of the max-likelihood segmentation of every word instance
    and nll is the exact decimal sum of the per-word 6dp-quantized
    negative log-likelihoods.

    Raises ``ValueError`` if any corpus word exceeds ``max_word_len``
    (the unrolled-DP horizon — the determinism contract, like
    graph.bfs_hops' fixed hop budget)."""
    words = _words(df, text_col).localCheckpoint(eager=True)
    over = words.filter(F.length("w") > max_word_len).count()
    if over:
        raise ValueError(
            f"{over} words exceed max_word_len={max_word_len}; "
            "raise the horizon to keep the DP exact"
        )
    # Reuse the checkpointed vocabulary for the cost model: the r13 shape
    # re-ran the corpus explode+aggregate inside unigram_piece_costs (r14
    # profile: the query's single biggest avoidable pass, guide §5).
    costs = unigram_piece_costs(df, text_col, max_piece_len, min_count,
                                words=words)
    edges = (
        _substrings(words, max_piece_len)
        .join(costs.select("piece", "cost"), "piece")
        .select("w", "j", (F.col("j") + F.col("L")).alias("i"), "cost")
    )

    # The Viterbi DP is WORD-LOCAL: best[i] for one word never reads
    # another word's state, so the r13 relational unroll — 12 rounds of
    # join + min-struct aggregate, each eagerly checkpointed (r14 profile:
    # 66 Spark jobs, the query's dominant cost at any vocab size) — is
    # replaced by ONE Arrow pass over per-word edge lists (guide §4.2:
    # distribute with Spark, compute locally in batches).  Bit-exactness
    # is preserved operation for operation: candidate cost is the same
    # double add ``best[j] + edge_cost``, the argmin is the same
    # lexicographic (cost, n_pieces) order the min-STRUCT aggregate used
    # (ties to fewest pieces), and the 6 dp quantization is the identical
    # floor(x * 1e6 + 0.5) / 1e6 — re-verified exact against the unrolled
    # DuckDB CTE chain at sf0.01.
    import pandas as pd

    per_word = edges.groupBy("w").agg(
        F.collect_list(F.struct("j", "i", "cost")).alias("es")
    )

    def dp_gen(batches):
        import math

        for pdf in batches:
            ws: list = []
            ns: list = []
            nlls: list = []
            for w, es in zip(pdf["w"], pdf["es"]):
                by_i: dict = {}
                for e in es:
                    by_i.setdefault(e["i"], []).append((e["j"], e["cost"]))
                best = {0: (0.0, 0)}
                length = len(w)
                for i in range(1, length + 1):
                    cands = [
                        (best[j][0] + c, best[j][1] + 1)
                        for (j, c) in by_i.get(i, ())
                        if j in best
                    ]
                    if cands:
                        best[i] = min(cands)
                if length in best:
                    ws.append(w)
                    ns.append(best[length][1])
                    nlls.append(
                        math.floor(best[length][0] * 1000000.0 + 0.5)
                        / 1000000.0
                    )
            yield pd.DataFrame({"w": ws, "n": ns, "wnll": nlls})

    best = per_word.mapInPandas(dp_gen, "w string, n int, wnll double")
    docw = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        docw.join(F.broadcast(best), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n").cast("long").alias("n_pieces"),
            dec_sum("wnll", 6).alias("nll"),
        )
    )


def wordpiece_segment_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    min_count: int = 2,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """WORDPIECE (BERT-style) greedy longest-match-first segmentation —
    the fourth tokenizer family next to whitespace/regex counting, BPE,
    and the unigram-LM Viterbi sibling above.  Pieces are position-aware
    (word-INITIAL substrings vs ``##``-style continuations counted
    separately, the WordPiece vocabulary convention); a word segments by
    repeatedly taking the LONGEST vocabulary piece at the cursor.

    Unlike the unigram DP there is NO float anywhere: the vocabulary is
    a count threshold (single characters always kept, so segmentation
    never dead-ends), and the greedy step is ``max(L)`` per (word,
    cursor) — pure integers end to end, so the SQL twin is exact by
    construction.  Each of the ``max_word_len`` unrolled rounds advances
    every unfinished word by >= 1 character on vocab-sized frames
    (eagerly checkpointed, the BFS pattern); per-doc stats join against
    the broadcast per-word piece counts.  Raises like the unigram
    sibling if a word exceeds the horizon.

    Output: ``(doc_id, n_words, n_pieces)``."""
    words = _words(df, text_col).localCheckpoint(eager=True)
    over = words.filter(F.length("w") > max_word_len).count()
    if over:
        raise ValueError(
            f"{over} words exceed max_word_len={max_word_len}; "
            "raise the horizon to keep the greedy unroll exact"
        )
    subs = _substrings(words, max_piece_len)
    kept_pref = (
        subs.filter(F.col("j") == 0)
        .groupBy("piece")
        .agg(F.sum("wcnt").cast("long").alias("cnt"))
        .filter((F.col("cnt") >= min_count) | (F.length("piece") == 1))
        .select("piece")
    )
    kept_cont = (
        subs.filter(F.col("j") > 0)
        .groupBy("piece")
        .agg(F.sum("wcnt").cast("long").alias("cnt"))
        .filter((F.col("cnt") >= min_count) | (F.length("piece") == 1))
        .select("piece")
    )
    # No checkpoint (r14): the per-word collect below is now the edge
    # list's ONLY consumer, so pinning it would just add a job.
    edges = (
        subs.filter(F.col("j") == 0)
        .join(kept_pref, "piece")
        .select("w", "j", "L")
        .union(
            subs.filter(F.col("j") > 0)
            .join(kept_cont, "piece")
            .select("w", "j", "L")
        )
    )
    # The greedy cursor walk is WORD-LOCAL (same insight as the unigram
    # Viterbi above, r14): one Arrow pass over per-word (j, L) edge lists
    # replaces the max_word_len unrolled join+max rounds, each of which
    # was an eager checkpoint plus an isEmpty probe (2 Spark jobs per
    # round).  Pure integers end to end — ``max(L)`` at the cursor is the
    # identical value whichever engine computes it — re-verified exact
    # against the unrolled SQL twin.
    import pandas as pd

    per_word = edges.groupBy("w").agg(
        F.collect_list(F.struct("j", "L")).alias("es")
    )

    def greedy_gen(batches):
        for pdf in batches:
            ws: list = []
            ns: list = []
            for w, es in zip(pdf["w"], pdf["es"]):
                by_j: dict = {}
                for e in es:
                    j = e["j"]
                    L = e["L"]
                    if L > by_j.get(j, 0):
                        by_j[j] = L
                length = len(w)
                pos = 0
                n = 0
                while pos < length:
                    maxl = by_j.get(pos, 0)
                    if maxl <= 0:
                        # no vocabulary piece at the cursor: the word never
                        # finishes — same outcome as the relational unroll,
                        # where the (word, pos) row simply never reaches
                        # pos == len and drops out of ``fin``.  Single
                        # chars are always kept, so this is unreachable on
                        # real input; guarded to avoid an infinite loop.
                        n = -1
                        break
                    pos += maxl
                    n += 1
                if n >= 0 and pos == length:
                    ws.append(w)
                    ns.append(n)
            yield pd.DataFrame({"w": ws, "n_pieces": ns})

    best = per_word.mapInPandas(greedy_gen, "w string, n_pieces int")
    docw = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        docw.join(F.broadcast(best), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
        )
    )
