"""Unit tests for unigram-LM segmentation (operators/unigram.py)."""

from __future__ import annotations

import math

import pytest


def test_frequent_whole_word_segments_as_one_piece(spark):
    from aws_etl_fiap_spark.operators.unigram import unigram_segment_stats

    # One 6-char word repeated: every substring has count 3, so the
    # single-piece segmentation (one cost) beats any split (sum of equal
    # costs).  21 distinct substrings * count 3 -> total 63; cost =
    # round9(-ln(3/63)) = round9(ln(21)).
    df = spark.createDataFrame(
        [(1, "abcdef abcdef abcdef")], "doc_id long, text string"
    )
    row = unigram_segment_stats(df).collect()[0]
    assert row["n_words"] == 3
    assert row["n_pieces"] == 3
    cost = math.floor(math.log(21.0) * 1e9 + 0.5) / 1e9
    wnll = math.floor(cost * 1e6 + 0.5) / 1e6
    assert row["nll"] == pytest.approx(3 * wnll, abs=1e-9)


def test_unseen_split_uses_char_fallback(spark):
    from aws_etl_fiap_spark.operators.unigram import unigram_segment_stats

    # "xy" occurs once -> the 2-gram is pruned (min_count=2) but single
    # chars are kept unconditionally, so the word still segments (2
    # pieces), while the repeated word stays 1 piece.
    df = spark.createDataFrame(
        [(1, "abab abab xy")], "doc_id long, text string"
    )
    row = unigram_segment_stats(df).collect()[0]
    assert row["n_words"] == 3
    # abab=1 piece twice, xy = x + y = 2 pieces
    assert row["n_pieces"] == 2 * 1 + 2


def test_word_over_horizon_raises(spark):
    from aws_etl_fiap_spark.operators.unigram import unigram_segment_stats

    df = spark.createDataFrame(
        [(1, "a thirteenchars13")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_word_len"):
        unigram_segment_stats(df).collect()


def test_wordpiece_greedy_longest_match(spark):
    from aws_etl_fiap_spark.operators.unigram import wordpiece_segment_stats

    # 'abcdef' twice: the full 6-char prefix is in vocab (cnt 2) -> one
    # greedy bite.  'abcxyz' once: greedy takes the longest SHARED prefix
    # 'abc' (cnt 3 >= 2), then continuations 'x','y','z' fall back to
    # single chars (xyz-grams have cnt 1 < 2) -> 4 pieces.
    df = spark.createDataFrame(
        [(1, "abcdef abcdef abcxyz")], "doc_id long, text string"
    )
    row = wordpiece_segment_stats(df).collect()[0]
    assert row["n_words"] == 3
    assert row["n_pieces"] == 1 + 1 + 4


def test_wordpiece_positional_vocab_is_respected(spark):
    from aws_etl_fiap_spark.operators.unigram import wordpiece_segment_stats

    # 'ab' is frequent word-INITIALLY but never as a continuation, so in
    # 'xab' the cursor after 'x' cannot take 'ab' as one piece (the
    # continuation 'ab' has count 1 < 2) -> x+a+b = 3 pieces; the two
    # standalone 'ab's are 1 piece each.
    df = spark.createDataFrame(
        [(1, "ab ab xab")], "doc_id long, text string"
    )
    row = wordpiece_segment_stats(df).collect()[0]
    assert row["n_words"] == 3
    assert row["n_pieces"] == 1 + 1 + 3


def test_wordpiece_horizon_raises(spark):
    import pytest

    from aws_etl_fiap_spark.operators.unigram import wordpiece_segment_stats

    df = spark.createDataFrame(
        [(1, "a thirteenchars13")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_word_len"):
        wordpiece_segment_stats(df).collect()


def test_multi_space_corpus_ignores_empty_tokens(spark):
    """Round-8 advice: F.sequence auto-descends on the empty token
    ('' -> j in [0,-1], L in [1,0]), so consecutive/leading/trailing
    spaces polluted piece counts with bogus empty pieces that DuckDB's
    range() never produces.  A multi-spaced corpus must segment exactly
    like its single-spaced twin."""
    from aws_etl_fiap_spark.operators.unigram import (
        unigram_segment_stats,
        wordpiece_segment_stats,
    )

    clean = spark.createDataFrame(
        [(1, "abcdef abcdef abcdef"), (2, "abc def")],
        "doc_id long, text string",
    )
    messy = spark.createDataFrame(
        [(1, " abcdef  abcdef   abcdef "), (2, "  abc  def")],
        "doc_id long, text string",
    )
    for fn in (unigram_segment_stats, wordpiece_segment_stats):
        want = sorted(map(tuple, fn(clean).collect()))
        got = sorted(map(tuple, fn(messy).collect()))
        assert got == want, fn.__name__


def test_tokenizers_match_python_models_property(spark):
    """Property (r10): on ARBITRARY small corpora, the two distributed
    tokenizer DPs equal brute-force Python models — the unigram-LM Viterbi
    (min (cost, n) over all segmentations, frequency-estimated 9dp piece
    costs) and the position-aware WordPiece greedy longest-match.  Random
    corpora exercise vocabulary shapes fixtures never hit (every piece a
    singleton, repeated substrings inside one word, whole-corpus one-word
    vocabularies); an oracle gate cannot catch a query+oracle pair that is
    consistently wrong — a model can."""
    import math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.unigram import (
        unigram_segment_stats,
        wordpiece_segment_stats,
    )

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=4).map(" ".join)

    MAXP, MINC = 4, 2

    def r9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def models(docs):
        wcnt = Counter(w for d in docs for w in d.split(" ") if w)
        # unigram piece model: every (j, L) occurrence weighted by wcnt
        pieces = Counter()
        for w, c in wcnt.items():
            for j in range(len(w)):
                for L in range(1, min(MAXP, len(w) - j) + 1):
                    pieces[w[j : j + L]] += c
        kept = {p: c for p, c in pieces.items() if c >= MINC or len(p) == 1}
        total = sum(kept.values())
        cost = {p: r9(-math.log(c / total)) for p, c in kept.items()}

        def viterbi(w):
            dp = {0: (0.0, 0)}
            for i in range(1, len(w) + 1):
                cands = [
                    (dp[j][0] + cost[w[j:i]], dp[j][1] + 1)
                    for j in range(max(0, i - MAXP), i)
                    if j in dp and w[j:i] in cost
                ]
                if cands:
                    dp[i] = min(cands)
            return dp[len(w)]

        # wordpiece position-aware vocab
        pref, cont = Counter(), Counter()
        for w, c in wcnt.items():
            for L in range(1, min(MAXP, len(w)) + 1):
                pref[w[:L]] += c
            for j in range(1, len(w)):
                for L in range(1, min(MAXP, len(w) - j) + 1):
                    cont[w[j : j + L]] += c
        kp = {p for p, c in pref.items() if c >= MINC or len(p) == 1}
        kc = {p for p, c in cont.items() if c >= MINC or len(p) == 1}

        def greedy(w):
            pos, n = 0, 0
            while pos < len(w):
                vocab = kp if pos == 0 else kc
                L = max(
                    ln
                    for ln in range(1, min(MAXP, len(w) - pos) + 1)
                    if w[pos : pos + ln] in vocab
                )
                pos += L
                n += 1
            return n

        uni, wp = {}, {}
        for i, d in enumerate(docs):
            ws = [w for w in d.split(" ") if w]
            stats = [viterbi(w) for w in ws]
            uni[i] = (
                len(ws),
                sum(n for _, n in stats),
                sum(r6(c) for c, _ in stats),
            )
            wp[i] = (len(ws), sum(greedy(w) for w in ws))
        return uni, wp

    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4))
    def prop(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        uni_want, wp_want = models(docs)

        got = {
            r["doc_id"]: (r["n_words"], r["n_pieces"], r["nll"])
            for r in unigram_segment_stats(df, max_piece_len=MAXP).collect()
        }
        assert set(got) == set(uni_want)
        for i, (nw, np_, nll) in uni_want.items():
            gw, gp, gn = got[i]
            assert (gw, gp) == (nw, np_), f"doc {i}: {docs[i]!r}"
            assert abs(gn - nll) < 2e-6, f"doc {i} nll {gn} vs {nll}"

        got_wp = {
            r["doc_id"]: (r["n_words"], r["n_pieces"])
            for r in wordpiece_segment_stats(df, max_piece_len=MAXP).collect()
        }
        assert got_wp == wp_want

    prop()
