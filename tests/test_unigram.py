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
