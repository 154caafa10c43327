"""Unit tests for the distributed BPE trainer (operators/bpe.py)."""

from __future__ import annotations

from aws_etl_fiap_spark.operators.bpe import bpe_train_merges, word_frequencies


def test_bpe_learns_pinned_merges(spark):
    # "low low low lower lowest": BPE on chars -> first merge is the most
    # frequent adjacent pair.  l-o appears 5x, o-w 5x; tie broken
    # lexicographically -> ('l','o') first, then ('lo','w'), then the 'low'
    # symbol pairs with its suffixes.
    docs = spark.createDataFrame(
        [("low low low lower lowest",)], "text string"
    )
    rows = {r["stage"]: r for r in bpe_train_merges(docs, n_merges=3).collect()}
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["cnt"]) == ("l", "o", 5)
    assert (rows[2]["left_sym"], rows[2]["right_sym"], rows[2]["cnt"]) == ("lo", "w", 5)
    # after merging to 'low', remaining pairs: low-e (2: lower, lowest) wins
    # over e-r / e-s / s-t (1 each)
    assert (rows[3]["left_sym"], rows[3]["right_sym"], rows[3]["cnt"]) == ("low", "e", 2)
    assert all(rows[s]["selected"] == 1 for s in (1, 2, 3))
    # residual stages continue numbering and are flagged unselected
    resid = [r for r in rows.values() if r["selected"] == 0]
    assert {r["stage"] for r in resid} == {4, 5, 6}


def test_bpe_single_pass_replace_semantics(spark):
    # 'a a a a' (word "aaaa"): pair (a,a) counts 3 (overlapping adjacency),
    # single-pass replace merges leftmost non-overlapping -> 'aa aa'.
    # the single pass consumes the shared separator space, so only the
    # LEFTMOST pair merges: ' a a a a ' -> ' aa a a ' (canonical BPE would
    # re-scan and produce 'aa aa'; both engines share the single-pass scan,
    # which is the variant this trainer documents and gates).
    docs = spark.createDataFrame([("aaaa",)], "text string")
    rows = {r["stage"]: r for r in bpe_train_merges(docs, n_merges=2).collect()}
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["cnt"]) == ("a", "a", 3)
    # remaining tokens [aa, a, a]: pairs (aa,a) and (a,a) tie at 1, the
    # lexicographic tiebreak picks (a,a)
    assert (rows[2]["left_sym"], rows[2]["right_sym"], rows[2]["cnt"]) == ("a", "a", 1)


def test_word_frequencies_lowercase_alnum_runs(spark):
    docs = spark.createDataFrame([("The cat, the CAT!  cat9",)], "text string")
    freqs = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert freqs == {"the": 2, "cat": 2, "cat9": 1}


def test_bpe_encode_per_doc_accounting(spark):
    """Encode with the 'low' corpus: after 3 merges ('l o'->'lo',
    'lo w'->'low', 'low e'->'lowe'), per-word symbol counts are
    low=1, lower=2 (lowe r), lowest=3 (lowe s t); doc totals follow
    exactly, and n_chars is the merge-free symbol count."""
    from aws_etl_fiap_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "low lowest")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_encode(docs, n_merges=3).collect()}
    d1, d2 = rows[1], rows[2]
    assert (d1["n_words"], d1["n_chars"], d1["n_bpe_tokens"]) == (5, 20, 3 * 1 + 2 + 3)
    assert (d2["n_words"], d2["n_chars"], d2["n_bpe_tokens"]) == (2, 9, 1 + 3)
