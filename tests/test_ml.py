"""Unit tests for distributed iterative trainers (operators/ml.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.ml import logreg_train_gd


def _r12(v):
    return math.floor(v * 1.0e12 + 0.5) / 1.0e12


def test_logreg_first_step_closed_form(spark):
    """With w=0 the sigmoid is exactly 0.5 everywhere, so iteration 1 is
    the closed form w_k = r12(-lr * mean((0.5 - y) * x_k))."""
    rows = [(1, 2.0), (1, 3.0), (0, 0.5), (0, 1.0)]
    df = spark.createDataFrame(rows, "y int, x double")
    out = {r["iter"]: r for r in
           logreg_train_gd(df, F.col("y") == 1, [F.col("x")], lr=2.0, iters=2).collect()}
    g0 = sum(0.5 - y for y, _ in rows) / 4
    g1 = sum((0.5 - y) * x for y, x in rows) / 4
    assert out[1]["b0"] == _r12(-2.0 * g0)
    assert out[1]["b1"] == _r12(-2.0 * g1)


def test_logreg_learns_separable_data(spark):
    """On linearly separable data the trajectory reaches perfect training
    accuracy and the slope weight is positive."""
    rows = [(0, float(v)) for v in (-3, -2, -1.5)] + [(1, float(v)) for v in (1.5, 2, 3)]
    df = spark.createDataFrame(rows, "y int, x double")
    out = sorted(
        logreg_train_gd(df, F.col("y") == 1, [F.col("x")], lr=2.0, iters=3).collect(),
        key=lambda r: r["iter"],
    )
    assert out[-1]["b1"] > 0
    assert out[-1]["n_correct"] == len(rows)
    # n_correct is evaluated with each iteration's OWN weights
    assert all(r["n_correct"] <= len(rows) for r in out)


def test_logreg_score_matches_manual_sigmoid(spark):
    import math

    import pyspark.sql.functions as F

    from aws_etl_fiap_spark.operators.ml import logreg_score

    df = spark.createDataFrame([(0.5, 1.0), (2.0, -1.0)], "x1 double, x2 double")
    w = [0.1, 0.2, -0.3]
    got = [
        r["p"]
        for r in df.select(
            logreg_score([F.col("x1"), F.col("x2")], w).alias("p")
        ).collect()
    ]
    for (x1, x2), p in zip([(0.5, 1.0), (2.0, -1.0)], got):
        z = w[0] + w[1] * x1 + w[2] * x2
        expect = math.floor(1.0 / (1.0 + math.exp(-z)) * 1e12 + 0.5) / 1e12
        assert p == expect


def test_logreg_score_validates_weight_count(spark):
    import pyspark.sql.functions as F
    import pytest

    from aws_etl_fiap_spark.operators.ml import logreg_score

    with pytest.raises(ValueError):
        logreg_score([F.lit(1.0)], [0.0])


def _auc_df(spark, rows):
    return spark.createDataFrame(rows, "score double, y int")


def test_exact_auc_perfect_and_reverse(spark):
    from aws_etl_fiap_spark.operators.ml import exact_auc

    perfect = _auc_df(
        spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    )
    out = exact_auc(perfect, F.col("y"), F.col("score")).collect()[0]
    assert out["auc"] == 1.0 and out["n_pos"] == 2 and out["n_neg"] == 2

    reverse = _auc_df(
        spark, [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)]
    )
    assert exact_auc(reverse, F.col("y"), F.col("score")).collect()[0]["auc"] == 0.0


def test_exact_auc_ties_use_average_ranks(spark):
    from aws_etl_fiap_spark.operators.ml import exact_auc

    # scores: 0.5 (pos), 0.5 (neg), 0.3 (neg) -> the tied pos/neg pair
    # contributes 1/2; the (pos, 0.3-neg) pair contributes 1.
    # AUC = (1 + 0.5) / (1 * 2) = 0.75.
    df = _auc_df(spark, [(0.5, 1), (0.5, 0), (0.3, 0)])
    assert exact_auc(df, F.col("y"), F.col("score")).collect()[0]["auc"] == 0.75


def test_exact_auc_matches_sklearn_formula_on_random(spark):
    from aws_etl_fiap_spark.operators.ml import exact_auc

    # Seedless determinism: fixed pseudo-random rows; brute-force pairwise
    # comparison (wins + half-ties over pos*neg pairs) is the definition.
    rows = []
    x = 7
    for i in range(200):
        x = (x * 1103515245 + 12345) % (2**31)
        score = ((x >> 8) % 50) / 50.0  # coarse grid -> plenty of ties
        y = 1 if ((x >> 3) % 3 == 0) else 0
        rows.append((score, y))
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(1.0 for p in pos for q in neg if p > q)
    ties = sum(1.0 for p in pos for q in neg if p == q)
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    out = exact_auc(_auc_df(spark, rows), F.col("y"), F.col("score")).collect()[0]
    # the operator releases auc rounded half-up to 6 dp
    assert out["auc"] == math.floor(expect * 1e6 + 0.5) / 1e6
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)


def test_naive_bayes_separates_distinct_vocabularies(spark):
    from aws_etl_fiap_spark.operators.ml import naive_bayes_confusion

    rows = [
        (1, "en", "the cat sat"),
        (2, "en", "the dog sat"),
        (3, "en", "the cat ran"),
        (4, "de", "der hund lief"),
        (5, "de", "der katze sass"),
        (6, "de", "der hund sass"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in naive_bayes_confusion(df, "lang", "text", "doc_id").collect()
    }
    # fully separated vocabularies -> perfect diagonal
    assert out == {("en", "en"): 3, ("de", "de"): 3}


def test_naive_bayes_prior_decides_unseen_words(spark):
    from aws_etl_fiap_spark.operators.ml import naive_bayes_confusion

    # doc 5's words are unseen in training counts of BOTH classes except
    # through itself; the majority class has both the larger prior and the
    # same smoothing denominators, so the lone-word doc lands there.
    rows = [
        (1, "en", "alpha beta"),
        (2, "en", "alpha gamma"),
        (3, "en", "beta gamma"),
        (4, "de", "alpha beta"),
        (5, "de", "zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in naive_bayes_confusion(df, "lang", "text", "doc_id").collect()
    }
    assert sum(out.values()) == 5
    # doc 4 has identical text to en-majority docs -> misclassified to en;
    # doc 5's 'zz' appears only in de counts -> stays de.
    assert out[("de", "de")] == 1 and out[("de", "en")] == 1


def test_logreg_refuses_untrainable_frames_and_skips_null_rows(spark):
    """Late-r9 review: an empty frame TypeError'd on NULL gradient sums;
    rows with NULL label/features silently diluted every update (counted
    in n, skipped by the sums).  Empty -> loud; NULL rows -> excluded."""
    import pytest
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.ml import logreg_train_gd

    empty = spark.createDataFrame([], "y int, x double")
    with pytest.raises(ValueError, match="no trainable rows"):
        logreg_train_gd(empty, F.col("y") == 1, [F.col("x")], iters=1)

    clean = spark.createDataFrame(
        [(1, 2.0), (0, -2.0), (1, 3.0), (0, -1.0)], "y int, x double"
    )
    dirty = clean.union(
        spark.createDataFrame([(None, 5.0), (1, None)], "y int, x double")
    )
    w_clean = logreg_train_gd(clean, F.col("y") == 1, [F.col("x")], iters=2).collect()
    w_dirty = logreg_train_gd(dirty, F.col("y") == 1, [F.col("x")], iters=2).collect()
    assert [tuple(r) for r in w_clean] == [tuple(r) for r in w_dirty]


def test_exact_auc_single_class_is_null_and_nulls_excluded(spark):
    """Late-r9 review: a one-class corpus produced Infinity/NaN via a
    double 0-divide (now NULL: AUC is undefined), and NULL scores ranked
    NULLS-FIRST in Spark vs NULLS-LAST in a SQL twin (now excluded)."""
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.ml import exact_auc

    one_class = spark.createDataFrame([(1, 0.9), (1, 0.1)], "y int, s double")
    row = exact_auc(one_class, F.col("y"), F.col("s")).collect()[0]
    assert row["auc"] is None and row["n_pos"] == 2 and row["n_neg"] == 0

    with_nulls = spark.createDataFrame(
        [(1, 0.9), (0, 0.1), (1, None), (None, 0.5)], "y int, s double"
    )
    row = exact_auc(with_nulls, F.col("y"), F.col("s")).collect()[0]
    assert (row["auc"], row["n_pos"], row["n_neg"]) == (1.0, 1, 1)


def test_logreg_trajectory_matches_python_model_property(spark):
    """Property (r10): the full GD trajectory — 12dp-quantized sigmoid,
    9dp-quantized decimal gradient sums, 12dp weight re-quantization,
    per-iteration accuracy — equals a Python replication on arbitrary
    small training sets (all-one-class sets, separable sets, constant
    features)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.ml import logreg_train_gd

    row = st.tuples(
        st.integers(min_value=0, max_value=1),   # y
        st.integers(min_value=-3, max_value=3),  # x
    )
    LR, ITERS = 1.5, 2

    def r12(v):
        return math.floor(v * 1.0e12 + 0.5) / 1.0e12

    def r9i(v):
        return math.floor(v * 1.0e9 + 0.5)  # 1e-9 units, exact int

    def model(data):
        w = [0.0, 0.0]
        out = []
        accs = []
        for it in range(1, ITERS + 2):
            g0u = g1u = 0
            n_correct = 0
            for y, x in data:
                z = w[0] + w[1] * float(x)
                sig = r12(1.0 / (1.0 + math.exp(-z)))
                err = sig - y
                if (sig >= 0.5) == (y == 1):
                    n_correct += 1
                g0u += r9i(err)
                g1u += r9i(err * float(x))
            accs.append(n_correct)
            if it <= ITERS:
                n = float(len(data))
                g0 = float(g0u) / 1e9
                g1 = float(g1u) / 1e9
                w = [r12(w[0] - LR * (g0 / n)), r12(w[1] - LR * (g1 / n))]
                out.append([it, w[0], w[1]])
        for i, r in enumerate(out):
            r.append(accs[i + 1])  # pass it+1 scored iteration it's weights
        return out

    @settings(max_examples=5, deadline=None)
    @given(st.lists(row, min_size=1, max_size=12))
    def prop(data):
        df = spark.createDataFrame(data, "y int, x int")
        got = [
            [r["iter"], r["b0"], r["b1"], r["n_correct"]]
            for r in logreg_train_gd(
                df, F.col("y"), [F.col("x")], lr=LR, iters=ITERS
            ).collect()
        ]
        want = model(data)
        assert len(got) == len(want)
        for g, w_ in zip(got, want):
            assert g[0] == w_[0] and g[3] == w_[3], (g, w_)
            assert abs(g[1] - w_[1]) < 2e-12 and abs(g[2] - w_[2]) < 2e-12, (g, w_)

    prop()


def test_naive_bayes_confusion_matches_python_model_property(spark):
    """Property (r10): the Laplace-smoothed NB confusion matrix equals an
    exact integer-units Python model — 9dp-quantized log terms, decimal
    contributions, argmax ties to the lexicographically first class — on
    arbitrary corpora (singleton classes, shared-vocabulary classes,
    single-word docs)."""
    import math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.ml import naive_bayes_confusion

    word = st.sampled_from(["r", "s", "t"])
    doc = st.lists(word, min_size=1, max_size=5).map(" ".join)
    lab = st.sampled_from(["aa", "bb"])

    def r9u(x):
        return math.floor(x * 1e9 + 0.5)

    def model(rows):
        n = len(rows)
        cw = Counter()
        ctot = Counter()
        nc = Counter()
        vocab = set()
        for _, y, d in rows:
            nc[y] += 1
            for w in d.split(" "):
                cw[(y, w)] += 1
                ctot[y] += 1
                vocab.add(w)
        v = len(vocab)
        classes = sorted(nc)
        conf = Counter()
        for _, y, d in rows:
            wc = Counter(d.split(" "))
            best = None
            for c in classes:
                den = ctot[c] + v
                score = r9u(math.log(nc[c] / n)) + sum(
                    cnt
                    * r9u(
                        math.log((cw[(c, w)] + 1) / den)
                        if (c, w) in cw
                        else math.log(1.0 / den)
                    )
                    for w, cnt in wc.items()
                )
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            conf[(y, best[1])] += 1
        return dict(conf)

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(lab, doc), min_size=1, max_size=10
        ).map(lambda rs: [(i, y, d) for i, (y, d) in enumerate(rs)])
    )
    def prop(rows):
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {
            (r["true_lang"], r["pred_lang"]): r["n"]
            for r in naive_bayes_confusion(df, "lang", "text", "doc_id").collect()
        }
        assert got == model(rows)

    prop()
