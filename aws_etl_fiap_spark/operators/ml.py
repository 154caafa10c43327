"""Distributed iterative model TRAINING as aggregates ([EXT] north star).

The reference has no ML surface; this extends the engine the same way
kmeans_lloyd (operators/similarity.py) and ml_ols_closed_form (stats_q.py)
do: the heavy per-row work is ONE map-side-combined aggregate per
iteration, model state is a handful of scalars on the driver (broadcast
back as literals), and every arithmetic step is engine-agnostic (quantized
transcendentals + exact decimal sums) so the full training TRAJECTORY can
be hash-verified against a DuckDB re-derivation — not just smoke-tested.

Cross-engine determinism contract (shared with the oracle renderer in
queries/stats_q.py):
- the sigmoid is quantized to 12 dp (round-half-up) the moment it is
  computed — libm/Math.exp differ in the last ulp, the quantization
  absorbs it;
- per-row gradient contributions are quantized to 9 dp and summed in
  DECIMAL(38,9): exact, order-independent, identical on both engines;
- weights are re-quantized to 12 dp after every update, so the literals
  the next iteration broadcasts are the same doubles DuckDB's unrolled
  CTE chain computes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, round_half_up


def logreg_train_gd(
    df: DataFrame,
    label: Column,
    features: list[Column],
    lr: float = 1.5,
    iters: int = 3,
) -> DataFrame:
    """Full-batch gradient-descent LOGISTIC REGRESSION — the distributed
    shape of the fasttext-style quality-classifier training step every
    large pre-training pipeline runs (label quality/domain, fit a linear
    model, filter by predicted probability).

    Each iteration is ONE aggregate over the feature frame computing the
    d+1 gradient sums  g_k = sum((sigmoid(w.x) - y) * x_k)  plus the
    incoming weights' training accuracy; the weight update
    ``w_k <- r12(w_k - lr * (g_k / n))`` is driver-side scalar arithmetic
    (the model is d+1 doubles — kilobytes at any corpus size).  The
    feature frame is localCheckpoint'ed once, so training scans the corpus
    once and every iteration re-reads the materialized (y, x1..xd) rows.

    Returns one row per iteration: (iter, b0..bd after that update,
    n_correct of those weights on the training frame) — the whole
    trajectory, pinned.  ``iters + 1`` aggregates total (the extra pass
    scores the final weights).
    """
    d = len(features)
    feats = df.select(
        label.cast("int").alias("y"),
        *[c.cast("double").alias(f"x{i + 1}") for i, c in enumerate(features)],
    )
    # Rows with a NULL label or feature are EXCLUDED (documented): they
    # would be counted in n but skipped by the gradient sums, silently
    # shrinking every update by the null fraction (and scoring as
    # 'incorrect' in n_correct).
    cond = F.col("y").isNotNull()
    for i in range(d):
        cond = cond & F.col(f"x{i + 1}").isNotNull()
    feats = feats.filter(cond).localCheckpoint(eager=True)

    def r12(v: float) -> float:
        return math.floor(v * 1.0e12 + 0.5) / 1.0e12

    w = [0.0] * (d + 1)
    rows: list[list] = []
    for it in range(1, iters + 2):
        z: Column = F.lit(w[0])
        for i in range(d):
            z = z + F.lit(w[i + 1]) * F.col(f"x{i + 1}")
        sigq = round_half_up(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 12)
        err = sigq - F.col("y")
        aggs = [
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(
                F.when((sigq >= 0.5) == (F.col("y") == 1), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        ]
        if it <= iters:
            aggs.append(dec_sum(round_half_up(err, 9), 9).alias("g0"))
            for i in range(d):
                aggs.append(
                    dec_sum(round_half_up(err * F.col(f"x{i + 1}"), 9), 9).alias(
                        f"g{i + 1}"
                    )
                )
        row = feats.agg(*aggs).collect()[0]
        if not float(row["n"]):
            # an empty (or all-null) training frame would TypeError on the
            # NULL gradient sums and divide by zero — fail with the cause
            raise ValueError(
                "logreg_train_gd: no trainable rows (empty frame, or every "
                "row has a NULL label/feature)"
            )
        if it >= 2:
            # this pass scored the PREVIOUS update's weights
            rows[it - 2][-1] = int(row["n_correct"])
        if it <= iters:
            n = float(row["n"])
            w = [r12(w[k] - lr * (float(row[f"g{k}"]) / n)) for k in range(d + 1)]
            rows.append([it, *w, 0])
    schema = (
        "iter int, "
        + ", ".join(f"b{k} double" for k in range(d + 1))
        + ", n_correct bigint"
    )
    return df.sparkSession.createDataFrame(
        [tuple(r) for r in rows], schema
    )


def logreg_score(features: list[Column], weights: list[float]) -> Column:
    """Predicted probability under FIXED weights — the inference half of
    :func:`logreg_train_gd`, with the identical 12dp-quantized sigmoid so
    a scored corpus is hash-reproducible across engines.  ``weights`` is
    ``[b0, b1..bd]`` (the trainer's trajectory row); the model rides into
    the plan as literals — a pure whole-stage-codegen projection, no join,
    no shuffle, no state."""
    if len(weights) != len(features) + 1:
        raise ValueError(
            f"expected {len(features) + 1} weights (bias + one per feature), "
            f"got {len(weights)}"
        )
    z: Column = F.lit(weights[0])
    for i, c in enumerate(features):
        z = z + F.lit(weights[i + 1]) * c.cast("double")
    return round_half_up(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 12)


def exact_auc(df: DataFrame, label: Column, score: Column) -> DataFrame:
    """Exact ROC-AUC over a scored corpus by the Mann-Whitney rank-sum
    identity with AVERAGE ranks for tied scores — the evaluation half of
    the quality-classifier loop (train -> score -> filter needs a
    held-out-quality number before anyone trusts the filter).

        AUC = (sum_{positives} rank_i - P(P+1)/2) / (P * N)

    Every intermediate is an INTEGER until one final double divide, so a
    DuckDB re-derivation is bit-identical with no decimal/rounding
    machinery: collapsing to the distinct-score frame makes the average
    rank of a tie group ``cum_below + (n+1)/2`` — a half-integer — so the
    doubled rank ``rank2 = 2*cum_below + n + 1`` is a BIGINT and
    ``sum(npos * rank2)`` (DECIMAL(38,0), overflow-proof at any corpus
    size) carries the whole statistic exactly.

    Scale shape: one hash aggregate collapses N rows to the distinct-score
    frame; the global rank comes from the range-partitioned two-pass
    prefix sum (operators/sampling.ordered_prefix_sum — no single-reducer
    window); one map-side-combined total ends it.  Nothing driver-sized
    beyond the per-partition offset list.

    Output: one row ``(auc, n_pos, n_neg)`` with ``auc`` rounded half-up
    to 6 dp.
    """
    from aws_etl_fiap_spark.operators.sampling import ordered_prefix_sum

    g = (
        df.select(score.alias("score"), label.cast("int").alias("y"))
        # Unscoreable rows are EXCLUDED (documented): a NULL score would
        # rank NULLS FIRST in Spark but NULLS LAST in a SQL twin's window,
        # shifting every rank — and a NULL label is not a class vote.
        .filter(F.col("score").isNotNull() & F.col("y").isNotNull())
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("npos"),
        )
    )
    r = ordered_prefix_sum(g, ["score"], "n", out="cum_n")
    rank2 = (
        F.lit(2) * (F.col("cum_n") - F.col("n")) + F.col("n") + F.lit(1)
    ).cast("long")
    t = r.select(
        (F.col("npos").cast("decimal(38,0)") * rank2).alias("pr2"),
        "npos",
        "n",
    ).agg(
        F.sum("pr2").cast("decimal(38,0)").alias("s"),
        F.sum("npos").cast("long").alias("p"),
        F.sum("n").cast("long").alias("tot"),
    )
    sd = F.col("s").cast("double")
    pd_ = F.col("p").cast("double")
    nd = (F.col("tot") - F.col("p")).cast("double")
    auc = (sd - pd_ * (pd_ + F.lit(1.0))) / (F.lit(2.0) * pd_ * nd)
    # A single-class corpus has no ranking to measure: AUC is UNDEFINED —
    # NULL, never the silent Infinity/NaN a double 0-divide produces.
    auc = F.when((pd_ > 0) & (nd > 0), auc)
    return t.select(
        round_half_up(auc, 6).alias("auc"),
        F.col("p").alias("n_pos"),
        (F.col("tot") - F.col("p")).cast("long").alias("n_neg"),
    )


def naive_bayes_confusion(
    df: DataFrame,
    label_col: str,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Multinomial NAIVE BAYES trained and evaluated in one pass — the
    classic counts-only baseline classifier of language/domain curation
    (fasttext's ancestor), next to the gradient-trained logistic model:
    Laplace-smoothed word likelihoods per class, log-prior plus
    log-likelihood argmax per document, released as the (true, predicted)
    CONFUSION MATRIX.

    Cross-engine exactness: the model is nothing but integer counts, so
    only the logs are float — each ``logp`` quantizes to 9 dp the moment
    it is taken (the ml.py contract), per-word contributions are
    ``count * logp`` products of a BIGINT and a 9dp fixed-point value
    (exact in DECIMAL(38,9)), and the per-(doc, class) score is an exact
    decimal SUM — order-independent, so the argmax (ties to the
    lexicographically first class) is bit-reproducible by a SQL twin.

    Scale shape: the corpus collapses to (doc, word, count) once; the
    class-word likelihood table is vocab-x-k and broadcasts — the same
    vocab-sized-model-state bound as the BPE/bigram-LM families (fine for
    natural-language vocabularies; a corpus whose distinct-token count
    approaches the broadcast ceiling needs the sort-merge variant of the
    scoring join instead); scoring fans each doc-word row k ways (k =
    class count, a handful) and combines map-side; no window wider than
    the k-row per-doc argmin struct."""
    docs = df.select(
        F.col(id_col).alias("doc"),
        F.col(label_col).alias("y"),
        F.col(text_col).alias("text"),
    )
    # localCheckpoint: this collapsed frame feeds FIVE consumers (class
    # counts, class totals, vocabulary, and both sides of scoring) — left
    # lazy, each consumer re-tokenizes the corpus (the plan audit showed
    # 10 scans of documents).  Same lazy-checkpoint rationale as
    # dedup.ngram_jaccard_pairs' postings.
    dw = (
        docs.select("doc", "y", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc", "y", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    cw = dw.groupBy(F.col("y").alias("c"), "w").agg(
        F.sum("cnt").cast("long").alias("ccnt")
    )
    ctot = cw.groupBy("c").agg(F.sum("ccnt").cast("long").alias("tot"))
    vocab = dw.select("w").distinct().agg(F.count(F.lit(1)).alias("v"))
    priors = (
        docs.groupBy(F.col("y").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("nc"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))

    den = (F.col("tot") + F.col("v")).cast("double")
    classes = (
        ctot.crossJoin(F.broadcast(vocab))
        .join(F.broadcast(priors), "c")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "c",
            round_half_up(
                F.log(F.col("nc").cast("double") / F.col("n").cast("double")), 9
            ).cast("decimal(12,9)").alias("logprior"),
            round_half_up(F.log(F.lit(1.0) / den), 9)
            .cast("decimal(12,9)").alias("logp0"),
            F.col("tot"),
            F.col("v"),
        )
        # a k-row frame consumed by TWO broadcasts below (the likelihood
        # build and scoring) — without the checkpoint each broadcast
        # re-runs the whole ctot/vocab/priors/n_docs lineage, one
        # redundant corpus pass per call
        .localCheckpoint(eager=False)
    )
    like = (
        cw.join(F.broadcast(classes.select("c", "tot", "v")), "c")
        .select(
            "c",
            "w",
            round_half_up(
                F.log(
                    (F.col("ccnt") + F.lit(1)).cast("double")
                    / (F.col("tot") + F.col("v")).cast("double")
                ),
                9,
            ).cast("decimal(12,9)").alias("logp"),
        )
    )
    scored = (
        dw.crossJoin(F.broadcast(classes.select("c", "logprior", "logp0")))
        .join(F.broadcast(like), ["c", "w"], "left")
        .select(
            "doc",
            F.col("y").alias("true_lang"),
            "c",
            "logprior",
            # (10,0) x (12,9) -> DECIMAL(23,9): exact, and small enough
            # that Spark never hits the precision-38 ceiling that silently
            # cuts multiplication scale (adjustPrecisionScale).
            (
                F.col("cnt").cast("decimal(10,0)")
                * F.coalesce(F.col("logp"), F.col("logp0"))
            ).alias("contrib"),
        )
    )
    per_class = scored.groupBy("doc", "true_lang", "c", "logprior").agg(
        F.sum("contrib").alias("ll")
    )
    score = (F.col("logprior") + F.col("ll")).alias("score")
    best = (
        per_class.select(
            "doc",
            "true_lang",
            F.struct((-score).alias("ns"), F.col("c").alias("c")).alias("s"),
        )
        .groupBy("doc", "true_lang")
        .agg(F.min("s").alias("m"))
    )
    return (
        best.groupBy(
            F.col("true_lang"), F.col("m.c").alias("pred_lang")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
