"""Privacy-preserving release operators ([EXT]: the de-identification pass
a training-data pipeline runs before a corpus leaves its trust boundary —
complements operators/text.redact_pii, which scrubs IN-ROW identifiers;
these enforce GROUP-level guarantees).

k-anonymity (public Sweeney/Samarati model): a released row must be
indistinguishable from at least k-1 others on its quasi-identifier tuple.
Enforcement here is generalize-then-suppress:

- :func:`generalize_band` coarsens a numeric quasi-identifier onto a fixed
  grid (the standard value-generalization hierarchy step) as a pure
  projection;
- :func:`k_anonymize` drops every row whose quasi-identifier group has
  fewer than k members.

Spark shape: one groupBy on the quasi columns produces the (tiny)
violating-group set; rows are filtered by a JOIN against it rather than a
window count — the group-count frame is bounded by the quasi-space
cardinality, broadcasts, and the corpus is never shuffled (a
count-over-window would shuffle every row by quasi key).  The suppression
summary (how many rows/groups were dropped) comes from the same count
frame for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _null_safe_anti(df: DataFrame, violators: DataFrame, qc: Sequence[str]) -> DataFrame:
    """LEFT ANTI join that matches NULL keys null-safely.

    groupBy puts all NULL quasi values in ONE equivalence class, but a
    name-list anti-join matches with plain equality — NULL never equals
    NULL, so a NULL-keyed VIOLATING class sailed through the release
    (found by the r10 privacy-ladder model property: a (NULL, 0) class of
    size 1 survived k=2 suppression).  The suppression probe must match
    with the same null semantics the class counting used."""
    v = violators.select(*[F.col(c).alias(f"__v_{c}") for c in qc])
    cond = F.lit(True)
    for c in qc:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__v_{c}"))
    return df.join(F.broadcast(v), cond, "left_anti")


def generalize_band(col: Column | str, width: float) -> Column:
    """Left edge of the value's generalization band (floor onto a fixed
    grid): 0 <= x < width -> 0, width <= x < 2*width -> width, ...
    Exact for the fixed-point inputs this is meant for (money, ages)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / F.lit(width)) * F.lit(width)).cast("double")


def quasi_group_counts(df: DataFrame, quasi_cols: Sequence[str]) -> DataFrame:
    """(quasi tuple, n) — the equivalence-class size frame k-anonymity is
    defined over.  Bounded by the quasi-space cardinality, not rows."""
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))


def k_anonymize(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Rows whose quasi-identifier group has >= k members; the rest are
    suppressed.  The violating-group set is usually tiny (that is why the
    rows are suppressible at all), so it broadcasts as an anti-join
    probe; the retained majority streams through unshuffled."""
    if k < 1:
        raise ValueError("k must be >= 1")
    qc = list(quasi_cols)
    violators = quasi_group_counts(df, qc).filter(F.col("n") < k).select(*qc)
    return _null_safe_anti(df, violators, qc)


def l_diversify(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str, k: int, l: int
) -> DataFrame:
    """Rows whose quasi-identifier group has >= k members AND >= l distinct
    values of ``sensitive_col`` (distinct l-diversity, Machanavajjhala et
    al. 2007 — the standard hardening of k-anonymity against homogeneity
    attacks: a class where every member shares the sensitive value leaks it
    even at k).

    Same release shape as :func:`k_anonymize`: ONE groupBy over the quasi
    columns computes (n, n_distinct_sensitive) per equivalence class —
    bounded by the quasi-space cardinality, not rows — the violating-class
    set broadcasts, and the corpus streams through a left_anti join
    unshuffled."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if l < 1:
        raise ValueError("l must be >= 1")
    qc = list(quasi_cols)
    classes = df.groupBy(*qc).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive_col).alias("n_sens"),
    )
    violators = classes.filter(
        (F.col("n") < k) | (F.col("n_sens") < l)
    ).select(*qc)
    return _null_safe_anti(df, violators, qc)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    *,
    seed: str,
) -> DataFrame:
    """Laplace-noised histogram release (Dwork et al.'s mechanism for
    counting queries, sensitivity 1): per-group counts plus Laplace(1/eps)
    noise, with the noise draw DERANDOMIZED through the portable-md5 hash
    of (seed, group key) so the release is reproducible across engines and
    re-runs — the same seeded-mechanism discipline as the epoch-shuffle
    and sampling operators (a re-run must not spend fresh privacy budget
    by redrawing noise for the same release).

    SEED CONTRACT (round-8 advice): because the noise is a deterministic
    function of (seed, group key), anyone who knows the seed can
    recompute and subtract it — so the epsilon-DP guarantee holds ONLY if
    ``seed`` is a secret drawn fresh per release and never published.
    There is deliberately NO default seed (a fixed public default would
    make every release trivially denoisable).  With a public seed — as in
    this repo's oracle-gated benchmark queries, where the oracle must
    re-derive the identical draw — the output is a reproducible
    noised-release FIXTURE, not a privacy guarantee.

    The draw: the 60-bit portable hash maps to u on a symmetric
    (0, 1) grid of 10^6 steps (never exactly 0 — ln never sees 0), then
    through the Laplace inverse CDF ``-b * sign(u - 1/2) *
    ln(1 - 2*|u - 1/2|)``.  Only the noisy count is released (the true
    count stays inside the plan), rounded to 6 dp for cross-engine
    hashing.

    Scale shape: ONE map-side-combined aggregate over the corpus; the
    hash/noise arithmetic runs on the group frame, which is bounded by the
    group-space cardinality, not rows.  Pair with :func:`k_anonymize` /
    :func:`l_diversify` for row releases; this is the aggregate-release
    side of the privacy surface."""
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    from aws_etl_fiap_spark.operators.dedup import portable_hash60

    gc = list(group_cols)
    counts = df.groupBy(*gc).agg(F.count(F.lit(1)).alias("__n"))
    # INJECTIVE hash input (r10 review): portable_hash60 joins its inputs
    # with ':' and concat_ws SKIPS NULLs, so with >= 2 group columns the
    # distinct keys ('x', 'y:z') / ('x:y', 'z') — or symmetric NULL
    # placements — hashed IDENTICALLY: two groups drew the SAME Laplace
    # noise, and publishing both noisy counts reveals their exact
    # difference (the noise cancels) — a real leak for keys that embed
    # free text.  Escape each column (~ -> ~t, : -> ~c, NULL -> ~n) so the
    # joined form is injective; the escape is the IDENTITY on values
    # without '~'/':'/'NULL', so clean-keyed releases (and the oracle
    # gate) are byte-identical to the historical draw.
    def _esc(c: str) -> Column:
        s = F.col(c).cast("string")
        s = F.replace(s, F.lit("~"), F.lit("~t"))
        s = F.replace(s, F.lit(":"), F.lit("~c"))
        return F.coalesce(s, F.lit("~n"))

    u = (
        (portable_hash60(F.lit(seed), *[_esc(c) for c in gc])
         % F.lit(1_000_000)).cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    from aws_etl_fiap_spark.functions.parity import round_half_up

    noisy = F.col("__n").cast("double") + noise
    return counts.select(
        *gc, round_half_up(noisy, 6).alias("noisy_count")
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """One-row release audit: group/row totals, suppressed counts, and the
    smallest surviving group (>= k by construction, or NULL if nothing
    survives)."""
    counts = quasi_group_counts(df, quasi_cols)
    return counts.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(0))
        .cast("long")
        .alias("suppressed_groups"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
        .cast("long")
        .alias("suppressed_rows"),
        F.min(F.when(F.col("n") >= k, F.col("n"))).alias("min_kept_group"),
    )


def t_closeness_release(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """t-CLOSENESS release gate (Li et al. 2007 — the third rung of the
    k-anonymity ladder): an equivalence class may be released only if its
    sensitive-attribute distribution is within variational distance
    ``t = t_num/t_den`` of the GLOBAL distribution — the defense against
    the skewness/similarity attacks l-diversity misses (a class can hold
    l distinct values that are all damaging).

    Exactness: the distance (1/2)*sum_v |p_v - q_v| is evaluated over the
    COMMON DENOMINATOR —

        sum_v |cnt_vc * N - g_v * n_c|   (an integer!)
        ---------------------------------
                 2 * n_c * N

    with the absent-value tail folded in closed form
    (``n_c * (N - sum_present g_v)``), so the release decision is a pure
    integer comparison ``t_den * S <= 2 * t_num * n_c * N`` in
    DECIMAL(38,0) — no float enters the gate, and the reported distance
    rounds to 6 dp only at output.

    Scale shape: one (quasi, v) aggregate bounded by the class-value
    grid, the global value table and the class-size table broadcast; the
    corpus is scanned once.  Output per released class: the quasi
    columns, n, and the distance."""
    if t_num < 0 or t_den <= 0:
        raise ValueError("t must be a non-negative rational t_num/t_den")
    qc = list(quasi_cols)
    base = df.select(*qc, F.col(sensitive_col).alias("v"))
    g = base.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("gv"))
    n_total = base.count()
    cvc = base.groupBy(*qc, "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    nc = cvc.groupBy(*qc).agg(F.sum("cnt").cast("long").alias("n"))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731

    # NULL-SAFE joins throughout: groupBy treats NULL as a regular value
    # (a NULL sensitive value is a real point of the distribution, a NULL
    # quasi value a real equivalence class), so the equi-joins that carry
    # the per-value and per-class frames back together must match NULL
    # keys too — plain `=` would silently drop every NULL-v term from the
    # distance and lose NULL-keyed classes outright (same defect class as
    # the k-anonymity suppression probe, r10 privacy-ladder property).
    def nsafe(left_cols, right_cols):
        cond = F.lit(True)
        for lc, rc in zip(left_cols, right_cols):
            cond = cond & F.col(lc).eqNullSafe(F.col(rc))
        return cond

    g_a = g.select(F.col("v").alias("__g_v"), "gv")
    nc_a = nc.select(
        *[F.col(c).alias(f"__n_{c}") for c in qc], "n"
    )
    parts = (
        cvc.join(F.broadcast(g_a), F.col("v").eqNullSafe(F.col("__g_v")))
        .join(F.broadcast(nc_a), nsafe(qc, [f"__n_{c}" for c in qc]))
        .select(
            *qc,
            F.abs(d("cnt") * F.lit(n_total) - d("gv") * F.col("n")).alias(
                "term"
            ),
            "gv",
        )
    )
    cls = parts.groupBy(*qc).agg(
        F.sum("term").cast("decimal(38,0)").alias("sp"),
        F.sum("gv").cast("long").alias("gp"),
    )
    rel = cls.join(
        F.broadcast(nc_a), nsafe(qc, [f"__n_{c}" for c in qc])
    ).select(
        *qc,
        "n",
        (F.col("sp") + d("n") * (F.lit(n_total) - F.col("gp"))).alias("s"),
    )
    released = rel.filter(
        F.col("s") * F.lit(t_den) <= d("n") * F.lit(2 * t_num * n_total)
    )
    dist = F.col("s").cast("double") / (
        F.lit(2.0) * F.col("n").cast("double") * F.lit(float(n_total))
    )
    from aws_etl_fiap_spark.functions.parity import round_half_up

    return released.select(*qc, "n", round_half_up(dist, 6).alias("dist"))
