"""Statistical-testing operators ([EXT]: the hypothesis-testing /
dependence layer over the profile aggregates in operators/aggregates.py).

Every statistic here is engineered for cross-engine exact-hash parity the
same way operators/finance.py's rolling moments are: raw doubles are fixed
to integer cents once, every accumulation is exact integer (or exact
DECIMAL) arithmetic, and the only floating-point steps are the final
correctly-rounded IEEE divisions/sqrts — so DuckDB re-deriving the same
closed forms produces bit-identical values, and the driver's value hash
genuinely verifies the math.

int64 bounds (documented, same discipline as finance.rolling_bands): with
per-row |cents| <= c and frame/group size n, ``n * sum(x^2)`` must stay
under 2^63 — at c ~ 1e8 that allows n ~ 1e6 rows per group; shrink the
cent scale for wider data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import round_half_up


def _cents(x: Column) -> Column:
    return F.floor(x * 100.0 + 0.5).cast("long")


def _prod_exact(a: Column, b: Column) -> Column:
    """Exact product of two cents-BIGINT columns in DECIMAL(38,0).

    BIGINT * BIGINT silently wraps in non-ANSI Spark above ~9.2e18 (real
    for squared cents beyond |x| ~ 3e9), while the DuckDB oracles promote
    to exact INT128 — a silently-wrong-only-on-Spark hazard.  Promoting
    one side to DECIMAL(19,0) carries the product as DECIMAL(38,0): any
    64-bit operand squares within 38 digits, so the product and its SUM
    stay exact (matching the oracle), and a true DECIMAL overflow yields
    NULL instead of a wrong value.
    """
    return a.cast("decimal(19,0)") * b.cast("decimal(19,0)")


def rolling_corr(
    pair: DataFrame,
    order_col: str,
    x: str,
    y: str,
    n_rows: int = 20,
    scale: int = 6,
) -> DataFrame:
    """Rolling Pearson correlation over an N-row trailing frame of an
    ALIGNED pair series (one row per order_col with both x and y).

    Bivariate moments accumulate in integer cents (sx, sy, sxx, syy, sxy);
    r = (n sxy - sx sy) / (sqrt(n sxx - sx^2) sqrt(n syy - sy^2)) is
    exact-integer until the two sqrts and one divide.  Zero-variance
    windows yield NULL (0/0) in both engines.

    The window is UNPARTITIONED by design: the input is a time spine
    (rows = distinct periods, independent of raw event volume — same
    scale argument as the gap-fill spine), so the single-partition sort
    is over calendar-sized data no matter how large the fact table is.
    """
    w = Window.orderBy(order_col).rowsBetween(-(n_rows - 1), 0)
    xc, yc = _cents(F.col(x)), _cents(F.col(y))
    n = F.count(F.lit(1)).over(w)
    sx, sy = F.sum(xc).over(w), F.sum(yc).over(w)
    sxx = F.sum(_prod_exact(xc, xc)).over(w)
    syy = F.sum(_prod_exact(yc, yc)).over(w)
    sxy = F.sum(_prod_exact(xc, yc)).over(w)
    num = (n * sxy - _prod_exact(sx, sy)).cast("double")
    den = F.sqrt((n * sxx - _prod_exact(sx, sx)).cast("double")) * F.sqrt(
        (n * syy - _prod_exact(sy, sy)).cast("double")
    )
    # try_divide: a zero-variance window (always true at n=1) has den=0;
    # DuckDB's double division yields NULL there, and ANSI-mode Spark
    # (4.x default, the driver's session) would otherwise raise.
    return pair.select(
        order_col,
        x,
        y,
        n.alias("n_in_window"),
        round_half_up(F.try_divide(num, den), scale).alias("rolling_corr"),
    )


def chi2_independence(
    df: DataFrame,
    row_key: Column,
    col_key: Column,
    scale: int = 6,
) -> DataFrame:
    """Chi-square statistic of independence for two categorical columns.

    One shuffle reduces the raw table to the |rows| x |cols| contingency
    grid; marginals and the grand total are windows OVER THAT GRID (a few
    dozen rows), never over raw data.  Each cell term (o-e)^2/e is one
    IEEE expression on exact integers, rounded half-up to 9dp, and the
    final sum accumulates the rounded terms in DECIMAL(38,9) — exact and
    order-independent, so the statistic hash-verifies.  Output: one row
    (chi2, dof, n_rows, n_cols, n_obs).
    """
    grid = df.groupBy(row_key.alias("r"), col_key.alias("c")).agg(
        F.count(F.lit(1)).alias("o")
    )
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    wall = Window.partitionBy()
    # _prod_exact: two multi-billion-row marginals would overflow the
    # BIGINT product (ANSI job-kill; silent wrap elsewhere) — the DECIMAL
    # product is exact and value-identical below the bound (r10 review).
    e = _prod_exact(
        F.sum("o").over(wr), F.sum("o").over(wc)
    ).cast("double") / F.sum("o").over(wall).cast("double")
    o = F.col("o").cast("double")
    term = round_half_up((o - e) * (o - e) / e, 9)
    cells = grid.select(
        "r",
        "c",
        term.alias("term"),
        F.sum("o").over(wall).alias("n_obs"),
    )
    return cells.agg(
        round_half_up(
            F.sum(F.col("term").cast("decimal(38,9)")).cast("double"), scale
        ).alias("chi2"),
        ((F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)).alias("dof"),
        F.countDistinct("r").alias("n_rows"),
        F.countDistinct("c").alias("n_cols"),
        F.max("n_obs").alias("n_obs"),
    )


def welch_z_test(
    df: DataFrame,
    group: Column,
    value: str,
    group_a: str,
    group_b: str,
    scale: int = 6,
) -> DataFrame:
    """Welch (unequal-variance) two-sample z statistic comparing the mean
    of ``value`` between two groups.

    Per-group n / sum / sum-of-squares accumulate in integer cents (one
    map-side-combinable aggregate over the filtered scan); means,
    population variances, and z come out of closed-form expressions on
    the 1-row-per-group result — exact until the final divides + sqrt.
    Output: one row (n_a, n_b, mean_a, mean_b, mean_diff, z_stat).
    """

    def side(name: str, label: str) -> DataFrame:
        xc = _cents(F.col(value))
        return (
            df.filter(group == name)
            .agg(
                F.count(F.lit(1)).alias(f"n_{label}"),
                F.sum(xc).alias(f"s1_{label}"),
                F.sum(_prod_exact(xc, xc)).alias(f"s2_{label}"),
            )
        )

    both = side(group_a, "a").crossJoin(side(group_b, "b"))

    def mean(label: str) -> Column:
        return F.col(f"s1_{label}").cast("double") / (
            100.0 * F.col(f"n_{label}")
        )

    def var(label: str) -> Column:
        n, s1, s2 = (
            F.col(f"n_{label}"),
            F.col(f"s1_{label}"),
            F.col(f"s2_{label}"),
        )
        # n*n via _prod_exact too: a multi-billion-row group's squared
        # count overflows BIGINT (r10 review); exact and value-identical.
        return (n * s2 - _prod_exact(s1, s1)).cast("double") / _prod_exact(
            n, n
        ).cast("double") / 10000.0

    # try_divide: both-groups-constant data has a zero standard error;
    # NULL there matches DuckDB (ANSI Spark would raise).
    z = F.try_divide(
        mean("a") - mean("b"),
        F.sqrt(var("a") / F.col("n_a") + var("b") / F.col("n_b")),
    )
    return both.select(
        F.col("n_a"),
        F.col("n_b"),
        round_half_up(mean("a"), scale).alias("mean_a"),
        round_half_up(mean("b"), scale).alias("mean_b"),
        round_half_up(mean("a") - mean("b"), scale).alias("mean_diff"),
        round_half_up(z, scale).alias("z_stat"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    consistency: float = 1.4826,
) -> DataFrame:
    """Robust per-group outlier detection via the median absolute deviation
    (reference parity: the robust sibling of the Tukey-fence audit in
    queries/quality_q.events_quantile_outliers; complements SURVEY §2.4's
    exact-percentile family).

    Median and MAD both use PERCENTILE_DISC semantics (the smallest data
    element with cumulative distribution >= 0.5), so every intermediate is
    a real data element — cross-engine exact with DuckDB ``quantile_disc``.
    The deviation ``|x - median|`` is a single IEEE subtract of identical
    doubles, hence itself bit-identical, and the fence
    ``k * consistency * mad`` is pure double arithmetic.

    Scale shape: two shuffles of the (group, value) projection (one per
    quantile pass — exact MAD is inherently two-pass) with the tiny
    per-group median/MAD frames BROADCAST back between passes; the final
    count is a conditional aggregate on the already-annotated stream, not
    a third pass.  At 100 TB swap percentile_disc for percentile_approx to
    collapse to sketches; this operator pins the exact anchor.
    Output: (group, median, mad, n_rows, n_outliers).
    """
    v = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("x"))
    med = v.groupBy("g").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").alias("median")
    )
    dev = v.join(F.broadcast(med), "g").withColumn(
        "d", F.abs(F.col("x") - F.col("median"))
    )
    mad = dev.groupBy("g", "median").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY d)").alias("mad")
    )
    fence = F.lit(k) * F.lit(consistency) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), ["g", "median"])
        .groupBy("g", "median", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("d") > fence, F.lit(1))).alias("n_outliers"),
        )
        .select(
            F.col("g").alias(group_col),
            "median",
            "mad",
            "n_rows",
            "n_outliers",
        )
    )


def modal_value(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact per-group mode with a deterministic tiebreak (smallest value
    among the tied-max counts) — the categorical survivorship/imputation
    primitive (SURVEY §2.4/§2.5: grouped count + ranked window compose).

    One shuffle builds the (group, value) count grid; the argmax is a
    row_number over that GRID (cardinality = distinct pairs, not rows), so
    the window never sees the raw stream.  Output: (group, mode, n_mode).
    """
    grid = (
        df.groupBy(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # asc_nulls_last: Spark's bare asc() is NULLS FIRST, but SQL engines'
    # ROW_NUMBER ... ORDER BY v ASC default to NULLS LAST — a NULL value
    # group tied at the max count would otherwise resolve to different
    # modes per engine.
    w = Window.partitionBy("g").orderBy(
        F.col("n").desc(), F.col("v").asc_nulls_last()
    )
    return (
        grid.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("v").alias("mode"),
            F.col("n").alias("n_mode"),
        )
    )


def trailing_zscore(
    spine: DataFrame,
    order_col: str,
    value_col: str,
    n_rows: int,
    min_n: int = 3,
    scale: int = 6,
) -> DataFrame:
    """Trailing-frame anomaly z-score over an ordered (usually calendar)
    spine: each row is scored against the mean/std of the PRECEDING
    ``n_rows`` rows — current row excluded, the standard leakage-free
    self-baseline for time-series anomaly detection.

    Parity discipline (same as rolling_corr): values fix to integer cents
    once, frame sums are exact (BIGINT for s1, DECIMAL(38,0) for the
    squared terms via _prod_exact — no 64-bit wrap), population variance
    comes from the
    ``(n*s2 - s1^2) / n^2`` closed form, and the only doubles are the
    final correctly-rounded divide + sqrt.  Rows with fewer than ``min_n``
    baseline points score NULL (try_divide also NULLs a zero-variance
    baseline, matching DuckDB).

    The unpartitioned window is over the AGGREGATED spine (rows = buckets,
    not events) — volume-independent at any corpus size, same argument as
    the gap-fill spine.  Output: spine columns + (n_baseline, z_score,
    is_anomaly).
    """
    frame = Window.orderBy(order_col).rowsBetween(-n_rows, -1)
    xc = _cents(F.col(value_col))
    scored = (
        spine.withColumn("xc", xc)
        .withColumn("n_baseline", F.count("xc").over(frame))
        .withColumn("s1", F.sum("xc").over(frame))
        .withColumn(
            "s2", F.sum(_prod_exact(F.col("xc"), F.col("xc"))).over(frame)
        )
    )
    n = F.col("n_baseline")
    mean_c = F.col("s1").cast("double") / n
    var_c = (
        n * F.col("s2") - _prod_exact(F.col("s1"), F.col("s1"))
    ).cast("double") / (n * n).cast("double")
    z = F.when(
        n >= min_n,
        F.try_divide(F.col("xc").cast("double") - mean_c, F.sqrt(var_c)),
    )
    return scored.select(
        *[F.col(c) for c in spine.columns],
        n.alias("n_baseline"),
        round_half_up(z, scale).alias("z_score"),
        F.when(z.isNotNull(), (F.abs(z) > 3.0).cast("int")).alias("is_anomaly"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    is_current: Column,
    bin_edges: tuple[float, ...],
    on_null: bool | str = "raise",
) -> DataFrame:
    """[EXT] Population Stability Index drift monitor: bin ``value_col``
    on FIXED edges, split rows into baseline vs current by the
    ``is_current`` predicate, and emit one row per bin with both periods'
    Laplace-smoothed shares and the bin's PSI contribution

        psi_term = (p_base - p_cur) * ln(p_base / p_cur)

    (sum of psi_term over bins is the classic PSI; > 0.25 = major drift).
    The standard production data-drift gate between a training snapshot
    and serving traffic.

    Fixed edges (not quantiles) keep the whole operator ONE
    map-side-combined aggregate over (bin, period) — bin cardinality rows
    to the driver side of the plan, nothing resident — so at 100 TB it
    costs a single scan.  Laplace add-one smoothing over the FULL bin
    count (including bins only one period populates) makes every share
    strictly positive, so ln never sees 0; shares are exact int ratios in
    IEEE doubles, reproducible cross-engine.  Output: (bin, base_cnt,
    cur_cnt, base_share, cur_share, psi_term — unrounded; callers round
    the doubles for hashing).

    Period assignment is TOTAL (round-8 advice: a NULL ``is_current`` —
    e.g. a null timestamp — used to cast to NULL and silently vanish
    from BOTH periods' sums while still being scanned).  ``on_null``
    picks the policy: the default ``"raise"`` fails the job loudly via
    an in-plan ``raise_error`` (no extra pass); ``False`` / ``True``
    bucket NULL-predicate rows into baseline / current explicitly.
    """
    n_bins = len(bin_edges) + 1
    cur = psi_period_assignment(is_current, on_null)
    counts = (
        df.select(
            psi_bin_expr(value_col, bin_edges).alias("bin"),
            cur.alias("cur"),
        )
        .groupBy("bin")
        .agg(
            F.sum(1 - F.col("cur")).cast("bigint").alias("base_cnt"),
            F.sum("cur").cast("bigint").alias("cur_cnt"),
        )
        # The totals branch below re-reads these bin-cardinality rows; the
        # lazy checkpoint shares the one aggregate instead of scanning the
        # source twice (the "single scan" in the contract above).
        .localCheckpoint(eager=False)
    )
    return psi_from_counts(counts, n_bins)


def psi_period_assignment(
    is_current: Column, on_null: bool | str = "raise"
) -> Column:
    """TOTAL period-assignment policy shared by ``psi_drift`` and the
    STREAMING PSI gate (queries/streaming_q.stream_psi_drift_equiv): the
    0/1 ``cur`` flag with NULL-predicate rows handled explicitly —
    ``"raise"`` fails in-plan, ``False``/``True`` bucket them into
    baseline/current.  Single-sourcing the policy keeps the batch
    operator, the streaming twin, and the DuckDB oracle's
    ``CASE ... ELSE 0 END`` provably aligned on any corpus."""
    cur = is_current.cast("int")
    if on_null == "raise":
        return F.when(
            is_current.isNull(),
            F.raise_error(
                F.lit(
                    "psi_drift: is_current evaluated to NULL — period "
                    "assignment must be total (pass on_null=False/True "
                    "to bucket NULL-predicate rows explicitly)"
                )
            ).cast("int"),
        ).otherwise(cur)
    if isinstance(on_null, bool):
        return F.coalesce(cur, F.lit(int(on_null)))
    raise ValueError(f"on_null must be 'raise', True or False: {on_null!r}")


def psi_bin_expr(value_col: str, bin_edges: tuple[float, ...]) -> Column:
    """Fixed-edge bin index expression shared by the batch and STREAMING
    PSI paths (bin i = first edge the value is below; last bin open)."""
    n_bins = len(bin_edges) + 1
    bin_idx: Column = F.lit(n_bins - 1)
    for i, edge in reversed(list(enumerate(bin_edges))):
        bin_idx = F.when(F.col(value_col) < F.lit(edge), F.lit(i)).otherwise(bin_idx)
    return bin_idx.cast("int")


def psi_from_counts(counts: DataFrame, n_bins: int) -> DataFrame:
    """Laplace-smoothed shares + per-bin PSI terms from a
    (bin, base_cnt, cur_cnt) frame — the tiny tail of :func:`psi_drift`,
    split out so a streaming aggregation can drain its counts into the
    identical arithmetic (stream_psi_drift_equiv)."""
    totals = counts.agg(
        F.sum("base_cnt").alias("n_base"), F.sum("cur_cnt").alias("n_cur")
    )
    withs = counts.crossJoin(F.broadcast(totals))
    p_base = (F.col("base_cnt") + 1).cast("double") / (
        F.col("n_base") + n_bins
    ).cast("double")
    p_cur = (F.col("cur_cnt") + 1).cast("double") / (
        F.col("n_cur") + n_bins
    ).cast("double")
    return withs.select(
        "bin",
        "base_cnt",
        "cur_cnt",
        p_base.alias("base_share"),
        p_cur.alias("cur_share"),
        ((p_base - p_cur) * F.log(p_base / p_cur)).alias("psi_term"),
    )


def _rank2(df: DataFrame, col: str, out: str) -> DataFrame:
    """Tie-aware DOUBLED average rank of ``col`` joined back onto every
    row: collapse to the distinct-value frame, range-partitioned prefix
    sum for the global cumulative count (no single-reducer window), then
    ``rank2 = 2*cum_below + n + 1`` — a BIGINT carrying the half-integer
    average rank exactly.  The distinct-value rank table broadcasts back
    (value-cardinality-sized, not row-sized)."""
    from aws_etl_fiap_spark.operators.sampling import ordered_prefix_sum

    g = df.groupBy(col).agg(F.count(F.lit(1)).alias("__n"))
    r = ordered_prefix_sum(g, [col], "__n", out="__cum")
    r = r.select(
        col,
        (
            F.lit(2) * (F.col("__cum") - F.col("__n")) + F.col("__n") + F.lit(1)
        ).cast("long").alias(out),
    )
    return df.join(F.broadcast(r), col)


def spearman_rho(df: DataFrame, xcol: str, ycol: str) -> DataFrame:
    """Exact tie-aware SPEARMAN rank correlation between two columns —
    Pearson on average ranks, computed on DOUBLED ranks so every moment
    is an exact integer (rank scaling cancels in the correlation):

        rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    with Sx/Sy/Sxx/Syy/Sxy summed as DECIMAL(38,0) over BIGINT rank
    products — order-independent and overflow-proof, so a DuckDB
    re-derivation is bit-identical through the one final sqrt/divide.
    Scale shape: two distinct-value rank tables (each via the two-pass
    prefix sum) broadcast onto the rows; ONE map-side-combined moment
    aggregate ends it.  Output: one row ``(rho, n)``; rho is NULL when
    either column is constant (zero variance).

    COMPLETE-CASE semantics (late-r10): rows where either column is NULL
    are dropped BEFORE ranking — textbook Spearman over the complete
    pairs.  Without the up-front filter the incomplete rows were ranked
    (shifting the survivors' x-ranks non-uniformly) and then silently
    vanished at the null-unsafe rank join, making the statistic
    ASYMMETRIC in (x, y) on NULL-bearing data."""
    df = df.select(xcol, ycol).filter(
        F.col(xcol).isNotNull() & F.col(ycol).isNotNull()
    )
    ranked = _rank2(_rank2(df, xcol, "__rx"), ycol, "__ry")
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d("__rx")).cast("decimal(38,0)").alias("sx"),
        F.sum(d("__ry")).cast("decimal(38,0)").alias("sy"),
        F.sum(d("__rx") * d("__rx")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d("__ry") * d("__ry")).cast("decimal(38,0)").alias("syy"),
        F.sum(d("__rx") * d("__ry")).cast("decimal(38,0)").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = nd * sxy - sx * sy
    den = F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
    return m.select(
        round_half_up(
            F.when(den > 0.0, num / den).otherwise(F.lit(None)), 6
        ).alias("rho"),
        "n",
    )


def gini_by_group(
    df: DataFrame, group_col: str, value_col: str, cents_scale: int = 100
) -> DataFrame:
    """Exact tie-aware GINI coefficient of a non-negative fixed-point
    column per group — the concentration diagnostic behind skew triage
    (which segments' revenue is dominated by a few orders?) and data-mix
    audits:

        G = (sum_i r2_i * x_i - (n+1) * sum_i x_i) / (n * sum_i x_i)

    with ``r2`` the DOUBLED tie-aware average rank (the AUC/Spearman
    integer trick) and ``x`` the value in integer cents — every moment an
    exact DECIMAL(38,0) sum, one final double divide, 6 dp at output.

    Scale shape: rows collapse to the per-group distinct-VALUE frame; the
    rank window partitions by group over that grid (value-grid-sized keys,
    never the row stream); one map-side-combined moment aggregate per
    group ends it.  Groups with zero total value report NULL.

    NULL values are dropped up front (late-r10): they used to count into
    ``n`` while vanishing from the moment sums (F.sum skips NULL), and the
    engines even rank them on opposite ends (Spark ASC is NULLS FIRST,
    DuckDB NULLS LAST) — complete-case is the only cross-engine-exact
    semantics."""
    cents = F.floor(
        F.col(value_col).cast("double") * F.lit(float(cents_scale)) + F.lit(0.5)
    ).cast("long")
    g = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), cents.alias("x"))
        .groupBy("grp", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("x")
    r = g.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "r2",
        (F.lit(2) * (F.col("cum") - F.col("cnt")) + F.col("cnt") + F.lit(1)).cast(
            "long"
        ),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = r.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(d("cnt") * d("x")).cast("decimal(38,0)").alias("sx"),
        F.sum(d("cnt") * d("r2") * d("x")).cast("decimal(38,0)").alias("srx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    srx = F.col("srx").cast("double")
    gini = (srx - (nd + F.lit(1.0)) * sx) / (nd * sx)
    from aws_etl_fiap_spark.functions.parity import round_half_up

    return m.select(
        F.col("grp").alias(group_col),
        "n",
        round_half_up(F.when(F.col("sx") > 0, gini), 6).alias("gini"),
    )
