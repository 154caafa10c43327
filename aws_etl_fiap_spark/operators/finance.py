"""Market-data analytics operators ([EXT], domain-faithful to the reference:
the reference pipeline ingests B3 stock quotes via yfinance and computes
monthly price summaries + lag indicators, b3_collector.py:34-120 /
b3_transform.py:240-383.  These operators extend that surface with the
standard market-data constructs a quote warehouse computes downstream —
OHLC candlestick bars, VWAP, Bollinger bands, drawdown/cumulative return —
re-expressed as single-shuffle Spark aggregations and window chains.

Numeric-parity design (the driver hash-compares against DuckDB):

- OHLC open/close are SELECTIONS (``min_by``/``max_by`` under a unique
  (ts, tiebreak) total order), not arithmetic — bit-identical anywhere.
- Sums ride :func:`functions.parity.dec_sum` (exact decimal accumulate,
  order-independent).
- Rolling moments (Bollinger) accumulate in INTEGER cents: the 20-row
  rolling ``sum(x)``/``sum(x*x)`` stays exact in int64, and the variance
  ``(n*s2 - s1^2) / n^2`` is one exact-integer expression followed by one
  IEEE divide + sqrt — the same correctly-rounded ops in every engine.
  int64 bounds: the binding constraints are the DERIVED terms ``n*s2``
  and ``s1^2`` (not s2 itself) — for a 20-row frame both stay under 2^63
  when |x| <= ~1.5e8 cents (~$1.5M per value); beyond that, ANSI mode
  fails loudly with ARITHMETIC_OVERFLOW rather than silently wrapping.
  Lower the cent scale (or the window width) for wider-valued series.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, round_half_up


def ohlc_bars(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    value: str,
    bucket: Column,
) -> DataFrame:
    """Candlestick bars per (key, bucket): open/high/low/close + exact
    traded-value total and trade count.

    One shuffle: ``min_by``/``max_by`` over the unique ``(ts, tiebreak)``
    struct order are ordinary aggregate buffers with map-side partial
    merge — no window, no second pass, no per-bucket sort.  At 100 TB the
    plan is a single hash aggregate whose state is O(1) per (key, bucket).
    """
    order = F.struct(F.col(ts), F.col(tiebreak))
    return df.groupBy(F.col(key), bucket.alias("bar")).agg(
        F.min_by(F.col(value), order).alias("open"),
        F.max(value).alias("high"),
        F.min(value).alias("low"),
        F.max_by(F.col(value), order).alias("close"),
        dec_sum(value, 2).alias("traded_value"),
        F.count(F.lit(1)).alias("n_trades"),
    )


def vwap(
    df: DataFrame,
    keys: Sequence[str],
    price_total: str,
    quantity: str,
    scale: int = 4,
) -> DataFrame:
    """Volume-weighted average price per key group.

    ``price_total`` is the already-extended row total (price x qty, e.g.
    l_extendedprice); VWAP = sum(total) / sum(qty), both sums exact
    decimals, one rounded IEEE division at the end.  Single shuffle,
    map-side combinable.
    """
    return df.groupBy(*keys).agg(
        round_half_up(
            F.try_divide(dec_sum(price_total, 2), dec_sum(quantity, 2)), scale
        ).alias("vwap"),
        dec_sum(price_total, 2).alias("total_value"),
        dec_sum(quantity, 2).alias("total_qty"),
        F.count(F.lit(1)).alias("n_fills"),
    )


def _cents(x: Column) -> Column:
    """Round-half-up a double to integer cents (exact int64 thereafter)."""
    return F.floor(x * 100.0 + 0.5).cast("long")


def rolling_bands(
    daily: DataFrame,
    key: str,
    order_col: str,
    value: str,
    n_rows: int = 20,
    n_std: float = 2.0,
    scale: int = 4,
) -> DataFrame:
    """SMA + Bollinger bands over an N-row trailing frame, parity-safe.

    ``value`` (double) is fixed to integer cents once; the frame then
    accumulates ``s1 = sum(cents)`` and ``s2 = sum(cents^2)`` — exact
    int64 arithmetic in any engine.  Mean and population variance come out
    of one closed-form integer expression each, so the only IEEE ops are
    the final divisions and one sqrt (correctly rounded everywhere):

        mean = s1 / (100 n)          var = (n s2 - s1^2) / (100 n)^2

    Scale shape: a per-key ordered window over the PRE-AGGREGATED daily
    frame (rows = keys x days, independent of raw event volume); the raw
    table never sorts.
    """
    w = Window.partitionBy(key).orderBy(order_col).rowsBetween(-(n_rows - 1), 0)
    xc = _cents(F.col(value))
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(xc).over(w)
    s2 = F.sum(xc * xc).over(w)
    mean = s1.cast("double") / (100.0 * n)
    var = (n * s2 - s1 * s1).cast("double") / (n * n).cast("double") / 10000.0
    std = F.sqrt(var)
    return daily.select(
        key,
        order_col,
        value,
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        round_half_up(mean, scale).alias("sma"),
        round_half_up(mean + n_std * std, scale).alias("bb_upper"),
        round_half_up(mean - n_std * std, scale).alias("bb_lower"),
    )


def drawdown(
    daily: DataFrame,
    key: str,
    order_col: str,
    value: str,
    scale: int = 6,
) -> DataFrame:
    """Running peak, drawdown-from-peak, and cumulative return per key.

    Peak and first value are exact SELECTIONS over the running /
    unbounded window; the two ratios are single IEEE divisions rounded
    half-up — no accumulation in floating point anywhere.
    """
    run = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value)
    peak = F.max(value).over(run)
    first = F.first(value).over(run)
    # try_divide: an all-zero-prefix series has peak/first = 0; NULL there
    # matches DuckDB's zero-division double semantics (ANSI Spark raises).
    return daily.select(
        key,
        order_col,
        value,
        peak.alias("running_peak"),
        round_half_up(F.try_divide(peak - v, peak), scale).alias("drawdown_pct"),
        round_half_up(F.try_divide(v, first) - 1.0, scale).alias("cum_return_pct"),
    )


def ewma_volatility(
    daily: DataFrame,
    key: str,
    order_col: str,
    value: str,
    lam: float = 0.94,
    n_rows: int = 20,
    scale: int = 8,
) -> DataFrame:
    """RiskMetrics-style EWMA volatility of the simple-return series of
    ``value`` per key: ``sigma_t = sqrt(norm * sum_j lam^j * r_{t-j}^2)``
    over the trailing ``n_rows`` returns, with the truncated-geometric
    normalizer ``norm = (1-lam) / (1-lam^n_rows)`` so the weights sum to 1.

    Parity design (the oracle re-derives the identical chain): the
    ``lam^j`` weights and the normalizer are computed ONCE in driver
    Python and embedded as double literals on both engines; the weighted
    sum is a fixed-length left-associated chain of ``lag(r^2, j) * w_j``
    terms, so every IEEE add happens in the same order everywhere; the
    only rounding is the final half-up to ``scale``.  Rows with fewer than
    ``n_rows`` trailing returns are suppressed (partial windows would need
    per-row normalizers — a CASE ladder, not clearer, and rarely wanted).

    Scale shape: one shuffle on the (already pre-aggregated) daily frame's
    key, then a single window projection — the ``n_rows`` lags share one
    sort, and no state beyond the frame is kept.
    """
    w = Window.partitionBy(key).orderBy(order_col)
    d = F.col(value).cast("double")
    prev = F.lag(d, 1).over(w)
    # try_divide: NULL on a zero previous value, matching DuckDB's double
    # semantics (ANSI Spark would raise); NULL returns are dropped.
    with_ret = daily.select(
        key, order_col, F.try_divide(d - prev, prev).alias("ret")
    ).filter(F.col("ret").isNotNull())
    r2 = with_ret.withColumn("r2", F.col("ret") * F.col("ret"))
    acc: Column | None = None
    for j in range(n_rows):
        term = F.lag("r2", j).over(w) * F.lit(lam**j)
        acc = term if acc is None else acc + term
    norm = (1.0 - lam) / (1.0 - lam**n_rows)
    out = r2.select(
        key,
        order_col,
        "ret",
        F.row_number().over(w).alias("__rn"),
        round_half_up(F.sqrt(acc * F.lit(norm)), scale).alias("ewma_vol"),
    )
    return out.filter(F.col("__rn") >= n_rows).drop("__rn")
