"""Market-data analytics queries ([EXT], the reference's own domain: its
pipeline ingests B3 stock quotes and computes monthly summaries + lag
indicators, b3_collector.py:34-120 / b3_transform.py:240-383.  These
extend that surface with the standard downstream quote-warehouse
constructs — OHLC bars, VWAP, Bollinger bands, drawdown — over the
driver's events/lineitem tables, all exact-hash oracled (see
operators/finance.py for the numeric-parity design)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import sql_dec_sum
from aws_etl_fiap_spark.operators.finance import (
    drawdown,
    ohlc_bars,
    rolling_bands,
    vwap,
)
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

# DuckDB view exposes parquet nanos; truncate to micros exactly like the
# Spark read path (same convention as the funnel/cohort oracles).
_TS = "CAST(ts AS TIMESTAMP)"

_OHLC_FRAME = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"


@query(
    "fin_ohlc_daily_bars",
    oracle=f"""
WITH w AS (
    SELECT event_type, CAST({_TS} AS DATE) AS bar, value,
           first_value(value) OVER (PARTITION BY event_type, CAST({_TS} AS DATE)
               ORDER BY {_TS}, event_id {_OHLC_FRAME}) AS open_v,
           last_value(value) OVER (PARTITION BY event_type, CAST({_TS} AS DATE)
               ORDER BY {_TS}, event_id {_OHLC_FRAME}) AS close_v
    FROM events
)
SELECT event_type, bar,
       MIN(open_v) AS open, MAX(value) AS high, MIN(value) AS low,
       MIN(close_v) AS close,
       {sql_dec_sum('value', 2)} AS traded_value,
       COUNT(*) AS n_trades
FROM w GROUP BY event_type, bar
""",
)
def fin_ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W1 generalized] Daily OHLC candlestick bars per event_type —
    the quote-warehouse primitive downstream of the reference's raw price
    feed.  open/close are min_by/max_by selections under the unique
    (ts, event_id) order, so ONE hash aggregate (no window over the raw
    stream, no per-day sort) produces the whole bar; the oracle re-derives
    open/close with first/last_value windows — same semantics, the driver
    hash proves it."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    return ohlc_bars(
        ev, "event_type", "ts", "event_id", "value", F.col("ts").cast("date")
    )


@query(
    "fin_vwap_brand_month",
    oracle=f"""
SELECT p_brand, CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       FLOOR(({sql_dec_sum('l_extendedprice', 2)} / {sql_dec_sum('l_quantity', 2)}) * 10000.0 + 0.5) / 10000.0 AS vwap,
       {sql_dec_sum('l_extendedprice', 2)} AS total_value,
       {sql_dec_sum('l_quantity', 2)} AS total_qty,
       COUNT(*) AS n_fills
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, month
""",
)
def fin_vwap_brand_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A1 generalized] Volume-weighted average price per (brand,
    ship month): broadcast the part dimension onto the fact scan, then one
    map-side-combinable aggregate of two exact decimal sums; VWAP is the
    single rounded division at the end.  The 100 TB plan is scan ->
    broadcast hash join -> partial agg -> one shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).withColumn("month", F.date_trunc("month", F.col("l_shipdate")).cast("date"))
    return vwap(joined, ["p_brand", "month"], "l_extendedprice", "l_quantity")


_DAILY_SQL = f"""
    SELECT event_type, CAST({_TS} AS DATE) AS day,
           {sql_dec_sum('value', 2)} AS daily_total
    FROM events GROUP BY 1, 2
"""

_BB_FRAME = "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW"


@query(
    "fin_sma_bollinger",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
c AS (
    SELECT event_type, day, daily_total,
           CAST(FLOOR(daily_total * 100.0 + 0.5) AS BIGINT) AS xc
    FROM daily
),
m AS (
    SELECT event_type, day, daily_total,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY day {_BB_FRAME}) AS n,
           CAST(SUM(xc) OVER (PARTITION BY event_type ORDER BY day {_BB_FRAME}) AS BIGINT) AS s1,
           CAST(SUM(xc * xc) OVER (PARTITION BY event_type ORDER BY day {_BB_FRAME}) AS BIGINT) AS s2
    FROM c
)
SELECT event_type, day, daily_total,
       n AS n_in_window,
       FLOOR((CAST(s1 AS DOUBLE) / (100.0 * n)) * 10000.0 + 0.5) / 10000.0 AS sma,
       FLOOR((CAST(s1 AS DOUBLE) / (100.0 * n)
              + 2.0 * SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE) / 10000.0))
             * 10000.0 + 0.5) / 10000.0 AS bb_upper,
       FLOOR((CAST(s1 AS DOUBLE) / (100.0 * n)
              - 2.0 * SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE) / 10000.0))
             * 10000.0 + 0.5) / 10000.0 AS bb_lower
FROM m
""",
)
def fin_sma_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] 20-day SMA + Bollinger bands over the per-type daily
    traded-value series.  Parity-safe rolling moments: the frame
    accumulates integer cents (sum and sum-of-squares), variance is one
    exact-integer closed form, and the only IEEE ops are the final divide
    + sqrt — bit-identical in DuckDB, which re-derives the identical
    expression chain.  The window runs over the PRE-AGGREGATED daily frame
    (keys x days rows), never over raw events."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    from aws_etl_fiap_spark.functions.parity import dec_sum

    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(dec_sum("value", 2).alias("daily_total"))
    return rolling_bands(daily, "event_type", "day", "daily_total", n_rows=20)


@query(
    "fin_drawdown_daily",
    oracle=f"""
WITH daily AS ({_DAILY_SQL})
SELECT event_type, day, daily_total,
       MAX(daily_total) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_peak,
       FLOOR(((MAX(daily_total) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - daily_total)
              / MAX(daily_total) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             * 1000000.0 + 0.5) / 1000000.0 AS drawdown_pct,
       FLOOR((daily_total / first_value(daily_total) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1.0)
             * 1000000.0 + 0.5) / 1000000.0 AS cum_return_pct
FROM daily
""",
)
def fin_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] Running peak, drawdown-from-peak, and cumulative return
    per event_type over the daily traded-value series — the running-max /
    anchored-ratio window pair behind equity-curve analytics.  Peak and
    first value are exact selections; each ratio is a single rounded IEEE
    division (no floating-point accumulation anywhere)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    from aws_etl_fiap_spark.functions.parity import dec_sum

    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(dec_sum("value", 2).alias("daily_total"))
    return drawdown(daily, "event_type", "day", "daily_total")


_EWMA_LAM = 0.94
_EWMA_K = 20


def _ewma_oracle(lam: float = _EWMA_LAM, k: int = _EWMA_K) -> str:
    from aws_etl_fiap_spark.functions.parity import sql_round_half_up

    chain = " + ".join(
        f"LAG(r2, {j}) OVER w2 * {lam**j!r}" for j in range(k)
    )
    norm = (1.0 - lam) / (1.0 - lam**k)
    vol = sql_round_half_up(f"SQRT(({chain}) * {norm!r})", 8)
    return f"""
WITH daily AS ({_DAILY_SQL}),
r AS (
    SELECT event_type, day,
           (daily_total - LAG(daily_total) OVER w) / LAG(daily_total) OVER w
               AS ret
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
r2f AS (
    SELECT event_type, day, ret, ret * ret AS r2,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
    FROM r WHERE ret IS NOT NULL
)
SELECT event_type, day, ret, ewma_vol FROM (
    SELECT event_type, day, ret, rn,
           {vol} AS ewma_vol
    FROM r2f
    WINDOW w2 AS (PARTITION BY event_type ORDER BY day)
) WHERE rn >= {k}
"""


@query("fin_ewma_vol_daily", oracle=_ewma_oracle())
def fin_ewma_vol_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] RiskMetrics EWMA volatility (operators/finance.
    ewma_volatility, lambda=0.94 over the trailing 20 returns) of the
    per-type daily traded-value series — the decay-weighted vol estimate
    quote warehouses run beside the equal-weight Bollinger sigma.  The
    lam^j weights and normalizer are driver-computed double literals on
    BOTH engines and the weighted sum is a fixed-order add chain of 20
    lags sharing one window sort, so the only rounding anywhere is the
    final half-up to 8dp."""
    from aws_etl_fiap_spark.functions.parity import dec_sum
    from aws_etl_fiap_spark.operators.finance import ewma_volatility

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(dec_sum("value", 2).alias("daily_total"))
    return ewma_volatility(
        daily, "event_type", "day", "daily_total", lam=_EWMA_LAM, n_rows=_EWMA_K
    )
