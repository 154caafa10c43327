"""Statistical-analytics queries ([EXT]: hypothesis testing, dependence,
attribution, and survivorship over the events log — operators/stats.py
holds the parity-safe closed forms)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import round_half_up, sql_round_half_up
from aws_etl_fiap_spark.operators.stats import (
    chi2_independence,
    mad_outliers,
    modal_value,
    rolling_corr,
    trailing_zscore,
    welch_z_test,
)
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

_TS = "CAST(ts AS TIMESTAMP)"

_CORR_FRAME = "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW"


@query(
    "fin_rolling_corr_view_click",
    oracle=f"""
WITH daily AS (
    SELECT CAST({_TS} AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'view'
                         THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE) AS view_total,
           CAST(SUM(CASE WHEN event_type = 'click'
                         THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE) AS click_total
    FROM events WHERE event_type IN ('view', 'click') GROUP BY 1
),
pair AS (
    SELECT * FROM daily WHERE view_total IS NOT NULL AND click_total IS NOT NULL
),
c AS (
    SELECT day, view_total, click_total,
           CAST(FLOOR(view_total * 100.0 + 0.5) AS BIGINT) AS xc,
           CAST(FLOOR(click_total * 100.0 + 0.5) AS BIGINT) AS yc
    FROM pair
),
m AS (
    SELECT day, view_total, click_total,
           COUNT(*) OVER w AS n,
           CAST(SUM(xc) OVER w AS BIGINT) AS sx,
           CAST(SUM(yc) OVER w AS BIGINT) AS sy,
           CAST(SUM(xc * xc) OVER w AS BIGINT) AS sxx,
           CAST(SUM(yc * yc) OVER w AS BIGINT) AS syy,
           CAST(SUM(xc * yc) OVER w AS BIGINT) AS sxy
    FROM c WINDOW w AS (ORDER BY day {_CORR_FRAME})
)
SELECT day, view_total, click_total, n AS n_in_window,
       FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
              / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                 * SQRT(CAST(n * syy - sy * sy AS DOUBLE))))
             * 1000000.0 + 0.5) / 1000000.0 AS rolling_corr
FROM m
""",
)
def fin_rolling_corr_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] 20-day rolling Pearson correlation between the daily
    view and click traded-value series (operators/stats.rolling_corr):
    conditional exact-decimal daily totals pivot the two series into one
    aligned spine row per day, then integer-cents bivariate moments give a
    closed-form r — exact arithmetic until two sqrts and one divide.  The
    unpartitioned window is over the CALENDAR spine (rows = days, not
    events) — the same volume-independence argument as the gap-fill
    spine."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", F.col("value")).cast(
                    "decimal(38,2)"
                )
            )
            .cast("double")
            .alias("view_total"),
            F.sum(
                F.when(F.col("event_type") == "click", F.col("value")).cast(
                    "decimal(38,2)"
                )
            )
            .cast("double")
            .alias("click_total"),
        )
        .filter(F.col("view_total").isNotNull() & F.col("click_total").isNotNull())
    )
    return rolling_corr(daily, "day", "view_total", "click_total", n_rows=20)


@query(
    "attr_last_touch_purchase",
    oracle=f"""
WITH u AS (
    SELECT user_id, {_TS} AS ts, event_id, event_type
    FROM events WHERE event_type IN ('click', 'purchase')
),
f AS (
    SELECT user_id, ts, event_id, event_type,
           MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click
    FROM u
)
SELECT CAST(ts AS DATE) AS day,
       COUNT(*) AS n_purchases,
       COUNT(CASE WHEN prev_click >= ts - INTERVAL 7 DAY THEN 1 END) AS n_attributed,
       {sql_round_half_up(
           'CAST(COUNT(CASE WHEN prev_click >= ts - INTERVAL 7 DAY THEN 1 END) AS DOUBLE)'
           ' / CAST(COUNT(*) AS DOUBLE)', 6)} AS attributed_share
FROM f WHERE event_type = 'purchase'
GROUP BY day
""",
)
def attr_last_touch_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.3 as-of generalized] Last-touch marketing attribution: each
    purchase looks up the SAME USER's most recent click STRICTLY BEFORE it
    (running MAX over the preceding frame — the union-free as-of lookup,
    same trick as joins.asof_join) and counts as attributed when that
    click landed within a 7-day window; rolled up per day.  One shuffle of
    the filtered log on user_id; the attribution check is a frame-local
    expression, never a join against the click table."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    purchases = ev.withColumn("prev_click", prev_click).filter(
        F.col("event_type") == "purchase"
    )
    attributed = F.col("prev_click") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return (
        purchases.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count(F.when(attributed, F.lit(1))).alias("n_attributed"),
        )
        .select(
            "day",
            "n_purchases",
            "n_attributed",
            round_half_up(
                F.col("n_attributed").cast("double")
                / F.col("n_purchases").cast("double"),
                6,
            ).alias("attributed_share"),
        )
    )


@query(
    "stat_chi2_type_weekday",
    oracle=f"""
WITH grid AS (
    SELECT event_type AS r, (isodow({_TS}) - 1) AS c, COUNT(*) AS o
    FROM events GROUP BY r, c
),
cells AS (
    SELECT r, c, o,
           CAST(SUM(o) OVER (PARTITION BY r) * SUM(o) OVER (PARTITION BY c) AS DOUBLE)
               / CAST(SUM(o) OVER () AS DOUBLE) AS e,
           CAST(SUM(o) OVER () AS BIGINT) AS n_obs
    FROM grid
)
SELECT {sql_round_half_up(
    'CAST(SUM(CAST(' + sql_round_half_up(
        '(CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e', 9)
    + ' AS DECIMAL(38,9))) AS DOUBLE)', 6)} AS chi2,
       (COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS dof,
       COUNT(DISTINCT r) AS n_rows,
       COUNT(DISTINCT c) AS n_cols,
       MAX(n_obs) AS n_obs
FROM cells
""",
)
def stat_chi2_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Chi-square test of independence between event_type and
    ISO weekday (operators/stats.chi2_independence): the raw log reduces
    to the |types| x 7 contingency grid in one shuffle; marginals/grand
    total are windows over that grid; each (o-e)^2/e term rounds at 9dp
    and sums in exact DECIMAL so the statistic is order-independent and
    hash-verifiable.  Spark's weekday() (0=Monday) == DuckDB isodow()-1."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    return chi2_independence(
        ev, F.col("event_type"), F.expr("weekday(ts)")
    )


@query(
    "stat_welch_view_click",
    oracle="""
WITH av AS (
    SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS xc
    FROM events WHERE event_type = 'view'
),
bv AS (
    SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS xc
    FROM events WHERE event_type = 'click'
),
a AS (SELECT COUNT(*) AS n_a, CAST(SUM(xc) AS BIGINT) AS s1_a,
             CAST(SUM(xc * xc) AS BIGINT) AS s2_a FROM av),
b AS (SELECT COUNT(*) AS n_b, CAST(SUM(xc) AS BIGINT) AS s1_b,
             CAST(SUM(xc * xc) AS BIGINT) AS s2_b FROM bv)
SELECT n_a, n_b,
       FLOOR((CAST(s1_a AS DOUBLE) / (100.0 * n_a)) * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
       FLOOR((CAST(s1_b AS DOUBLE) / (100.0 * n_b)) * 1000000.0 + 0.5) / 1000000.0 AS mean_b,
       FLOOR((CAST(s1_a AS DOUBLE) / (100.0 * n_a)
              - CAST(s1_b AS DOUBLE) / (100.0 * n_b)) * 1000000.0 + 0.5) / 1000000.0 AS mean_diff,
       FLOOR(((CAST(s1_a AS DOUBLE) / (100.0 * n_a) - CAST(s1_b AS DOUBLE) / (100.0 * n_b))
              / SQRT(CAST(n_a * s2_a - s1_a * s1_a AS DOUBLE) / CAST(n_a * n_a AS DOUBLE) / 10000.0 / n_a
                     + CAST(n_b * s2_b - s1_b * s1_b AS DOUBLE) / CAST(n_b * n_b AS DOUBLE) / 10000.0 / n_b))
             * 1000000.0 + 0.5) / 1000000.0 AS z_stat
FROM a CROSS JOIN b
""",
)
def stat_welch_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Welch two-sample z statistic comparing mean event value
    between views and clicks (operators/stats.welch_z_test): per-group
    integer-cents moments from two map-side-combinable aggregates, then
    closed-form means/variances/z on the 1-row-per-group frames — the A/B
    experimentation primitive, exact until the final divides + sqrt."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return welch_z_test(ev, F.col("event_type"), "value", "view", "click")


@query(
    "profile_user_snapshot",
    oracle=f"""
WITH o AS (
    SELECT user_id, {_TS} AS ts, event_id, event_type, value,
           last_value(event_type) OVER w AS le,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER w AS lpv
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {_TS}, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       MIN(ts) AS first_seen,
       MAX(ts) AS last_seen,
       COUNT(*) AS n_events,
       MAX(le) AS last_event_type,
       MAX(lpv) AS last_purchase_value
FROM o GROUP BY user_id
""",
)
def profile_user_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] Golden-record / survivorship user profile: per user the
    first/last activity, event count, the LAST event type, and the last
    PURCHASE value — the IGNORE NULLS last-non-null-wins survivorship rule
    (windows full-frame ``last(..., ignorenulls=True)`` under the unique
    (ts, event_id) order), the construct master-data pipelines use to
    merge entity attributes by recency.  One shuffle on user_id; window
    and aggregate share the partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    annotated = ev.select(
        "user_id",
        "ts",
        F.last("event_type").over(w).alias("le"),
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        )
        .over(w)
        .alias("lpv"),
    )
    return annotated.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("le").alias("last_event_type"),
        F.max("lpv").alias("last_purchase_value"),
    )


@query(
    "stat_mad_value_outliers",
    oracle="""
WITH med AS (
    SELECT event_type, quantile_disc(value, 0.5) AS median
    FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, m.median, ABS(e.value - m.median) AS d
    FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
    SELECT event_type, median, quantile_disc(d, 0.5) AS mad
    FROM dev GROUP BY event_type, median
)
SELECT d.event_type, d.median, a.mad,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN d.d > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * a.mad
             THEN 1 END) AS n_outliers
FROM dev d JOIN mad a ON d.event_type = a.event_type AND d.median = a.median
GROUP BY d.event_type, d.median, a.mad
""",
)
def stat_mad_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Robust per-type outlier counts via the median absolute
    deviation (operators/stats.mad_outliers): PERCENTILE_DISC median, then
    PERCENTILE_DISC of |x - median| (both real data elements, cross-engine
    exact), then the 3 * 1.4826 * MAD fence — the heavy-tail-safe sibling
    of the Tukey gate.  Two shuffles of the (type, value) projection with
    tiny per-type frames broadcast back between passes."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return mad_outliers(ev, "event_type", "value")


@query(
    "stat_modal_weekday_type",
    oracle=f"""
WITH grid AS (
    SELECT event_type, CAST(isodow({_TS}) - 1 AS INT) AS wd, COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
r AS (
    SELECT event_type, wd, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, wd ASC) AS rn
    FROM grid
)
SELECT event_type, wd AS mode, n AS n_mode FROM r WHERE rn = 1
""",
)
def stat_modal_weekday_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT + W-EXT] Exact per-type modal ISO weekday with a
    deterministic smallest-value tiebreak (operators/stats.modal_value):
    one shuffle to the (type, weekday) count grid, argmax via row_number
    over the GRID — the categorical imputation/survivorship primitive.
    Spark weekday() (0=Monday) == DuckDB isodow()-1 (stat_chi2 parity)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("weekday(ts)").alias("wd")
    )
    return modal_value(ev, "event_type", "wd")


@query(
    "events_anomaly_zscore_daily",
    oracle=f"""
WITH daily AS (
    SELECT CAST({_TS} AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total
    FROM events GROUP BY 1
),
c AS (
    SELECT day, total, CAST(FLOOR(total * 100.0 + 0.5) AS BIGINT) AS xc FROM daily
),
m AS (
    SELECT day, total, xc,
           COUNT(xc) OVER w AS n,
           CAST(SUM(xc) OVER w AS BIGINT) AS s1,
           CAST(SUM(xc * xc) OVER w AS BIGINT) AS s2
    FROM c WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
),
z AS (
    SELECT day, total, n,
           CASE WHEN n >= 3 THEN
               (CAST(xc AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
               / NULLIF(SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)), 0)
           END AS zv
    FROM m
)
SELECT day, total, n AS n_baseline,
       FLOOR(zv * 1000000.0 + 0.5) / 1000000.0 AS z_score,
       CASE WHEN zv IS NOT NULL THEN CAST(ABS(zv) > 3.0 AS INT) END AS is_anomaly
FROM z
""",
)
def events_anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] Leakage-free time-series anomaly detection: each day's
    total traded value scores against the mean/std of the PRECEDING 7 days
    (current row excluded — operators/stats.trailing_zscore), |z| > 3
    flags the anomaly.  Integer-cents frame moments keep the closed form
    exact until one divide + sqrt; the unpartitioned window runs over the
    CALENDAR spine (rows = days), volume-independent at any corpus size."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("total")
    )
    return trailing_zscore(daily, "day", "total", n_rows=7, min_n=3)


# 3x3 Cramer solve over the normal-equation moments, shared between the
# Spark expression builder and the SQL oracle renderer: A*beta = b with
# A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], b = [sy,s1y,s2y].  All
# moments are exact integers (or exact decimals); the determinants are
# identical double arithmetic on identical inputs.
_OLS_DETS = {
    "det_a": "(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))",
    "det_0": "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))",
    "det_1": "(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))",
    "det_2": "(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))",
}


@query(
    "ml_ols_closed_form_orders",
    oracle=f"""
WITH r AS (
    SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS yc,
           CAST(isodow(o_orderdate) - 1 AS BIGINT) AS x1,
           CAST(month(o_orderdate) AS BIGINT) AS x2
    FROM orders
),
m AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
           CAST(SUM(x1*x1) AS DOUBLE) AS s11, CAST(SUM(x1*x2) AS DOUBLE) AS s12,
           CAST(SUM(x2*x2) AS DOUBLE) AS s22,
           CAST(SUM(yc) AS DOUBLE) AS sy,
           CAST(SUM(x1*yc) AS DOUBLE) AS s1y, CAST(SUM(x2*yc) AS DOUBLE) AS s2y,
           CAST(SUM(CAST(yc AS DECIMAL(38,0)) * yc) AS DOUBLE) AS syy
    FROM r
)
SELECT CAST(n AS BIGINT) AS n_rows,
       FLOOR(({_OLS_DETS['det_0']} / {_OLS_DETS['det_a']}) / 100.0 * 1000000.0 + 0.5)
           / 1000000.0 AS beta0,
       FLOOR(({_OLS_DETS['det_1']} / {_OLS_DETS['det_a']}) / 100.0 * 1000000.0 + 0.5)
           / 1000000.0 AS beta1,
       FLOOR(({_OLS_DETS['det_2']} / {_OLS_DETS['det_a']}) / 100.0 * 1000000.0 + 0.5)
           / 1000000.0 AS beta2,
       FLOOR((1.0 - (syy - ({_OLS_DETS['det_0']} / {_OLS_DETS['det_a']}) * sy
                         - ({_OLS_DETS['det_1']} / {_OLS_DETS['det_a']}) * s1y
                         - ({_OLS_DETS['det_2']} / {_OLS_DETS['det_a']}) * s2y)
                  / (syy - sy * sy / n)) * 1000000.0 + 0.5) / 1000000.0 AS r2
FROM m
""",
)
def ml_ols_closed_form_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Distributed OLS TRAINING in one aggregate: 2-feature linear
    regression (o_totalprice ~ weekday + month) by the closed-form normal
    equations — nine exact integer moments from a single map-side-combined
    pass (sum-of-squares of cents in exact DECIMAL), then a 3x3 Cramer
    solve and the moment-form R^2 as pure double expressions on the 1-row
    frame.  The expression-only answer to "fit a linear model at 100 TB":
    no solver, no iterations, no Python — and DuckDB re-derives the
    identical arithmetic, so the FITTED COEFFICIENTS are hash-verified."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderdate"
    )
    r = orders.select(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("yc"),
        F.expr("weekday(o_orderdate)").cast("long").alias("x1"),
        F.month("o_orderdate").cast("long").alias("x2"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum("yc").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("yc")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("yc")).cast("double").alias("s2y"),
        F.sum(F.col("yc").cast("decimal(38,0)") * F.col("yc"))
        .cast("double")
        .alias("syy"),
    )
    b0 = F.expr(f"{_OLS_DETS['det_0']} / {_OLS_DETS['det_a']}")
    b1 = F.expr(f"{_OLS_DETS['det_1']} / {_OLS_DETS['det_a']}")
    b2 = F.expr(f"{_OLS_DETS['det_2']} / {_OLS_DETS['det_a']}")
    sse = F.col("syy") - b0 * F.col("sy") - b1 * F.col("s1y") - b2 * F.col("s2y")
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        round_half_up(b0 / 100.0, 6).alias("beta0"),
        round_half_up(b1 / 100.0, 6).alias("beta1"),
        round_half_up(b2 / 100.0, 6).alias("beta2"),
        round_half_up(F.lit(1.0) - sse / sst, 6).alias("r2"),
    )


@query(
    "events_rolling_wau_7d",
    oracle=f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST({_TS} AS DATE) AS d FROM events
),
days AS (SELECT DISTINCT d FROM ud)
SELECT days.d AS day, COUNT(DISTINCT ud.user_id) AS wau
FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d
""",
)
def events_rolling_wau_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Rolling 7-day active users (WAU): the sliding-window
    DISTINCT metric that no map-side combine can fold.  The scale shape:
    reduce to DISTINCT (user, day) first (one shuffle, grid-sized), each
    active day EXPLODES into the <=7 window days it contributes to, a
    broadcast semi-join drops targets past the calendar, and the final
    distinct-count runs over (day, user) pairs — the raw event stream is
    touched exactly once.  The DuckDB oracle re-derives it as the
    inequality join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    ud = ev.distinct()
    days = ud.select("d").distinct()
    exploded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
    )
    in_calendar = exploded.join(
        F.broadcast(days.select(F.col("d").alias("day"))), "day", "left_semi"
    )
    return in_calendar.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )


def _logreg_ctes(lr: float = 1.5, iters: int = 3, with_id: bool = False) -> str:
    """Unrolled DuckDB twin of operators/ml.logreg_train_gd's TRAJECTORY:
    per iteration one gradient CTE (decimal sums of 9dp-quantized
    contributions over the 12dp-quantized sigmoid) and one 1-row
    weight-update CTE; the extra g{iters+1} pass scores the final weights —
    identical arithmetic to the Spark trainer step for step.  Returns the
    WITH-clause chain (feats, w0..w{iters}, g1..g{iters+1}); the training
    and inference oracles compose their own final SELECT over it."""
    from aws_etl_fiap_spark.functions.parity import (
        sql_dec_sum,
        sql_round_half_up,
    )

    stop = "'the','of','and','to','in','is','that','for','with','on'"
    id_col = "doc_id," if with_id else ""
    parts = [
        f"""WITH feats AS (
    SELECT {id_col} CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           CAST(len(list_filter(string_split(text, ' '), x -> x IN ({stop})))
                AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x1,
           least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 2.0) AS x2
    FROM documents
),
w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1,
              CAST(0.0 AS DOUBLE) AS b2)"""
    ]
    for k in range(1, iters + 2):
        z = "b0 + b1 * x1 + b2 * x2"
        sig = sql_round_half_up(f"1.0 / (1.0 + exp(-({z})))", 12)
        gcols = [
            "CAST(COUNT(*) AS DOUBLE) AS n",
            f"CAST(SUM(CASE WHEN ({sig} >= 0.5) = (y = 1) THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_correct",
        ]
        if k <= iters:
            gcols.append(f"{sql_dec_sum(sql_round_half_up(f'{sig} - y', 9), 9)} AS g0")
            for i in (1, 2):
                gcols.append(
                    f"{sql_dec_sum(sql_round_half_up(f'({sig} - y) * x{i}', 9), 9)}"
                    f" AS g{i}"
                )
        parts.append(
            f""",
g{k} AS (
    SELECT {', '.join(gcols)}
    FROM feats CROSS JOIN w{k - 1}
)"""
        )
        if k <= iters:
            upd = ", ".join(
                f"{sql_round_half_up(f'b{j} - {lr} * (g{j} / n)', 12)} AS b{j}"
                for j in range(3)
            )
            parts.append(f""",
w{k} AS (SELECT {upd} FROM w{k - 1} CROSS JOIN g{k})""")
    return "".join(parts)


def _logreg_oracle(lr: float = 1.5, iters: int = 3) -> str:
    """Training oracle: the full weight trajectory + per-iteration
    accuracy (see :func:`_logreg_ctes`)."""
    from aws_etl_fiap_spark.functions.parity import sql_round_half_up

    selects = [
        f"SELECT CAST({k} AS INTEGER) AS iter, "
        + ", ".join(
            sql_round_half_up(f"b{j}", 6) + f" AS b{j}" for j in range(3)
        )
        + f", (SELECT n_correct FROM g{k + 1}) AS n_correct FROM w{k}"
        for k in range(1, iters + 1)
    ]
    return _logreg_ctes(lr, iters) + "\n" + "\nUNION ALL\n".join(selects)


#: Released-set size for the inference gate: a FIXED top-k (not a fixed
#: probability cut) keeps the selection non-degenerate at every SF — the
#: 3-iteration model's score range shifts with the corpus, so any absolute
#: threshold is either empty or everything at some scale.
_LOGREG_TOP_K = 100


def _logreg_score_oracle(lr: float = 1.5, iters: int = 3) -> str:
    """Inference oracle: re-derive the final weights through the identical
    training CTEs, score every document with the same 12dp-quantized
    sigmoid, and release the top-k under the (prob DESC, doc_id) total
    order — the quality-ranked selection rule."""
    from aws_etl_fiap_spark.functions.parity import sql_round_half_up

    sig = sql_round_half_up("1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2)))", 12)
    prob6 = sql_round_half_up("prob", 6)
    return (
        _logreg_ctes(lr, iters, with_id=True)
        + f""",
scored AS (
    SELECT doc_id, y, {sig} AS prob
    FROM feats CROSS JOIN w{iters}
)
SELECT doc_id, CAST(y AS INT) AS is_en, {prob6} AS en_prob
FROM scored ORDER BY prob DESC, doc_id LIMIT {_LOGREG_TOP_K}"""
    )


@query("ml_logreg_gd_lang", oracle=_logreg_oracle())
def ml_logreg_gd_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north star] Distributed LOGISTIC-REGRESSION training
    (operators/ml.logreg_train_gd) — the fasttext-style quality/domain
    classifier step of LLM data curation: predict lang='en' from the
    stopword ratio and saturated length, 3 full-batch GD iterations at
    lr=1.5.  Each iteration is one map-side-combined aggregate (d+1 exact
    decimal gradient sums); the model is 3 driver-side doubles broadcast
    back as literals; the 12dp sigmoid / 9dp contribution quantization
    makes the whole TRAJECTORY (weights per iteration + training accuracy)
    hash-identical to DuckDB's unrolled-CTE re-derivation."""
    from aws_etl_fiap_spark.functions.parity import round_half_up
    from aws_etl_fiap_spark.operators.ml import logreg_train_gd
    from aws_etl_fiap_spark.operators.text import LID_STOPWORDS, stopword_hits

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    out = logreg_train_gd(
        docs,
        label=(F.col("lang") == "en"),
        features=[
            stopword_hits(toks, LID_STOPWORDS["en"]).cast("double") / n_tok,
            F.least(n_tok / 100.0, F.lit(2.0)),
        ],
        lr=1.5,
        iters=3,
    )
    return out.select(
        "iter",
        round_half_up("b0", 6).alias("b0"),
        round_half_up("b1", 6).alias("b1"),
        round_half_up("b2", 6).alias("b2"),
        "n_correct",
    )


@query("ml_logreg_score_filter", oracle=_logreg_score_oracle())
def ml_logreg_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north star] The INFERENCE half of the quality-classifier loop:
    train the en-language logistic model (identical trajectory to
    ml_logreg_gd_lang), pull the final weights to the driver (3 doubles —
    bounded at any corpus size), score the corpus as a pure literal
    projection (operators/ml.logreg_score), and release the top-100 docs
    under the (prob DESC, doc_id) total order — the fasttext-style
    train-then-select pass LLM pipelines run over raw crawl, with a
    quality-ranked quota instead of an absolute cut (the 3-iteration
    model's score range shifts with corpus scale, so a fixed threshold
    degenerates).  The limit runs as TakeOrderedAndProject (distributed
    partial top-k — no single-reducer global window).  The oracle
    re-derives the weights through the unrolled training CTEs and scores
    with the same 12dp sigmoid, so the released id set AND the
    probabilities are inside the hash gate."""
    from aws_etl_fiap_spark.operators.ml import logreg_score, logreg_train_gd
    from aws_etl_fiap_spark.operators.text import LID_STOPWORDS, stopword_hits

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")

    def feats() -> list:
        return [
            stopword_hits(toks, LID_STOPWORDS["en"]).cast("double") / n_tok,
            F.least(n_tok / 100.0, F.lit(2.0)),
        ]

    trajectory = logreg_train_gd(
        docs, label=(F.col("lang") == "en"), features=feats(), lr=1.5, iters=3
    )
    final = trajectory.orderBy(F.col("iter").desc()).first()
    w = [final["b0"], final["b1"], final["b2"]]
    prob = logreg_score(feats(), w)
    return (
        docs.select(
            "doc_id",
            (F.col("lang") == "en").cast("int").alias("is_en"),
            prob.alias("__prob"),
        )
        .orderBy(F.col("__prob").desc(), "doc_id")
        .limit(_LOGREG_TOP_K)
        .select("doc_id", "is_en", round_half_up("__prob", 6).alias("en_prob"))
    )


def _logreg_auc_oracle(lr: float = 1.5, iters: int = 3) -> str:
    """Evaluation oracle: re-derive the final weights through the identical
    training CTEs, score every document with the same 12dp-quantized
    sigmoid, and compute the exact tie-aware ROC-AUC by the all-integer
    doubled-rank identity (see operators/ml.exact_auc): one final double
    divide, everything before it BIGINT/DECIMAL(38,0)."""
    from aws_etl_fiap_spark.functions.parity import sql_round_half_up

    sig = sql_round_half_up("1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2)))", 12)
    # single-class corpus -> AUC undefined -> NULL (mirrors exact_auc's
    # guard; a double 0-divide would yield Infinity/NaN instead)
    auc = (
        "CASE WHEN p > 0 AND tot - p > 0 THEN "
        "(CAST(s AS DOUBLE) - CAST(p AS DOUBLE) * (CAST(p AS DOUBLE) + 1.0))"
        " / (2.0 * CAST(p AS DOUBLE) * CAST(tot - p AS DOUBLE)) END"
    )
    return (
        _logreg_ctes(lr, iters)
        + f""",
scored AS (
    SELECT {sig} AS score, y
    FROM feats CROSS JOIN w{iters}
),
g AS (
    SELECT score, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS npos
    FROM scored GROUP BY score
),
r AS (
    SELECT n, npos,
           CAST(2 * (SUM(n) OVER (ORDER BY score) - n) + n + 1 AS BIGINT)
             AS rank2
    FROM g
),
t AS (
    SELECT CAST(SUM(CAST(npos AS DECIMAL(38,0)) * rank2) AS DECIMAL(38,0))
             AS s,
           CAST(SUM(npos) AS BIGINT) AS p,
           CAST(SUM(n) AS BIGINT) AS tot
    FROM r
)
SELECT {sql_round_half_up(auc, 6)} AS auc,
       p AS n_pos, CAST(tot - p AS BIGINT) AS n_neg
FROM t"""
    )


@query("ml_auc_quality_classifier", oracle=_logreg_auc_oracle())
def ml_auc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north star] The EVALUATION leg of the quality-classifier loop:
    exact tie-aware ROC-AUC (operators/ml.exact_auc) of the en-language
    logistic model's 12dp probabilities against the true labels — the
    number an LLM-data team reads before trusting a trained filter to gate
    a 100 TB crawl.  Mann-Whitney rank-sum with AVERAGE ranks for ties,
    all-integer doubled ranks until one final double divide (bit-identical
    across engines with zero rounding machinery in the statistic itself);
    the global rank uses the range-partitioned two-pass prefix sum, never
    a single-reducer window, and the corpus collapses to the
    distinct-score frame in one map-side-combined aggregate first."""
    from aws_etl_fiap_spark.operators.ml import (
        exact_auc,
        logreg_score,
        logreg_train_gd,
    )
    from aws_etl_fiap_spark.operators.text import LID_STOPWORDS, stopword_hits

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")

    def feats() -> list:
        return [
            stopword_hits(toks, LID_STOPWORDS["en"]).cast("double") / n_tok,
            F.least(n_tok / 100.0, F.lit(2.0)),
        ]

    trajectory = logreg_train_gd(
        docs, label=(F.col("lang") == "en"), features=feats(), lr=1.5, iters=3
    )
    final = trajectory.orderBy(F.col("iter").desc()).first()
    w = [final["b0"], final["b1"], final["b2"]]
    scored = docs.select(
        logreg_score(feats(), w).alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    return exact_auc(scored, F.col("y"), F.col("score"))


def _logreg_calibration_oracle(lr: float = 1.5, iters: int = 3) -> str:
    """Reliability-diagram oracle: same trained weights + 12dp sigmoid,
    10 fixed-width probability bins, exact decimal mean predicted prob vs
    observed positive rate per bin."""
    from aws_etl_fiap_spark.functions.parity import (
        sql_dec_sum,
        sql_round_half_up,
    )

    sig = sql_round_half_up("1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2)))", 12)
    return (
        _logreg_ctes(lr, iters)
        + f""",
scored AS (
    SELECT LEAST(CAST(FLOOR(({sig}) * 1000.0) AS INTEGER), 999) AS bin,
           {sig} AS score, y
    FROM feats CROSS JOIN w{iters}
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round_half_up(f"{sql_dec_sum('score', 12)} / COUNT(*)", 6)}
         AS mean_pred,
       {sql_round_half_up("CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) / COUNT(*)", 6)}
         AS frac_pos
FROM scored GROUP BY bin"""
    )


@query("ml_calibration_bins", oracle=_logreg_calibration_oracle())
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north star] Reliability diagram of the quality classifier:
    bucket the 12dp predicted probabilities into 1000 fixed-width bins
    (millibins — the trained model's score band is narrow, and a coarse
    grid would collapse the diagram to one row) and
    compare the exact decimal-summed mean prediction against the observed
    positive rate per bin — the calibration check that decides whether a
    trained filter's probability threshold MEANS anything before it gates
    a corpus.  ONE map-side-combined aggregate over the scored scan (bins
    are fixed-width expressions, not data-dependent quantiles — the same
    any-scale shape as dq_psi_value_drift); no joins, no windows."""
    from aws_etl_fiap_spark.functions.parity import dec_sum, round_half_up
    from aws_etl_fiap_spark.operators.ml import logreg_score, logreg_train_gd
    from aws_etl_fiap_spark.operators.text import LID_STOPWORDS, stopword_hits

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")

    def feats() -> list:
        return [
            stopword_hits(toks, LID_STOPWORDS["en"]).cast("double") / n_tok,
            F.least(n_tok / 100.0, F.lit(2.0)),
        ]

    trajectory = logreg_train_gd(
        docs, label=(F.col("lang") == "en"), features=feats(), lr=1.5, iters=3
    )
    final = trajectory.orderBy(F.col("iter").desc()).first()
    w = [final["b0"], final["b1"], final["b2"]]
    score = logreg_score(feats(), w)
    scored = docs.select(
        F.least(F.floor(score * 1000.0).cast("int"), F.lit(999)).alias("bin"),
        score.alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    cnt = F.count(F.lit(1))
    return scored.groupBy("bin").agg(
        cnt.cast("long").alias("n"),
        round_half_up(dec_sum("score", 12) / cnt, 6).alias("mean_pred"),
        round_half_up(
            F.sum("y").cast("long").cast("double") / cnt, 6
        ).alias("frac_pos"),
    )


_SPEARMAN_MOM = """
t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(CAST(rx AS DECIMAL(38,0)) * CAST(rx AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS sxx,
           CAST(SUM(CAST(ry AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS syy,
           CAST(SUM(CAST(rx AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS sxy
    FROM j
)"""


def _spearman_oracle() -> str:
    from aws_etl_fiap_spark.functions.parity import sql_round_half_up

    num = ("CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)")
    den = ("sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
           " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))")
    rho = f"CASE WHEN {den} > 0.0 THEN ({num}) / {den} END"
    return f"""
WITH m AS (
    SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
    FROM documents
),
gx AS (SELECT x, COUNT(*) AS cn FROM m GROUP BY x),
rx AS (
    SELECT x, CAST(2 * (SUM(cn) OVER (ORDER BY x) - cn) + cn + 1 AS BIGINT)
             AS rx
    FROM gx
),
gy AS (SELECT y, COUNT(*) AS cn FROM m GROUP BY y),
ry AS (
    SELECT y, CAST(2 * (SUM(cn) OVER (ORDER BY y) - cn) + cn + 1 AS BIGINT)
             AS ry
    FROM gy
),
j AS (SELECT rx.rx, ry.ry FROM m JOIN rx USING (x) JOIN ry USING (y)),
{_SPEARMAN_MOM}
SELECT {sql_round_half_up(rho, 6)} AS rho, n FROM t"""


@query("stat_spearman_len_diversity", oracle=_spearman_oracle())
def stat_spearman_len_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact tie-aware SPEARMAN rank correlation
    (operators/stats.spearman_rho) between document length (token count)
    and lexical diversity (distinct-token count) — the monotonic-
    association check quality teams run before trusting a linear
    correlation on heavy-tailed corpus metrics.  Pearson over DOUBLED
    average ranks: both rank tables come from the range-partitioned
    two-pass prefix sum over distinct-VALUE frames (never a row-sized
    window), all five moments are exact DECIMAL(38,0) integer sums, and
    one final sqrt/divide produces rho — bit-identical on both engines
    with no rounding machinery inside the statistic."""
    from aws_etl_fiap_spark.operators.stats import spearman_rho

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = docs.select(
        F.size(toks).cast("long").alias("x"),
        F.size(F.array_distinct(toks)).cast("long").alias("y"),
    )
    return spearman_rho(m, "x", "y")


def _nb_oracle() -> str:
    """Full Naive-Bayes re-derivation: integer count model, 9dp-quantized
    logs cast to DECIMAL(12,9), exact (10,0)x(12,9) contribution products
    decimal-summed per (doc, class), argmax with ties to the
    lexicographically first class."""
    from aws_etl_fiap_spark.functions.parity import sql_round_half_up

    r9 = sql_round_half_up
    return f"""
WITH docs AS (SELECT doc_id AS doc, lang AS y, text FROM documents),
dw AS (
    SELECT doc, y, w, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT doc, y, unnest(string_split(text, ' ')) AS w FROM docs)
    GROUP BY doc, y, w
),
cw AS (
    SELECT y AS c, w, CAST(SUM(cnt) AS BIGINT) AS ccnt FROM dw GROUP BY y, w
),
ctot AS (SELECT c, CAST(SUM(ccnt) AS BIGINT) AS tot FROM cw GROUP BY c),
vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM dw),
priors AS (SELECT y AS c, CAST(COUNT(*) AS BIGINT) AS nc FROM docs GROUP BY y),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs),
classes AS (
    SELECT ctot.c,
           CAST({r9('ln(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))', 9)}
                AS DECIMAL(12,9)) AS logprior,
           CAST({r9('ln(1.0 / CAST(tot + v AS DOUBLE))', 9)}
                AS DECIMAL(12,9)) AS logp0,
           tot, v
    FROM ctot JOIN priors ON priors.c = ctot.c CROSS JOIN vocab CROSS JOIN nn
),
likes AS (
    SELECT cw.c, cw.w,
           CAST({r9('ln(CAST(ccnt + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE))', 9)}
                AS DECIMAL(12,9)) AS logp
    FROM cw JOIN classes ON classes.c = cw.c
),
scored AS (
    SELECT dw.doc, dw.y AS true_lang, cl.c, cl.logprior,
           CAST(dw.cnt AS DECIMAL(10,0)) * COALESCE(l.logp, cl.logp0)
             AS contrib
    FROM dw CROSS JOIN classes cl
    LEFT JOIN likes l ON l.c = cl.c AND l.w = dw.w
),
per_class AS (
    SELECT doc, true_lang, c, logprior, SUM(contrib) AS ll
    FROM scored GROUP BY doc, true_lang, c, logprior
),
best AS (
    SELECT doc, true_lang, c AS pred FROM (
        SELECT doc, true_lang, c,
               ROW_NUMBER() OVER (
                   PARTITION BY doc ORDER BY logprior + ll DESC, c ASC
               ) AS rn
        FROM per_class
    ) WHERE rn = 1
)
SELECT true_lang, pred AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM best GROUP BY true_lang, pred"""


@query("ml_naive_bayes_confusion", oracle=_nb_oracle())
def ml_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north star] Multinomial NAIVE BAYES language identification
    trained and evaluated in one pass (operators/ml.naive_bayes_confusion)
    — the counts-only baseline classifier of data curation next to the
    gradient-trained logistic pair: Laplace-smoothed per-class word
    likelihoods, log-prior + log-likelihood argmax per document, released
    as the (true, predicted) confusion matrix.  The model is pure integer
    counts; every log quantizes to 9 dp into DECIMAL(12,9), per-word
    contributions are exact (10,0)x(12,9) decimal products summed
    order-independently, and ties break to the lexicographically first
    class — so DuckDB re-derives the identical matrix.  Scoring fans each
    (doc, word) row k ways against the broadcast class/likelihood tables
    and combines map-side."""
    from aws_etl_fiap_spark.operators.ml import naive_bayes_confusion

    docs = load_table(spark, sf_dir, "documents")
    return naive_bayes_confusion(docs, "lang", "text", "doc_id")


@query(
    "stat_gini_priority_revenue",
    oracle="""
WITH g AS (
    SELECT o_orderpriority AS grp,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY grp, x
),
r AS (
    SELECT grp, x, cnt,
           CAST(2 * (SUM(cnt) OVER (PARTITION BY grp ORDER BY x) - cnt)
                + cnt + 1 AS BIGINT) AS r2
    FROM g
),
m AS (
    SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(cnt * x) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(cnt * r2 * x) AS DECIMAL(38,0)) AS srx
    FROM r GROUP BY grp
)
SELECT grp AS o_orderpriority, n,
       FLOOR((CASE WHEN sx > 0 THEN
           (CAST(srx AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0)
            * CAST(sx AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) END)
           * 1000000.0 + 0.5) / 1000000.0 AS gini
FROM m
""",
)
def stat_gini_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact tie-aware GINI coefficient of order revenue per
    priority class (operators/stats.gini_by_group) — the concentration
    diagnostic behind skew triage and training-data-mix audits: how
    unequally is each group's total distributed over its members?
    Values go to integer cents, ranks are the doubled tie-aware average
    ranks (the AUC/Spearman integer discipline), every moment is an exact
    DECIMAL(38,0) sum over the per-group distinct-VALUE grid (the rank
    window partitions by group over that grid, never the row stream), and
    one final double divide yields G, 6 dp at output."""
    from aws_etl_fiap_spark.operators.stats import gini_by_group

    orders = load_table(spark, sf_dir, "orders")
    return gini_by_group(orders, "o_orderpriority", "o_totalprice")
