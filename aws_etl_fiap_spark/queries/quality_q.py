"""Data-quality queries ([EXT]; generalizing the reference's null-filter +
row-count accounting, b3_transform.py:115-136, into the audit surface a
production pipeline runs before promoting a raw batch).

Two shapes:
- a single-pass rule audit (operators/cleaning.audit_checks): N named
  violation predicates, one scan, tall (check_name, n_fail, n_rows) output;
- robust distribution outliers via exact discrete quartiles + Tukey fences:
  PERCENTILE_DISC picks actual data elements (never interpolates), so the
  fence arithmetic is the same IEEE ops on the same values in any engine —
  exact-hash verifiable, unlike mean/stddev z-scores whose partial-sum order
  differs per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table


@query(
    "dq_audit_lineitem",
    oracle="""
WITH a AS (
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS c0,
           COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS c1,
           COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS c2,
           COUNT(CASE WHEN l_tax < 0 THEN 1 END) AS c3,
           COUNT(CASE WHEN l_extendedprice <= 0 THEN 1 END) AS c4,
           COUNT(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                       OR l_shipdate >= TIMESTAMP '2000-01-01' THEN 1 END) AS c5
    FROM lineitem
),
o AS (
    SELECT COUNT(*) AS c6
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey IS NULL
)
SELECT 'null_orderkey' AS check_name, c0 AS n_fail, n_rows FROM a
UNION ALL SELECT 'nonpositive_quantity', c1, n_rows FROM a
UNION ALL SELECT 'discount_out_of_range', c2, n_rows FROM a
UNION ALL SELECT 'negative_tax', c3, n_rows FROM a
UNION ALL SELECT 'nonpositive_extendedprice', c4, n_rows FROM a
UNION ALL SELECT 'shipdate_out_of_era', c5, n_rows FROM a
UNION ALL SELECT 'orphan_orderkey', o.c6, a.n_rows FROM a, o
""",
)
def dq_audit_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT P1/A3 generalized] One-scan rule audit over lineitem — null
    keys, domain ranges, date sanity — plus a referential-integrity check
    (lineitem keys with no parent order, via left_anti).  Clean TPC-H data
    legitimately reports zero violations; the gate's value is that every
    count (including the zeros and the shared n_rows denominator) is
    exact-hash verified, so a broken predicate or a lossy scan shows up."""
    from aws_etl_fiap_spark.operators.cleaning import audit_checks

    li = load_table(spark, sf_dir, "lineitem")
    rules = audit_checks(
        li,
        [
            ("null_orderkey", F.col("l_orderkey").isNull()),
            ("nonpositive_quantity", F.col("l_quantity") <= 0),
            (
                "discount_out_of_range",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
            ),
            ("negative_tax", F.col("l_tax") < 0),
            ("nonpositive_extendedprice", F.col("l_extendedprice") <= 0),
            (
                "shipdate_out_of_era",
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")),
            ),
        ],
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    orphans = (
        li.select("l_orderkey")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_fail"))
        .withColumn("check_name", F.lit("orphan_orderkey"))
    )
    total = li.agg(F.count(F.lit(1)).alias("n_rows"))
    orphan_row = orphans.crossJoin(total).select("check_name", "n_fail", "n_rows")
    return rules.unionByName(orphan_row)


@query(
    "events_quantile_outliers",
    oracle="""
WITH fences AS (
    SELECT event_type,
           quantile_disc(value, 0.25) AS q1,
           quantile_disc(value, 0.75) AS q3
    FROM events GROUP BY event_type
)
SELECT e.event_type, f.q1, f.q3,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1) THEN 1 END) AS n_low_outliers,
       COUNT(CASE WHEN e.value > f.q3 + 1.5 * (f.q3 - f.q1) THEN 1 END) AS n_high_outliers
FROM events e JOIN fences f ON e.event_type = f.event_type
GROUP BY e.event_type, f.q1, f.q3
""",
)
def events_quantile_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Robust outlier detection per event_type: exact discrete
    quartiles (PERCENTILE_DISC WITHIN GROUP — returns real data elements,
    cross-engine exact) -> Tukey fences (q1/q3 ± 1.5 IQR) -> conditional
    counts.  Two-stage scale shape: the quartile aggregate reduces to one
    tiny fence row per type, which BROADCASTS back onto the stream for the
    fence comparison — the full table shuffles once (for the quantile),
    never twice."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    low = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    high = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("value") < low, F.lit(1))).alias("n_low_outliers"),
            F.count(F.when(F.col("value") > high, F.lit(1))).alias("n_high_outliers"),
        )
    )


@query(
    "events_cohort_retention",
    oracle="""
WITH w AS (
    SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
),
m AS (
    SELECT user_id, wk,
           MIN(wk) OVER (PARTITION BY user_id) AS cohort_week
    FROM w
)
SELECT cohort_week,
       CAST((wk - cohort_week) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM m
GROUP BY cohort_week, week_offset
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Cohort retention: users bucketed by first-activity week,
    distinct actives per (cohort, week offset) — the standard product
    retention triangle.  One shuffle shape: the cohort week comes from a
    window MIN over the user partition (no self-join back onto the event
    stream), then the distinct-count agg reuses nothing wider than
    (cohort, offset, user)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    m = ev.withColumn(
        "cohort_week", F.min("wk").over(Window.partitionBy("user_id"))
    )
    return (
        m.select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "timeseries_gapfill_ffill",
    oracle="""
WITH sparse AS (
    SELECT event_type,
           make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600000000) AS bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38, 2))) AS DOUBLE) AS bucket_value
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM sparse GROUP BY 1
),
spine AS (
    SELECT event_type, unnest(generate_series(b0, b1, INTERVAL 10 MINUTE)) AS bucket
    FROM bounds
)
SELECT s.event_type, s.bucket,
       COALESCE(p.n_events, 0) AS n_events,
       last_value(p.bucket_value IGNORE NULLS)
           OVER (PARTITION BY s.event_type ORDER BY s.bucket) AS ffill_value
FROM spine s
LEFT JOIN sparse p ON s.event_type = p.event_type AND s.bucket = p.bucket
""",
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT/W-EXT] Time-series regularization: 10-minute buckets per
    event_type, a generated dense spine (sequence+explode between each
    type's min/max bucket), zero-fill for counts and forward-fill (last
    non-null over the time order) for the decimal totals — the gap-fill /
    ffill primitive every downstream resample or as-of consumer assumes.

    Scale shape: the sparse aggregate is the only full-data shuffle; the
    spine is generated per type (rows = time-range/step, independent of
    event count) and the ffill window runs per type in bucket order.  At
    100 TB with high key cardinality the same plan holds — spine size is
    keys x buckets, never a function of raw event volume."""
    from pyspark.sql import Window

    from aws_etl_fiap_spark.functions.parity import dec_sum

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    sparse = (
        ev.groupBy("event_type", F.window("ts", "10 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", 2).alias("bucket_value"),
        )
        .select(
            "event_type",
            F.col("window.start").alias("bucket"),
            "n_events",
            "bucket_value",
        )
    )
    bounds = sparse.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("b0", "b1", F.expr("interval 10 minutes"))
        ).alias("bucket"),
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    return spine.join(sparse, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("bucket_value", ignorenulls=True).over(w).alias("ffill_value"),
    )


@query(
    "snapshot_diff_orders",
    oracle="""
WITH src AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
new_snap AS (
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice
    FROM src WHERE o_orderkey % 41 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
    FROM src WHERE o_orderkey % 97 = 3
),
classified AS (
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'deleted'
                WHEN a.o_orderkey IS NULL THEN 'inserted'
                WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                  OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
                THEN 'updated'
                ELSE 'unchanged' END AS change_type
    FROM src a FULL JOIN new_snap b ON a.o_orderkey = b.o_orderkey
)
SELECT o_orderkey, change_type FROM classified WHERE change_type <> 'unchanged'
""",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Snapshot reconciliation / CDC diff (operators/cleaning.
    snapshot_diff): today's orders vs a deterministically mutated twin
    (deletes: key%41, updates: key%13 price+1, inserts: key%97=3 shifted) —
    classify every key as inserted/updated/deleted via one null-safe
    full-outer join, unchanged rows dropped.  The oracle re-derives the
    same mutation and the same classification in SQL, so the join, the
    null-safe column compare, and the filter are all value-verified."""
    from aws_etl_fiap_spark.operators.cleaning import snapshot_diff

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    new_snap = (
        src.filter(key % 41 != 0)
        .withColumn(
            "o_totalprice",
            F.when(key % 13 == 0, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            src.filter(key % 97 == 3).select(
                (key + 10_000_000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    return snapshot_diff(
        src, new_snap, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@query(
    "scd2_event_history",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
),
ver AS (
    SELECT user_id, event_type, ts,
           SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
    FROM ordered
),
grp AS (
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           MIN(ts) AS effective_from
    FROM ver GROUP BY user_id, version, event_type
)
SELECT user_id, version, event_type, effective_from,
       LEAD(effective_from) OVER (PARTITION BY user_id ORDER BY version) AS effective_to,
       CAST(CASE WHEN LEAD(effective_from)
                      OVER (PARTITION BY user_id ORDER BY version) IS NULL
                 THEN 1 ELSE 0 END AS INT) AS is_current
FROM grp
""",
)
def scd2_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] SCD type-2 history build (operators/windows.scd2_collapse):
    collapse each user's event-type change log into versioned validity
    intervals [effective_from, effective_to) with an is_current flag —
    the warehouse dimension-history construct, driven off the events
    table.  (ts, event_id) is the total per-user order, so version
    numbering is deterministic; the oracle re-derives the identical
    lag/running-sum/lead pipeline in SQL."""
    from aws_etl_fiap_spark.operators.windows import scd2_collapse

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return scd2_collapse(ev, "user_id", "event_type", "ts", "event_id")


_TS_Q = "CAST(ts AS TIMESTAMP)"


@query(
    "events_funnel_conversion",
    oracle=f"""
WITH t1 AS (
    SELECT user_id, MIN({_TS_Q}) AS view_ts
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
    SELECT e.user_id, MIN({_TS_Q.replace('ts', 'e.ts')}) AS click_ts
    FROM events e JOIN t1 ON t1.user_id = e.user_id
    WHERE e.event_type = 'click' AND {_TS_Q.replace('ts', 'e.ts')} > t1.view_ts
    GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, MIN({_TS_Q.replace('ts', 'e.ts')}) AS purchase_ts
    FROM events e JOIN t2 ON t2.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND {_TS_Q.replace('ts', 'e.ts')} > t2.click_ts
    GROUP BY e.user_id
)
SELECT t1.user_id, t1.view_ts, t2.click_ts, t3.purchase_ts,
       CAST(CASE WHEN t3.purchase_ts IS NOT NULL THEN 3
                 WHEN t2.click_ts IS NOT NULL THEN 2
                 ELSE 1 END AS INT) AS reached_stage
FROM t1
LEFT JOIN t2 ON t2.user_id = t1.user_id
LEFT JOIN t3 ON t3.user_id = t1.user_id
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Ordered 3-step funnel (view -> click -> purchase): each stage's
    timestamp is the FIRST qualifying event STRICTLY AFTER the previous
    stage — the sequence-detection construct behind conversion analytics
    (the interval-join gate checks co-occurrence; this one checks ORDER).
    Three aggregates and two joins, all partitioned on user_id, so the
    event log shuffles once and the stage frames (<=1 row per user) reuse
    that partitioning."""
    # NTZ ts: naive comparisons, session-tz-independent.
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .otherwise(1)
            .alias("reached_stage"),
        )
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in _PROFILE_COLS
)


@query(
    "events_user_ltv_profile",
    oracle="""
WITH u AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS ltv
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       quantile_disc(ltv, 0.1) AS p10_ltv,
       quantile_disc(ltv, 0.5) AS p50_ltv,
       quantile_disc(ltv, 0.9) AS p90_ltv,
       MAX(ltv) AS max_ltv,
       FLOOR((CAST(SUM(CAST(ltv AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*))
             * 1000000.0 + 0.5) / 1000000.0 AS avg_ltv
FROM u
""",
)
def events_user_ltv_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Two-level aggregation (agg-of-agg): per-user lifetime
    purchase value (exact decimal sums — the entity rollup), then the
    DISTRIBUTION over users: exact discrete percentiles, max, and a
    parity-safe mean.  The plan shape matters at scale: level 1 shuffles
    on user_id with map-side combine, level 2 reduces the user frame
    (rows = users, not events) to one row — the cohort-economics primitive
    (LTV, tenure, engagement histograms) every growth pipeline runs."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("ltv")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY ltv)").alias("p10_ltv"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ltv)").alias("p50_ltv"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY ltv)").alias("p90_ltv"),
        F.max("ltv").alias("max_ltv"),
        (
            F.floor(
                (
                    F.sum(F.col("ltv").cast("decimal(38,2)")).cast("double")
                    / F.count(F.lit(1))
                )
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("avg_ltv"),
    )


@query(
    "diag_key_skew_lineitem",
    oracle="""
WITH grid AS (
    SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       MAX(c) AS max_key_rows,
       quantile_disc(c, 0.5) AS p50_key_rows,
       quantile_disc(c, 0.99) AS p99_key_rows,
       FLOOR((CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)) * 1000000.0 + 0.5)
           / 1000000.0 AS top_key_share
FROM grid
""",
)
def diag_key_skew_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.11 diagnostics] Shuffle-key skew profile for lineitem's join
    key: per-key row counts reduce to a grid in one map-side-combinable
    shuffle, then key-count quantiles (PERCENTILE_DISC — exact data
    elements), the max, and the hottest key's share of all rows — the
    numbers that decide between a plain shuffle join, AQE skew splitting,
    and the salting recipe (operators/skew.py).  The profile the r6 AQE
    skew smoke reads off ad hoc, as a first-class one-row query."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    grid = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return grid.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        # percentile_disc returns DOUBLE in Spark but BIGINT in DuckDB over
        # an integer column; the picked elements are exact key counts, so
        # the long cast is lossless and aligns the schemas.
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .cast("long")
        .alias("p50_key_rows"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)")
        .cast("long")
        .alias("p99_key_rows"),
        (
            F.floor(
                (F.max("c").cast("double") / F.sum("c").cast("double")) * 1e6
                + 0.5
            )
            / 1e6
        ).alias("top_key_share"),
    )


@query("dq_profile_orders", oracle=_PROFILE_ORACLE)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] Deequ-style column profiler over orders
    (operators/cleaning.column_profile): per column the row count, null
    count, and EXACT distinct count from ONE scan — the multi-distinct
    aggregate plans Spark's Expand (stream duplicated per profiled column,
    map-side partial-combined), then stack() unpivots the 1-row wide
    result to tall (column_name, n_rows, n_nulls, n_distinct).  The
    completeness/uniqueness audit a pipeline runs before trusting a feed;
    at 100 TB swap approx_count_distinct for the Expand-free sketch
    plan."""
    from aws_etl_fiap_spark.operators.cleaning import column_profile

    orders = load_table(spark, sf_dir, "orders")
    return column_profile(orders, list(_PROFILE_COLS))


@query(
    "privacy_k_anon_suppress",
    oracle="""
WITH banded AS (
    SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 2000.0) * 2000.0 AS DOUBLE) AS bal_band
    FROM customer
),
counted AS (
    SELECT *,
           COUNT(*) OVER (
               PARTITION BY c_nationkey, c_mktsegment, bal_band
           ) AS grp_n
    FROM banded
)
SELECT c_nationkey, c_mktsegment, bal_band,
       COUNT(*) AS n,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM counted
WHERE grp_n >= 2
GROUP BY c_nationkey, c_mktsegment, bal_band
""",
)
def privacy_k_anon_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] k-anonymity release gate (operators/privacy.py): generalize
    c_acctbal onto 2000-wide bands, suppress every row whose
    (nation, segment, band) equivalence class has fewer than k=2 members,
    and aggregate the released rows per class.  The oracle recomputes the
    suppression with a window count, so the generalization grid, the
    class-size computation, and the anti-join suppression (broadcast
    violator set — the corpus itself is never shuffled for the filter)
    are all inside the hash gate; key_sum pins row identity, catching a
    join that dropped or duplicated members of a retained class."""
    from aws_etl_fiap_spark.operators.privacy import (
        generalize_band,
        k_anonymize,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        generalize_band("c_acctbal", 2000.0).alias("bal_band"),
    )
    released = k_anonymize(cust, ["c_nationkey", "c_mktsegment", "bal_band"], k=2)
    return released.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_custkey").alias("key_sum"),
    )


@query(
    "privacy_l_diversity_release",
    oracle="""
WITH banded AS (
    SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000.0) * 1000.0 AS DOUBLE) AS bal_band
    FROM customer
),
classes AS (
    SELECT c_nationkey, bal_band,
           COUNT(*) AS grp_n,
           COUNT(DISTINCT c_mktsegment) AS grp_l
    FROM banded
    GROUP BY c_nationkey, bal_band
)
SELECT b.c_nationkey, b.bal_band,
       COUNT(*) AS n,
       CAST(COUNT(DISTINCT b.c_mktsegment) AS BIGINT) AS n_segments,
       CAST(SUM(b.c_custkey) AS BIGINT) AS key_sum
FROM banded b
JOIN classes c
  ON b.c_nationkey = c.c_nationkey AND b.bal_band = c.bal_band
WHERE c.grp_n >= 3 AND c.grp_l >= 3
GROUP BY b.c_nationkey, b.bal_band
""",
)
def privacy_l_diversity_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Distinct l-diversity release gate (operators/privacy.
    l_diversify): generalize c_acctbal onto 1000-wide bands and release a
    (nation, band) equivalence class only if it has >= k=3 members AND >=
    l=3 distinct market segments — k-anonymity hardened against the
    homogeneity attack (a class whose members all share the sensitive
    value leaks it at any k).  Same 100 TB shape as the k-anon gate: one
    bounded class aggregate, broadcast violator set, anti-join; the oracle
    recomputes both thresholds from scratch and key_sum pins row identity
    through the suppression join."""
    from aws_etl_fiap_spark.operators.privacy import generalize_band, l_diversify

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        generalize_band("c_acctbal", 1000.0).alias("bal_band"),
    )
    released = l_diversify(
        cust, ["c_nationkey", "bal_band"], "c_mktsegment", k=3, l=3
    )
    return released.groupBy("c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
        F.sum("c_custkey").cast("long").alias("key_sum"),
    )


@query(
    "privacy_dp_noisy_counts",
    oracle="""
WITH counts AS (
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
),
drawn AS (
    -- Hash input mirrors the operator's injective per-column escape
    -- (~ -> ~t, : -> ~c, NULL -> ~n); on this corpus (digit nation keys,
    -- clean uppercase segments) the escape is the identity.
    SELECT c_nationkey, c_mktsegment, n,
           (CAST(CAST('0x' || substr(md5(
                'dp-v1'
                || ':' || COALESCE(replace(replace(
                       CAST(c_nationkey AS VARCHAR), '~', '~t'), ':', '~c'), '~n')
                || ':' || COALESCE(replace(replace(
                       c_mktsegment, '~', '~t'), ':', '~c'), '~n')), 1, 15) AS BIGINT)
                 % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u
    FROM counts
)
SELECT c_nationkey, c_mktsegment,
       FLOOR((CAST(n AS DOUBLE)
              + (-1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)))
             * 1000000.0 + 0.5) / 1000000.0 AS noisy_count
FROM drawn
""",
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Epsilon-DP histogram release (operators/privacy.
    dp_noisy_counts): per-(nation, segment) customer counts + Laplace(1/1.0)
    noise, the aggregate-release side of the privacy surface (k-anon /
    l-diversity gate ROW releases; the Laplace mechanism gates COUNT
    releases).  The noise draw is derandomized through the portable-md5
    hash of (seed, group key) — reproducible across engines and re-runs, so
    a re-run cannot silently spend fresh privacy budget — and the true
    count never leaves the plan.  One map-side-combined aggregate; all
    noise arithmetic runs on the group-cardinality frame.  The oracle
    re-derives the same uniform grid draw and inverse CDF, so the exact
    released values are inside the hash gate.  NOTE: this gate publishes
    its seed so the oracle can re-derive the draw, which per the operator
    seed contract makes it a reproducible noised-release FIXTURE — a real
    DP release needs a secret per-release seed (see
    operators/privacy.dp_noisy_counts)."""
    from aws_etl_fiap_spark.operators.privacy import dp_noisy_counts

    cust = load_table(spark, sf_dir, "customer")
    return dp_noisy_counts(
        cust, ["c_nationkey", "c_mktsegment"], epsilon=1.0, seed="dp-v1"
    )


#: Shared by the batch gate below and the STREAMING twin
#: (queries/streaming_q.stream_psi_drift_equiv) — same bins, same Laplace
#: smoothing, same 6dp rounding.
PSI_ORACLE = """
WITH binned AS (
    SELECT CASE WHEN value < 5.0 THEN 0 WHEN value < 10.0 THEN 1
                WHEN value < 20.0 THEN 2 WHEN value < 50.0 THEN 3
                WHEN value < 100.0 THEN 4 WHEN value < 200.0 THEN 5
                ELSE 6 END AS bin,
           CASE WHEN EXTRACT(day FROM ts) > 15 THEN 1 ELSE 0 END AS cur
    FROM events
),
counts AS (
    SELECT bin,
           CAST(SUM(1 - cur) AS BIGINT) AS base_cnt,
           CAST(SUM(cur) AS BIGINT) AS cur_cnt
    FROM binned GROUP BY bin
),
tot AS (
    SELECT CAST(SUM(base_cnt) AS BIGINT) AS n_base,
           CAST(SUM(cur_cnt) AS BIGINT) AS n_cur
    FROM counts
)
SELECT bin, base_cnt, cur_cnt,
       FLOOR(CAST(base_cnt + 1 AS DOUBLE) / CAST(n_base + 7 AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS base_share,
       FLOOR(CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + 7 AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS cur_share,
       FLOOR((CAST(base_cnt + 1 AS DOUBLE) / CAST(n_base + 7 AS DOUBLE)
              - CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + 7 AS DOUBLE))
             * ln((CAST(base_cnt + 1 AS DOUBLE) / CAST(n_base + 7 AS DOUBLE))
                  / (CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + 7 AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS psi_term
FROM counts CROSS JOIN tot
"""


@query("dq_psi_value_drift", oracle=PSI_ORACLE)
def dq_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Population-Stability-Index drift gate
    (operators/stats.psi_drift): events `value` binned on fixed edges
    (5/10/20/50/100/200), baseline = days 1-15 vs current = days 16-30,
    Laplace-smoothed shares, per-bin PSI contribution.  One
    map-side-combined (bin, period) aggregate — a single scan at any
    corpus size; shares are exact int ratios so only the final ln needs
    the 6 dp round."""
    from aws_etl_fiap_spark.functions.parity import round_half_up
    from aws_etl_fiap_spark.operators.stats import psi_drift

    ev = load_table(spark, sf_dir, "events")
    out = psi_drift(
        ev,
        "value",
        F.dayofmonth("ts") > 15,
        (5.0, 10.0, 20.0, 50.0, 100.0, 200.0),
        # NULL-ts rows bucket into BASELINE, mirroring the oracle's
        # CASE ... ELSE 0 END — the default on_null="raise" would make the
        # gate crash on a corpus where its oracle still answers.
        on_null=False,
    )
    return out.select(
        "bin",
        "base_cnt",
        "cur_cnt",
        round_half_up("base_share", 6).alias("base_share"),
        round_half_up("cur_share", 6).alias("cur_share"),
        round_half_up("psi_term", 6).alias("psi_term"),
    )


@query(
    "privacy_t_closeness_release",
    oracle="""
WITH base AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS v
    FROM customer
),
g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS gv FROM base GROUP BY v),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM base),
cvc AS (
    SELECT c_nationkey, c_mktsegment, v, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM base GROUP BY c_nationkey, c_mktsegment, v
),
ncs AS (
    SELECT c_nationkey, c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS n
    FROM cvc GROUP BY c_nationkey, c_mktsegment
),
parts AS (
    SELECT cvc.c_nationkey, cvc.c_mktsegment,
           ABS(CAST(cnt AS DECIMAL(38,0)) * ntot
               - CAST(gv AS DECIMAL(38,0)) * n) AS term,
           gv
    FROM cvc JOIN g USING (v)
    JOIN ncs USING (c_nationkey, c_mktsegment)
    CROSS JOIN nn
),
cls AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(SUM(term) AS DECIMAL(38,0)) AS sp,
           CAST(SUM(gv) AS BIGINT) AS gp
    FROM parts GROUP BY c_nationkey, c_mktsegment
),
rel AS (
    SELECT cls.c_nationkey, cls.c_mktsegment, ncs.n,
           sp + CAST(ncs.n AS DECIMAL(38,0)) * (ntot - gp) AS s, ntot
    FROM cls JOIN ncs USING (c_nationkey, c_mktsegment) CROSS JOIN nn
)
SELECT c_nationkey, c_mktsegment, n,
       FLOOR((CAST(s AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)
              * CAST(ntot AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS dist
FROM rel
WHERE s * 5 <= CAST(n AS DECIMAL(38,0)) * (2 * ntot)
""",
)
def privacy_t_closeness_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] t-CLOSENESS release gate, t = 0.2
    (operators/privacy.t_closeness_release) — completing the anonymization
    ladder after k-anonymity and l-diversity: a (nation, segment) class is
    released only if its account-balance-band distribution sits within
    variational distance 0.2 of the corpus-wide distribution, the defense
    against the skewness attacks l-diversity misses.  The distance is
    evaluated over the common denominator so the decision is a pure
    DECIMAL(38,0) integer comparison (t_den*S <= 2*t_num*n*N) — no float
    enters the gate, and the reported distance rounds to 6 dp at output
    only.  One class-value-grid aggregate, broadcast global/class tables,
    corpus scanned once."""
    from aws_etl_fiap_spark.operators.privacy import (
        generalize_band,
        t_closeness_release,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        generalize_band("c_acctbal", 2000.0).alias("bal_band"),
    )
    return t_closeness_release(
        cust, ["c_nationkey", "c_mktsegment"], "bal_band", t_num=1, t_den=5
    )
