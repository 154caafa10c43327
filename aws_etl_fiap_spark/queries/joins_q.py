"""Join-family queries ([EXT] §2.3): outer/semi/anti/full, as-of, and range
joins over the star schema, all DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum
from aws_etl_fiap_spark.operators.joins import asof_join, range_join
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table


@query(
    "join_left_customer_orders",
    oracle=f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       {sql_dec_sum('o_totalprice', 2)} AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + aggregate: customers keep a row (n_orders=0,
    total_spent NULL) even with no orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dec_sum("o_totalprice", 2).alias("total_spent"),
        )
    )


@query(
    "join_semi_urgent_customers",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): no right-side columns, no row duplication —
    at scale this is a broadcast of the distinct filtered keys."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti_orderless_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
)
def join_anti_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no URGENT-priority order.

    Round-3 verdict: the original "no orders at all" predicate returned 0
    rows at this fixture (every customer has orders), so the green row only
    attested agreement on emptiness.  Anti-joining against the URGENT subset
    keeps the operator identical while the expected set is non-empty (203
    customers at sf0.01), so the hash now verifies actual anti-join output."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_nation_activity",
    oracle="""
WITH s AS (
    SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey
),
c AS (
    SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey
)
SELECT COALESCE(s.nk, c.nk) AS nationkey, n_suppliers, n_customers
FROM s FULL JOIN c ON s.nk = c.nk
""",
)
def join_full_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations with suppliers but no customers (and vice
    versa) survive with NULLs on the missing side."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk2"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return supp.join(cust, supp.nk == cust.nk2, "full").select(
        F.coalesce(F.col("nk"), F.col("nk2")).alias("nationkey"),
        "n_suppliers",
        "n_customers",
    )


@query(
    "join_asof_prev_low_order",
    oracle="""
SELECT a.o_orderkey, a.o_custkey,
       CAST(a.o_orderdate AS DATE) AS order_date,
       b.asof_o_orderkey, b.asof_o_totalprice
FROM orders a
LEFT JOIN LATERAL (
    SELECT b.o_orderkey AS asof_o_orderkey, b.o_totalprice AS asof_o_totalprice
    FROM orders b
    WHERE b.o_custkey = a.o_custkey
      AND b.o_orderpriority = '5-LOW'
      AND b.o_orderdate <= a.o_orderdate
    ORDER BY b.o_orderdate DESC, b.o_orderkey DESC
    LIMIT 1
) b ON TRUE
WHERE a.o_orderpriority = '1-URGENT'
""",
)
def join_asof_prev_low_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every urgent order, the customer's latest low-priority
    order at-or-before it. Union-merge implementation (operators.joins):
    one shuffle on custkey + one sort — no range cross-product."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW")
    out = asof_join(
        urgent,
        low,
        on=["o_custkey"],
        left_time="o_orderdate",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        right_tiebreak=["o_orderkey"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("order_date"),
        "asof_o_orderkey",
        "asof_o_totalprice",
    )


@query(
    "join_range_price_bands",
    oracle=f"""
WITH bands(band, lo, hi) AS (
    VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0), ('premium', 1200.0, 1000000000.0)
)
SELECT band,
       COUNT(*) AS n_parts,
       {sql_dec_avg('p_retailprice', 2)} AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
ORDER BY band
""",
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: parts assigned to price bands; the bands table
    broadcasts, the part table never shuffles for the join."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        range_join(part, bands, "p_retailprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dec_avg("p_retailprice", 2).alias("avg_price"),
        )
        .orderBy("band")
    )


@query(
    "join_nullsafe_status_dim",
    oracle="""
WITH f AS (
    SELECT NULLIF(o_orderstatus, 'O') AS k, o_totalprice FROM orders
),
d AS (
    SELECT DISTINCT NULLIF(o_orderstatus, 'O') AS k,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label
    FROM orders
)
SELECT d.status_label,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(f.o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
FROM f JOIN d ON f.k IS NOT DISTINCT FROM d.k
GROUP BY d.status_label
""",
)
def join_nullsafe_status_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.3] Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): a
    nullable join key (status 'O' nulled out — the common
    unknown-member-coded-as-NULL dimension case) joined so the NULL group
    MATCHES the NULL dimension row instead of silently dropping — the
    exact rows a plain equi-join would lose are the gate's point.  Still a
    hash join (null-safe equality is hashable); dim broadcasts."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    f = orders.select(
        F.expr("nullif(o_orderstatus, 'O')").alias("k"), "o_totalprice"
    )
    d = (
        orders.select(F.expr("nullif(o_orderstatus, 'O')").alias("k"))
        .distinct()
        .select("k", F.coalesce(F.col("k"), F.lit("open")).alias("status_label"))
    )
    return (
        f.join(F.broadcast(d), f["k"].eqNullSafe(d["k"]))
        .groupBy("status_label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", 2).alias("total_price"),
        )
    )


@query(
    "set_union_by_name_missing",
    oracle="""
WITH u AS (
    SELECT o_orderkey AS k, o_totalprice AS amount, 'orders' AS src
    FROM orders
    UNION ALL BY NAME
    SELECT l_orderkey AS k, l_extendedprice AS amount, 'lineitem' AS src,
           l_quantity AS qty
    FROM lineitem
)
SELECT src,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN qty IS NULL THEN 1 END) AS n_missing_qty,
       CAST(SUM(CAST(amount AS DECIMAL(38,2))) AS DOUBLE) AS total_amount
FROM u GROUP BY src
""",
)
def set_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.7] Schema-mismatched union (unionByName with
    allowMissingColumns / DuckDB UNION ALL BY NAME): two feeds with
    different column sets align BY NAME and the absent column backfills
    NULL — the multi-source concat (reference S2) generalized to drifted
    schemas.  The NULL-backfill count per source pins the semantics."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("amount"),
        F.lit("orders").alias("src"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_extendedprice").alias("amount"),
        F.lit("lineitem").alias("src"),
        F.col("l_quantity").alias("qty"),
    )
    u = orders.unionByName(li, allowMissingColumns=True)
    return u.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("qty").isNull(), F.lit(1))).alias("n_missing_qty"),
        dec_sum("amount", 2).alias("total_amount"),
    )


@query(
    "join_interval_overlap_promo",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
),
marked AS (
    SELECT *,
        CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
),
sess AS (
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM islands GROUP BY user_id, session_id
),
pw AS (
    SELECT promo_day,
           CAST(promo_day AS TIMESTAMP) + INTERVAL 12 HOUR AS wstart,
           CAST(promo_day AS TIMESTAMP) + INTERVAL 14 HOUR AS wend
    FROM (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS promo_day
          FROM events)
),
cand AS (
    SELECT pw.promo_day,
           GREATEST(0, date_diff('microsecond',
                                 GREATEST(s.session_start, pw.wstart),
                                 LEAST(s.session_end, pw.wend))) AS overlap_us
    FROM sess s JOIN pw
      ON pw.promo_day BETWEEN CAST(s.session_start AS DATE)
                          AND CAST(s.session_end AS DATE)
)
SELECT promo_day,
       COUNT(*) AS n_candidate_sessions,
       COUNT(CASE WHEN overlap_us > 0 THEN 1 END) AS n_overlapping,
       CAST(SUM(overlap_us) AS BIGINT) AS total_overlap_us
FROM cand GROUP BY promo_day
""",
)
def join_interval_overlap_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.3 temporal] Interval-overlap join: user activity sessions
    (the gaps-and-islands frame, reused from events_islands_sessionize)
    against a daily 12:00-14:00 promo window calendar — candidates via
    day-binning (each session EXPLODES into the dates it covers, so a
    midnight-spanning session still meets every day's window exactly
    once), then the exact microsecond overlap
    ``greatest(0, least(ends) - greatest(starts))`` on the NTZ axis.
    Scale shape: the session stream joins the BROADCAST calendar on the
    day key — no shuffle beyond sessionization itself and the final
    per-day rollup; overlap math is expression-only."""
    from aws_etl_fiap_spark.queries.analytics2_q import events_islands_sessionize

    sess = events_islands_sessionize(spark, sf_dir).select(
        "session_start", "session_end"
    )
    promo = (
        load_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("promo_day"))
        .distinct()
        .select(
            "promo_day",
            F.expr(
                "cast(promo_day as timestamp_ntz) + INTERVAL 12 HOURS"
            ).alias("wstart"),
            F.expr(
                "cast(promo_day as timestamp_ntz) + INTERVAL 14 HOURS"
            ).alias("wend"),
        )
    )
    exploded = sess.withColumn(
        "promo_day",
        F.explode(
            F.sequence(F.to_date("session_start"), F.to_date("session_end"))
        ),
    )
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.expr(
            "timestampdiff(MICROSECOND, greatest(session_start, wstart),"
            " least(session_end, wend))"
        ),
    )
    return (
        exploded.join(F.broadcast(promo), "promo_day")
        .select("promo_day", overlap.alias("overlap_us"))
        .groupBy("promo_day")
        .agg(
            F.count(F.lit(1)).alias("n_candidate_sessions"),
            F.count(F.when(F.col("overlap_us") > 0, F.lit(1))).alias(
                "n_overlapping"
            ),
            F.sum("overlap_us").alias("total_overlap_us"),
        )
    )


@query(
    "join_bloom_prefiltered",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
       {sql_dec_sum('l_extendedprice', 2)} AS revenue
FROM lineitem
JOIN (
    SELECT o_orderkey
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0
) sel ON l_orderkey = sel.o_orderkey
GROUP BY l_returnflag
""",
)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.3] Bloom-prefiltered join (operators/joins.py
    bloom_prefiltered_join): a selective orders slice joins lineitem, but
    the probe side is reduced by a broadcast Bloom filter BEFORE the
    join's shuffle — at 100 TB the shuffle carries |matches| plus the
    false-positive residue instead of the whole fact table.

    The oracle is the PLAIN join: prefiltering must be invisible in the
    result (no false negatives by construction; false positives are
    removed by the real join), so any row the filter wrongly dropped or
    the plumbing duplicated hash-fails.  The membership test itself is
    plan-gated in tests/test_plan_quality.py: chained broadcast joins, no
    probe-side shuffle before the filter."""
    from aws_etl_fiap_spark.operators.joins import bloom_prefiltered_join

    li = load_table(spark, sf_dir, "lineitem")
    sel = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderkey") % 5 == 0)
        )
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    joined = bloom_prefiltered_join(li, sel, ["l_orderkey"], n_bits=1 << 18)
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").alias("key_sum"),
        dec_sum("l_extendedprice", 2).alias("revenue"),
    )
