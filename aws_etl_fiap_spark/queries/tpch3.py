"""TPC-H queries 2, 11, 21 — the last of the 22, adapted to the driver's
column subset ([EXT] joins/subqueries, SURVEY.md §2.3).

The testdata has no partsupp table, so Q2/Q11 derive the part<->supplier
relation from lineitem: ``ps_supplycost`` := MIN(l_extendedprice / l_quantity)
per (partkey, suppkey) for Q2, and per-part "stock value" := the discounted
revenue a nation's suppliers shipped for Q11. Q21 has no
l_commitdate/l_receiptdate, so "kept waiting" means shipped >60 days after the
order date (same adaptation as tpch_q4). The decorrelation SHAPE each query
exercises is the point and is preserved:

- Q2  — correlated scalar MIN subquery -> per-group window min + equality
  filter (no second scan of the fact table);
- Q11 — HAVING against a global scalar subquery -> broadcast scalar join;
- Q21 — EXISTS + correlated NOT EXISTS over the same fact table -> one
  distinct-count aggregate per order joined back (one shuffle, not two
  semi/anti passes over lineitem).

Parity: MIN over doubles and IEEE division are order-independent; money sums
use functions.parity decimal fixed-point; Q21 compares only counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, sql_dec_sum
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH supply AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
FROM part
JOIN supply ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 10 AND p_type LIKE '%ARGE' AND r_name = 'EUROPE'
  AND ps_supplycost = (
      SELECT MIN(s2.ps_supplycost)
      FROM supply s2
      JOIN supplier sp2 ON s2.ps_suppkey = sp2.s_suppkey
      JOIN nation n2 ON sp2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE s2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: supply relation derived from lineitem — see module
    docstring): cheapest EUROPE supplier per selected part. The correlated
    scalar-MIN subquery is decorrelated into a window MIN over partkey so the
    supply aggregate is computed ONCE; part and the region-filtered supplier
    dimension both broadcast, so the only shuffles are the supply groupBy and
    the window repartition. Cites reference scope: no joins exist in the
    reference (SURVEY.md §2.3); this is the [EXT] Athena-SQL surface."""
    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))

    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    eu_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & F.col("p_type").like("%ARGE")
    )

    cand = supply.join(
        F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey")
    ).join(F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
WITH nation_supply AS (
    SELECT l_partkey AS ps_partkey, {_DISC_PRICE} AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
)
SELECT ps_partkey, {sql_dec_sum("value", 4)} AS value
FROM nation_supply
GROUP BY ps_partkey
HAVING {sql_dec_sum("value", 4)} >
       (SELECT {sql_dec_sum("value", 4)} FROM nation_supply) * 1e-3
ORDER BY value DESC, ps_partkey
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: per-part "stock value" = discounted revenue shipped
    by NATION_3's suppliers, since there is no partsupp): parts whose value
    exceeds 0.1% of the nation total. The HAVING-against-global-scalar shape
    becomes: aggregate once per part in exact DECIMAL, re-aggregate that small
    frame for the grand total (exact decimal sum of decimal partials == direct
    global decimal sum, so lineitem is scanned ONCE), broadcast the scalar
    back, filter. Nation-filtered supplier dim broadcasts into the fact scan."""
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,4)"
                )
            ).alias("value_dec")
        )
    )
    total = per_part.agg(F.sum("value_dec").cast("double").alias("total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("total") * 1e-3)
        .select("ps_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: "late" = shipped >60 days after order date, no
    receipt/commit dates in testdata): NATION_3 suppliers who were the SOLE
    late supplier on a multi-supplier finished order. The EXISTS + correlated
    NOT EXISTS pair over lineitem is decorrelated into ONE per-order
    distinct-count aggregate (suppliers on the order; late suppliers on the
    order) joined back to the late rows — one extra shuffle total, versus the
    naive plan's two more passes over the fact table. The oracle keeps the
    textbook correlated form, so parity proves the rewrite. The per-order
    frame feeds both the aggregate and the join-back, so it is persisted."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "late")
        .persist()  # feeds the per-order aggregate AND the join-back
    )
    # Two narrow aggregates instead of two countDistincts: a double
    # countDistinct plans an Expand (2x the shuffle rows); dedup to
    # (order, supplier) pairs first, then plain count/sum — measured 2x faster
    # at sf0.1 and the first aggregate's output is tiny.
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late_any"))
    st = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late_any").cast("int")).alias("n_late"),
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        li.filter(F.col("late"))
        .join(st, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
