"""Reference-surface queries (SURVEY.md §2.2/2.4/2.5/2.6/2.7): the operators
the reference pipeline actually executes, run over the driver's testdata.

The flagship pair (refined detail + monthly summary) IS the reference's EP2
pipeline (src/glue/b3_transform.py) re-keyed onto lineitem:
ticker -> l_suppkey, quote date -> l_shipdate, close -> l_extendedprice,
volume -> l_quantity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import (
    dec_avg,
    round_half_up,
    sql_dec_avg,
    sql_round_half_up,
)
from aws_etl_fiap_spark.operators.cleaning import filter_nulls
from aws_etl_fiap_spark.operators.columns import add_date_parts, cast_to_date
from aws_etl_fiap_spark.plans.refined import LINEITEM_SPEC, refined_detail, refined_summary
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table, register_views

# Shared WINDOW clause for the oracle: the same total order the Spark plan
# uses (date, then unique (orderkey, linenumber) tiebreak).
_ORACLE_DETAIL = """
WITH detail AS (
    SELECT
        l_suppkey,
        CAST(l_shipdate AS DATE) AS date,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS year,
        CAST(EXTRACT(month FROM l_shipdate) AS INT) AS month,
        l_extendedprice AS preco_fechamento,
        l_quantity AS volume_negociado,
        LAG(l_extendedprice, 7) OVER w AS preco_7d_atras,
        LAG(l_extendedprice, 30) OVER w AS preco_30d_atras,
        l_orderkey,
        l_linenumber
    FROM lineitem
    WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
      AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    WINDOW w AS (
        PARTITION BY l_suppkey
        ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber
    )
),
var AS (
    SELECT *,
        CASE WHEN preco_7d_atras IS NOT NULL
             THEN FLOOR((preco_fechamento - preco_7d_atras) / preco_7d_atras * 100.0 * 100.0 + 0.5) / 100.0
        END AS variacao_7d,
        CASE WHEN preco_30d_atras IS NOT NULL
             THEN FLOOR((preco_fechamento - preco_30d_atras) / preco_30d_atras * 100.0 * 100.0 + 0.5) / 100.0
        END AS variacao_30d
    FROM detail
)
"""


@query(
    "flagship_refined_summary",
    oracle=_ORACLE_DETAIL
    + """
SELECT
    l_suppkey, year, month,
    COUNT(*) AS total_registros,
    CAST(SUM(CAST(volume_negociado AS DECIMAL(38,2))) AS DOUBLE) AS volume_total,
    CAST(SUM(CAST(preco_fechamento AS DECIMAL(38,2))) AS DOUBLE) / COUNT(preco_fechamento) AS preco_medio,
    FLOOR(MIN(preco_fechamento) * 100.0 + 0.5) / 100.0 AS preco_minimo,
    FLOOR(MAX(preco_fechamento) * 100.0 + 0.5) / 100.0 AS preco_maximo,
    CAST(SUM(CAST(variacao_7d AS DECIMAL(38,2))) AS DOUBLE) / COUNT(variacao_7d) AS variacao_7d_media,
    CAST(SUM(CAST(variacao_30d AS DECIMAL(38,2))) AS DOUBLE) / COUNT(variacao_30d) AS variacao_30d_media
FROM var
GROUP BY l_suppkey, year, month
ORDER BY l_suppkey, year, month
""",
)
def flagship_refined_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 end-to-end: null-filter -> date parts -> rename -> lag(7/30)
    pct-change -> monthly groupBy summary -> order (reference requirement A)."""
    return refined_summary(load_table(spark, sf_dir, "lineitem"), LINEITEM_SPEC)


@query(
    "refined_detail_lag",
    oracle=_ORACLE_DETAIL
    + """
SELECT l_suppkey, date, year, month, preco_fechamento, volume_negociado,
       preco_7d_atras, preco_30d_atras, variacao_7d, variacao_30d,
       l_orderkey, l_linenumber
FROM var
""",
)
def refined_detail_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 row-level output (reference requirements B+C): renames + row-offset
    lag(7)/lag(30) with null-propagating rounded pct-change (W1/P9/P10)."""
    return refined_detail(load_table(spark, sf_dir, "lineitem"), LINEITEM_SPEC)


@query(
    "null_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  AND l_returnflag IS NOT NULL AND l_shipdate IS NOT NULL
  AND l_returnflag = 'R' AND l_quantity >= 45
""",
)
def null_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (conjunctive isNotNull filter) + P8 (column projection) + value
    predicate; Catalyst pushes all of it into the parquet scan."""
    df = load_table(spark, sf_dir, "lineitem")
    df = filter_nulls(df, ["l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"])
    return df.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


@query(
    "date_parts_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS month,
       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS day,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS quarter
FROM orders
""",
)
def date_parts_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 + F1/F2: timestamp->date cast and integer date-part extraction."""
    df = cast_to_date(load_table(spark, sf_dir, "orders"), "o_orderdate", out="order_date")
    df = add_date_parts(df, "order_date")
    return df.select(
        "o_orderkey",
        "order_date",
        "year",
        "month",
        F.dayofmonth("order_date").alias("day"),
        F.quarter("order_date").alias("quarter"),
    )


@query(
    "rename_literal_hyphen",
    oracle="""
SELECT o_orderkey AS order_id,
       o_totalprice AS total_price,
       'orders' AS source_table,
       o_totalprice * 0.1 AS "tax-amount"
FROM orders
WHERE o_orderstatus = 'O'
""",
)
def rename_literal_hyphen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (rename) + P5 (literal append) + the reference's hyphenated-
    identifier edge case (``stock-splits`` style, b3_collector.py:78)."""
    df = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        df.withColumnsRenamed({"o_orderkey": "order_id", "o_totalprice": "total_price"})
        .withColumn("source_table", F.lit("orders"))
        .withColumn("tax-amount", F.col("total_price") * 0.1)
        .select("order_id", "total_price", "source_table", "tax-amount")
    )


@query(
    "conditional_round",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount > 0.05
            THEN {sql_round_half_up('l_extendedprice * (1 - l_discount)', 2)}
       END AS discounted_price,
       {sql_round_half_up('l_extendedprice * l_tax', 2)} AS tax_amount
FROM lineitem
""",
)
def conditional_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 (when/otherwise) + P10/F4/F5 (arithmetic + rounding): the
    pct-change expression pattern in isolation, with parity-safe half-up
    rounding (see functions.parity for why not engine ROUND)."""
    df = load_table(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_discount") > 0.05,
            round_half_up(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2),
        )
        .otherwise(F.lit(None))
        .alias("discounted_price"),
        round_half_up(F.col("l_extendedprice") * F.col("l_tax"), 2).alias("tax_amount"),
    )


@query(
    "sort_limit_topn",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O4: global sort + LIMIT under a total order. Spark executes this as
    TakeOrderedAndProject (per-partition top-N + merge), never a full sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "union_all_sources",
    oracle="""
SELECT o_orderkey, o_totalprice, 'high_value' AS bucket
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey, o_totalprice, 'priority' AS bucket
FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union-all of homogeneous frames (the reference's pd.concat over
    per-ticker frames, b3_collector.py:72) — overlap preserved, no dedup."""
    orders = load_table(spark, sf_dir, "orders")
    high = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice", F.lit("high_value").alias("bucket"))
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice", F.lit("priority").alias("bucket"))
    )
    return high.unionByName(urgent)


@query(
    "distinct_pairs",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DISTINCT (hash-aggregate without agg functions)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "keyed_stats_single",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS total_registros,
       {sql_dec_avg('l_extendedprice', 2)} AS l_extendedprice_avg,
       {sql_dec_avg('l_discount', 2)} AS l_discount_avg
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def keyed_stats_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: single-key hash aggregate with exact-decimal averages
    (b3_transform.py:336-344)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("total_registros"),
            dec_avg("l_extendedprice", 2).alias("l_extendedprice_avg"),
            dec_avg("l_discount", 2).alias("l_discount_avg"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "global_count",
    oracle="""
SELECT
    (SELECT COUNT(*) FROM lineitem) AS lineitem_rows,
    (SELECT COUNT(*) FROM orders) AS orders_rows,
    (SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NULL) AS null_quantity_rows
""",
)
def global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: global count actions + null-accounting delta, expressed as one
    single-row DataFrame instead of the reference's repeated .count() jobs."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    counts = li.agg(
        F.count(F.lit(1)).alias("lineitem_rows"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_quantity_rows"),
    )
    return counts.crossJoin(orders.agg(F.count(F.lit(1)).alias("orders_rows"))).select(
        "lineitem_rows", "orders_rows", "null_quantity_rows"
    )


_ATHENA_SQL = """
SELECT l_suppkey AS ticker,
       COUNT(*) AS total_registros,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS volume_total,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE)
             / COUNT(l_extendedprice) * 1e2 + 5e-1) / 1e2 AS preco_medio
FROM lineitem
WHERE l_suppkey < 50
GROUP BY l_suppkey
ORDER BY l_suppkey
LIMIT 25
"""


@query("sql_athena_canonical", oracle=_ATHENA_SQL)
def sql_athena_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3, the Athena-replacement surface: the reference's canonical
    catalog query (reference b3_transform.py:367-380 — GROUP BY with
    COUNT/SUM/ROUND(AVG), ORDER BY, LIMIT) as a raw SQL STRING through
    ``spark.sql`` over registered views — parser -> analyzer -> same Catalyst
    plan as the DataFrame form. The SQL text itself is the oracle: one
    string, two engines, identical results (decimal sums + FLOOR rounding
    per functions/parity; numeric literals are written 1e2-style because a
    bare 100.0 parses as DECIMAL in Spark SQL but DOUBLE in the DataFrame
    API, and decimal arithmetic would change the output type)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_ATHENA_SQL)


_HINTED_SQL = """
SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
"""


@query(
    "sql_hint_broadcast_join",
    oracle=_HINTED_SQL,
)
def sql_hint_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 [EXT]: join-strategy HINTS through the SQL surface — the same
    query text as the oracle plus ``/*+ BROADCAST(customer) */``. Hints are
    how an Athena-style SQL user forces the physical strategy without
    touching code; tests/test_plan_quality.py proves the hint overrides even
    a disabled auto-broadcast threshold. Values are hint-invariant, so the
    un-hinted oracle must match exactly."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_HINTED_SQL.replace("SELECT", "SELECT /*+ BROADCAST(customer) */", 1))


_RECURSIVE_SPARK_SQL = """
WITH RECURSIVE up(o_orderkey, cur, depth) AS (
    SELECT o_orderkey, o_orderkey, 0 FROM orders
    UNION ALL
    SELECT o_orderkey, cur DIV 7, depth + 1 FROM up WHERE cur >= 7
)
SELECT o_orderkey, cur AS root, depth FROM up WHERE cur < 7
"""


@query(
    "sql_recursive_hierarchy",
    oracle="""
WITH RECURSIVE up(o_orderkey, cur, depth) AS (
    SELECT o_orderkey, o_orderkey, 0 FROM orders
    UNION ALL
    SELECT o_orderkey, cur // 7, depth + 1 FROM up WHERE cur >= 7
)
SELECT o_orderkey, cur AS root, depth FROM up WHERE cur < 7
""",
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT EP3, Spark 4 SQL surface] Recursive CTE (WITH RECURSIVE, new in
    Spark 4.0): climb a synthetic forest where parent(k) = k DIV 7 until the
    root (< 7), emitting (key, root, depth) — the hierarchy/bill-of-materials
    traversal shape.  Depth is O(log key), so the iterative union converges
    in ~6 rounds at any SF; each round is a narrow filter+project over the
    frontier, no joins.  The oracle is the same recursive query in DuckDB
    (integer division spelled // there, DIV here)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_SPARK_SQL)
