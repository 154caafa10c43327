"""Analytic-SQL surface, part 2 ([EXT]): pivot/unpivot reshaping, the
remaining window-function family (lead / first_value / last_value / ntile),
and gaps-and-islands sessionization expressed Spark-side (the lag + running-
sum island composition, complementing events_q's F.session_window form).

All DuckDB-oracled. events.ts casts to µs TIMESTAMP on the oracle side
(parquet timestamp[ns] — see events_q module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, sql_dec_sum
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

_TS = "CAST(ts AS TIMESTAMP)"

ORDER_STATUSES = ("F", "O", "P")


@query(
    "pivot_priority_by_status",
    oracle=f"""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P,
       {sql_dec_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", 2)}
           AS F_total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order counts per priority with one column per
    status. The status values are ENUMERATED (not discovered) — at 100 TB an
    unvalued pivot runs an extra distinct-scan job just to learn the columns.
    Counts coalesce to 0 so absent combinations match the SQL conditional-sum
    form."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .agg(F.count(F.lit(1)))
    )
    f_total = (
        orders.groupBy("o_orderpriority")
        .agg(
            dec_sum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0), 2
            ).alias("F_total")
        )
    )
    return (
        wide.join(f_total, "o_orderpriority")
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in ORDER_STATUSES],
            "F_total",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value
FROM (
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 100
)
""",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long): three measure columns become (measure,
    value) rows — one pass over the input (Spark's Expand node), vs the
    oracle's 3x UNION ALL re-scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


@query(
    "window_lead_first_last_ntile",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS last_order,
       NTILE(4) OVER w AS quartile
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lead_first_last_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window family in one pass: lead (forward
    offset), first/last value (frame endpoints — last_value needs the full
    frame, the classic default-frame trap), ntile bucketing. One hash
    exchange on o_custkey serves all four functions; (o_orderdate,
    o_orderkey) is a total order so every output is deterministic."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "events_islands_sessionize",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
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
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       {sql_dec_sum('value', 2)} AS total_value
FROM islands
GROUP BY user_id, session_id
""",
)
def events_islands_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization built from primitives — lag gap flag,
    running-sum island id, grouped rollup — the composition F.session_window
    hides, spelled out (and the form that generalizes to non-time islands:
    status runs, sequence breaks). Two window passes + one aggregate over a
    single user_id exchange."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Compare gaps in MICROSECONDS: ts carries µs, and a cast to long would
    # truncate to seconds — a 1800.5s gap must break the session on both
    # engines identically.  timestampdiff on the NTZ epoch (not
    # unix_micros, which requires an instant and would re-introduce the
    # session-tz coupling the NTZ read path removed).
    micros = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
    gap = micros - F.lag(micros).over(w)
    marked = e.withColumn(
        "brk", F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    )
    islands = marked.withColumn(
        "session_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islands.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", 2).alias("total_value"),
    )


@query(
    "profile_histogram_totalprice",
    oracle="""
WITH b AS (
    SELECT LEAST(19, GREATEST(0, CAST(FLOOR((o_totalprice - 0.0) / 25000.0) AS INT))) AS bucket,
           o_totalprice
    FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT bucket,
       0.0 + CAST(bucket AS DOUBLE) * 25000.0 AS bucket_lo,
       0.0 + CAST(bucket + 1 AS DOUBLE) * 25000.0 AS bucket_hi,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_value,
       MIN(o_totalprice) AS min_value,
       MAX(o_totalprice) AS max_value
FROM b GROUP BY bucket
""",
)
def profile_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Equi-width histogram profile (operators/aggregates.
    equi_width_histogram): o_totalprice bucketed into 20 fixed 25k-wide
    bins with per-bin count / exact-decimal sum / true min-max — the
    one-pass distribution profile for range-partition planning and DQ
    drift.  Bucketing is explicit floor arithmetic (identical IEEE ops on
    both engines), clamped to the edge bins."""
    from aws_etl_fiap_spark.operators.aggregates import equi_width_histogram

    orders = load_table(spark, sf_dir, "orders")
    hist = equi_width_histogram(orders, "o_totalprice", 0.0, 500000.0, 20)
    return hist.select(
        "bucket", "bucket_lo", "bucket_hi", "n_rows", "sum_value", "min_value", "max_value"
    )


@query(
    "pareto_parts_price_size",
    oracle="""
WITH best AS (
    SELECT p_retailprice, MAX(p_size) AS p_size FROM part GROUP BY p_retailprice
),
fr AS (
    SELECT p_retailprice, p_size,
           MAX(p_size) OVER (ORDER BY p_retailprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
    FROM best
),
keep AS (
    SELECT p_retailprice, p_size FROM fr WHERE prev IS NULL OR p_size > prev
)
SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
FROM part p JOIN keep USING (p_retailprice, p_size)
""",
)
def pareto_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT A-EXT] 2-D skyline (operators/aggregates.pareto_frontier_2d):
    parts not dominated on (cheaper price, larger size) — the classic
    skyline/Pareto-frontier DB operator.  Raw rows pay one groupBy to the
    per-price best; the dominance scan is a running-max window over the
    DISTINCT-price frame only; survivors join back so both-dimension ties
    all surface.  Selections and integer/double comparisons only — no
    arithmetic, exact-hash trivial."""
    from aws_etl_fiap_spark.operators.aggregates import pareto_frontier_2d

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    return pareto_frontier_2d(part, "p_retailprice", "p_size")


@query(
    "score_tree_segments_events",
    oracle=f"""
WITH s AS (
    SELECT CASE
        WHEN event_type = 'purchase' THEN
            CASE WHEN value > 100.0 THEN 'purchase_high' ELSE 'purchase_low' END
        WHEN isodow({_TS}) - 1 < 5 THEN
            CASE WHEN event_type = 'click' THEN 'weekday_click'
                 ELSE 'weekday_other' END
        ELSE 'weekend' END AS segment,
        value
    FROM events
)
SELECT segment, COUNT(*) AS n_events,
       {sql_dec_sum('value', 2)} AS total_value
FROM s GROUP BY segment
""",
)
def score_tree_segments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.10 alternative] Model inference WITHOUT a UDF: a depth-3
    decision tree (the rule-based scorecard shape exported by tree
    trainers) compiled to nested CASE expressions — whole-stage-codegen
    JVM scoring, zero Python in the loop, identical branch semantics in
    DuckDB.  The pattern that replaces row-at-a-time model UDFs for any
    tree/rule model at 100 TB: one pruned scan, one aggregate."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    segment = (
        F.when(
            F.col("event_type") == "purchase",
            F.when(F.col("value") > 100.0, "purchase_high").otherwise(
                "purchase_low"
            ),
        )
        .when(
            F.expr("weekday(ts)") < 5,
            F.when(F.col("event_type") == "click", "weekday_click").otherwise(
                "weekday_other"
            ),
        )
        .otherwise("weekend")
    )
    return (
        ev.select(segment.alias("segment"), "value")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", 2).alias("total_value"),
        )
    )


@query(
    "text_top_sources_with_other",
    oracle="""
WITH grid AS (
    SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
),
r AS (
    SELECT lang, source, n,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, source ASC) AS rn
    FROM grid
)
SELECT lang,
       CASE WHEN rn <= 2 THEN source ELSE 'other' END AS source_label,
       CAST(SUM(n) AS BIGINT) AS n_docs
FROM r
GROUP BY lang, CASE WHEN rn <= 2 THEN source ELSE 'other' END
""",
)
def text_top_sources_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] Top-k-plus-other reporting rollup: per language the two
    largest sources keep their names, the tail collapses into 'other' —
    the long-tail truncation every dashboard rollup needs.  The ranking
    window runs over the (lang, source) COUNT GRID, never the raw
    corpus; deterministic (count DESC, source ASC) tiebreak."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    grid = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("source").asc())
    labeled = grid.withColumn("rn", F.row_number().over(w)).select(
        "lang",
        F.when(F.col("rn") <= 2, F.col("source")).otherwise("other").alias(
            "source_label"
        ),
        "n",
    )
    return labeled.groupBy("lang", "source_label").agg(
        F.sum("n").alias("n_docs")
    )


@query(
    "profile_equidepth_totalprice",
    oracle="""
WITH vals AS (
    SELECT o_totalprice AS v FROM orders WHERE o_totalprice IS NOT NULL
),
g AS (SELECT v, COUNT(*) AS cnt FROM vals GROUP BY v),
r AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM g),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
idx AS (SELECT unnest(range(1, 8)) AS i),
bounds AS (
    SELECT i, MIN(v) AS bval
    FROM r CROSS JOIN nn JOIN idx
      ON r.cum >= CAST(FLOOR((idx.i * nn.n + 7) / 8.0) AS BIGINT)
    GROUP BY i
),
barr AS (SELECT list(bval ORDER BY i) AS barr FROM bounds)
SELECT CAST(1 + len(list_filter(barr, b -> v > b)) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(v) AS lo, MAX(v) AS hi,
       CAST(SUM(CAST(v AS DECIMAL(38,2))) AS DOUBLE) AS sum_v
FROM vals CROSS JOIN barr
GROUP BY bucket
""",
)
def profile_equidepth_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] EQUI-DEPTH histogram of order totals, k=8
    (operators/aggregates.equi_depth_histogram) — the skew-proof profile
    the equi-width sibling cannot give: boundaries sit at exact INTEGER
    rank quantiles over the distinct-value frame (two-pass prefix sum, no
    row-sized window, no interpolation), ride back as one broadcast
    array, and the bucket index is a pure counting expression — so the
    whole profile, boundaries included, is re-derived bit-exactly by the
    DuckDB twin.  This is the statistics pass behind range-partition
    planning: equal-population ranges are what you split a skewed 100 TB
    column by."""
    from aws_etl_fiap_spark.operators.aggregates import equi_depth_histogram

    orders = load_table(spark, sf_dir, "orders")
    return equi_depth_histogram(orders, "o_totalprice", 8)
