"""Event-table queries: JSON extraction (reference [EXT] F-series) and
event-time windows (§2.9) in batch mode, all DuckDB-oracled.

Timestamp parity: events.ts is parquet timestamp[ns]; Spark truncates to
microseconds on read, DuckDB preserves ns (TIMESTAMP_NS). Every oracle casts
``ts`` to plain TIMESTAMP (µs) first so both engines window the same values.
Window starts are epoch-aligned in both engines (Spark ``F.window`` floors
the epoch; the oracle floors epoch_us with integer division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, sql_dec_sum
from aws_etl_fiap_spark.operators.events import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table


@query(
    "events_json_extract",
    oracle=r"""
SELECT event_id, event_type,
       CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k
FROM events
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] JSON field extraction from events.props (get_json_object ->
    Catalyst JsonPath, no Python UDF)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
    )


@query(
    "events_json_typed_parse",
    oracle=r"""
SELECT event_id,
       CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k,
       CASE WHEN regexp_extract(props, '"k":\s*(\d+)', 1) = '' THEN 0 ELSE 1 END AS parsed_ok
FROM events
WHERE event_type = 'click'
""",
)
def events_json_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] schema-enforced JSON parse: from_json into a typed struct (the
    JacksonParser path — one parse yields EVERY field, vs one JsonPath walk
    per get_json_object call; the right shape when props carries many keys).
    A null struct flags unparseable rows instead of failing."""
    parsed = F.from_json(F.col("props"), "k int")
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            parsed.getField("k").alias("k"),
            F.when(parsed.getField("k").isNotNull(), 1).otherwise(0).alias("parsed_ok"),
        )
    )


@query(
    "events_json_agg",
    oracle=r"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS BIGINT) AS k_total,
       CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS DOUBLE)
           / COUNT(regexp_extract(props, '"k":\s*(\d+)', 1)) AS k_avg
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] aggregate over an extracted JSON field (exact integer sum, so
    engine-order-independent; avg as exact-sum / count)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        load_table(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_total"),
            (F.sum("k").cast("double") / F.count("k")).alias("k_avg"),
        )
        .orderBy("event_type")
    )


@query(
    "events_variant_agg",
    oracle=r"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS BIGINT) AS k_total,
       MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS k_max
FROM events
GROUP BY event_type
""",
)
def events_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Spark 4 VARIANT path for semi-structured props: ``parse_json``
    ingests the JSON ONCE into Variant's binary encoding, then every
    ``variant_get`` is a cheap typed walk of that encoding — at 100 TB the
    parse cost is paid once per row regardless of how many fields downstream
    expressions pull, where stacked ``get_json_object`` calls re-parse the
    string per field.  The oracle recomputes the same cells from the raw
    string, so the hash verifies the whole variant encode/decode round
    trip."""
    v = F.parse_json(F.col("props"))
    return (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.variant_get(v, "$.k", "int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("k_total"),
            F.max("k").alias("k_max"),
        )
    )


_TS = "CAST(ts AS TIMESTAMP)"
_US_10MIN = 600 * 1_000_000
_US_5MIN = 300 * 1_000_000


@query(
    "events_tumbling_10min",
    oracle=f"""
SELECT make_timestamp((epoch_us({_TS}) // {_US_10MIN}) * {_US_10MIN}) AS window_start,
       make_timestamp((epoch_us({_TS}) // {_US_10MIN}) * {_US_10MIN} + {_US_10MIN}) AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dec_sum('value', 2)} AS total_value
FROM events
GROUP BY ALL
""",
)
def events_tumbling_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] tumbling 10-minute window per event_type (F.window; identical
    expression works under readStream)."""
    df = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        df,
        "ts",
        "10 minutes",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", 2).alias("total_value"),
        ],
    )


@query(
    "events_sliding_10min_5min",
    oracle=f"""
WITH buckets AS (
    SELECT (epoch_us({_TS}) // {_US_5MIN}) * {_US_5MIN} AS floor5, value FROM events
),
assigned AS (
    SELECT floor5 AS start_us, value FROM buckets
    UNION ALL
    SELECT floor5 - {_US_5MIN} AS start_us, value FROM buckets
)
SELECT make_timestamp(start_us) AS window_start,
       make_timestamp(start_us + {_US_10MIN}) AS window_end,
       COUNT(*) AS n_events,
       {sql_dec_sum('value', 2)} AS total_value
FROM assigned
GROUP BY start_us
""",
)
def events_sliding_10min_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] sliding window (10 min length, 5 min slide): every event lands in
    exactly two windows; Spark replicates rows pre-partial-agg."""
    df = load_table(spark, sf_dir, "events")
    return sliding_window_agg(
        df,
        "ts",
        "10 minutes",
        "5 minutes",
        keys=[],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", 2).alias("total_value"),
        ],
    )


@query(
    "events_session_30min",
    oracle=f"""
WITH e AS (
    SELECT user_id, {_TS} AS ts, value FROM events
),
marked AS (
    SELECT *,
        CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       COUNT(*) AS n_events,
       {sql_dec_sum('value', 2)} AS total_value
FROM sessions
GROUP BY user_id, sid
""",
)
def events_session_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] session windows (30-min gap) per user: F.session_window in batch;
    the oracle rebuilds sessions via gap-flag + running-sum islands."""
    df = load_table(spark, sf_dir, "events")
    return session_window_agg(
        df,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", 2).alias("total_value"),
        ],
    )


@query(
    "events_rollup_type_user",
    oracle=f"""
SELECT event_type, user_id,
       COUNT(*) AS n_events,
       {sql_dec_sum('value', 2)} AS total_value
FROM events
GROUP BY ROLLUP (event_type, user_id)
""",
)
def events_rollup_type_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] ROLLUP hierarchy (type -> type+user -> grand total): multi-level
    aggregates in one pass (Spark Expand + single shuffle)."""
    return (
        load_table(spark, sf_dir, "events")
        .rollup("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", 2).alias("total_value"),
        )
    )


@query(
    "events_cascading_rollup",
    oracle=f"""
WITH daily AS (
    SELECT CAST({_TS} AS DATE) AS day,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(38,2))) AS day_value
    FROM events
    GROUP BY 1, 2
)
SELECT CAST(date_trunc('month', day) AS DATE) AS month,
       event_type,
       COUNT(*) AS n_days,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(day_value) AS DOUBLE) AS total_value
FROM daily
GROUP BY 1, 2
""",
)
def events_cascading_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Hypertable-style cascading rollup: events aggregate to DAILY
    buckets, and the MONTHLY tier re-aggregates from the daily pre-
    aggregates (never from raw rows) — the continuous-aggregate pattern
    that makes dashboard tiers O(|days|), not O(|events|), at 100 TB.
    Counts compose by summation and values stay DECIMAL(38,2) through both
    tiers (exact, order-independent) with one double cast at the very end,
    so cascade == direct and the oracle verifies exactly that.  Plan-wise
    the month tier reuses nothing of the event scan: its input is the
    |days x types|-row daily frame."""
    # ts is TIMESTAMP_NTZ: naive day/month extraction, identical on any
    # session time zone (matching the naive DuckDB oracle).
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    daily = (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,2)")).alias("day_value"),
        )
    )
    return (
        daily.groupBy(
            F.date_trunc("month", F.col("day")).cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_events").alias("n_events"),
            F.sum("day_value").cast("double").alias("total_value"),
        )
    )
