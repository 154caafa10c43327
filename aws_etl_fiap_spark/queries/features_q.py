"""Training-set-construction queries ([EXT]: the feature-store /
featurization layer — leakage-free point-in-time joins, hashing-trick
features, class-balanced sampling — over the driver's events/documents
tables; operators/features.py and operators/sampling.py hold the
implementations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import sql_dec_sum
from aws_etl_fiap_spark.operators.features import feature_hashing, point_in_time_join
from aws_etl_fiap_spark.operators.sampling import balanced_class_sample
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

_TS = "CAST(ts AS TIMESTAMP)"


@query(
    "fs_point_in_time_join",
    oracle=f"""
WITH fdaily AS (
    SELECT user_id, CAST({_TS} AS DATE) AS day,
           COUNT(*) AS n_clicks,
           {sql_dec_sum('value', 2)} AS click_value
    FROM events WHERE event_type = 'click' GROUP BY user_id, day
),
f AS (
    SELECT user_id, CAST(day + INTERVAL 1 DAY AS TIMESTAMP) AS uts,
           1 AS kind, CAST(-1 AS BIGINT) AS tb,
           struct_pack(
               feature_ts := CAST(day + INTERVAL 1 DAY AS TIMESTAMP),
               n_clicks := n_clicks, click_value := click_value) AS fv,
           CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS purchase_value
    FROM fdaily
),
l AS (
    SELECT user_id, {_TS} AS uts, 0 AS kind, event_id AS tb,
           CAST(NULL AS STRUCT(feature_ts TIMESTAMP, n_clicks BIGINT, click_value DOUBLE)) AS fv,
           event_id, value AS purchase_value
    FROM events WHERE event_type = 'purchase'
),
u AS (SELECT * FROM f UNION ALL SELECT * FROM l),
wnd AS (
    SELECT *, last_value(fv IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY uts, kind, tb
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_f
    FROM u
)
SELECT user_id, uts AS ts, event_id, purchase_value,
       last_f.feature_ts AS feature_ts,
       last_f.n_clicks AS n_clicks,
       last_f.click_value AS click_value
FROM wnd WHERE kind = 0
""",
)
def fs_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.3 as-of, feature-store flavor] Point-in-time-correct
    training features (operators/features.point_in_time_join): each
    purchase label gets the SAME USER's latest fully-elapsed-day click
    aggregate (features effective from the NEXT midnight — a day's
    aggregate can never describe a purchase inside that day, so
    same-day leakage is impossible by construction; cold-start labels
    keep NULL features).  Union + running-last over one user_id shuffle —
    no per-label probe join, no range cross product; the oracle
    re-derives the identical union/window in SQL."""
    ev = load_table(spark, sf_dir, "events")
    features = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias(
                "click_value"
            ),
        )
        .select(
            "user_id",
            F.date_add("day", 1).cast("timestamp_ntz").alias("ts"),
            "n_clicks",
            "click_value",
        )
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("purchase_value")
    )
    return point_in_time_join(
        features,
        labels,
        key="user_id",
        ts_col="ts",
        feature_vals=["n_clicks", "click_value"],
        label_cols=["event_id", "purchase_value"],
        tiebreak="event_id",
    )


_H_DIM = (
    "((CAST(CONCAT('0x', SUBSTR(md5(CONCAT('feat-dim', ':', tok)), 1, 15)) AS BIGINT)"
    " % 64 + 64) % 64)"
)
_H_SIGN = (
    "(1 - 2 * ((CAST(CONCAT('0x', SUBSTR(md5(CONCAT('feat-sign', ':', tok)), 1, 15)) AS BIGINT)"
    " % 2 + 2) % 2))"
)


@query(
    "text_feature_hashing",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
h AS (SELECT doc_id, {_H_DIM} AS dim, {_H_SIGN} AS sign FROM t2)
SELECT doc_id, dim, CAST(SUM(sign) AS BIGINT) AS weight
FROM h GROUP BY doc_id, dim
""",
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north-star text] Hashing-trick featurization
    (operators/features.feature_hashing): whitespace tokens hash into 64
    signed buckets (independent md5-derived dim and sign — collisions
    cancel in expectation), emitted as the tall (doc_id, dim, weight)
    frame.  No vocabulary build, no dictionary broadcast — state is fixed
    at n_dims regardless of corpus size, which is the whole point at
    100 TB.  Portable hashing makes the exact weights SQL-re-derivable."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return feature_hashing(docs, "doc_id", "text", n_dims=64)


@query(
    "corpus_balanced_sample",
    oracle="""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
m AS (SELECT MIN(n) AS m FROM c),
r AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CONCAT('balance', ':', CAST(doc_id AS VARCHAR))), doc_id) AS rn
    FROM documents
)
SELECT doc_id, lang FROM r CROSS JOIN m WHERE rn <= m.m
""",
)
def corpus_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north-star curation] Class-balanced downsample
    (operators/sampling.balanced_class_sample): every language keeps
    exactly min-class-count docs, selected as each class's M smallest
    rows under the portable (md5, id) order — deterministic majority
    downsampling, the imbalanced-training-data recipe, with the selected
    SET re-derivable in SQL (ROW_NUMBER twin)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return balanced_class_sample(docs, ["lang"], "doc_id")
