"""Sequence- and association-mining queries ([EXT]: behavioral analytics
over the events log and market-basket association over order line items —
operators/sequences.py holds the scale-shaped implementations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_etl_fiap_spark.functions.parity import sql_round_half_up
from aws_etl_fiap_spark.operators.sequences import (
    basket_pairs,
    top_paths,
    transition_matrix,
)
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

_TS = "CAST(ts AS TIMESTAMP)"

_MAX_BASKET = 16
_MIN_PAIR = 2


@query(
    "seq_event_transitions",
    oracle=f"""
WITH p AS (
    SELECT event_type AS from_state,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY {_TS}, event_id) AS to_state
    FROM events
),
c AS (
    SELECT from_state, to_state, COUNT(*) AS n_transitions
    FROM p WHERE to_state IS NOT NULL GROUP BY from_state, to_state
)
SELECT from_state, to_state, n_transitions,
       {sql_round_half_up(
           'CAST(n_transitions AS DOUBLE) / '
           'CAST(SUM(n_transitions) OVER (PARTITION BY from_state) AS DOUBLE)', 6)}
           AS p_transition
FROM c
""",
)
def seq_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] First-order Markov transition matrix over each user's
    event stream: lead() under the unique per-user (ts, event_id) order,
    aggregate to the tiny (state, next_state) grid, normalize per
    from-state with a window over that grid.  One shuffle of the raw log
    (on user_id); everything after runs on |states|^2 rows.  The count is
    exact-integer and the probability is one rounded IEEE division, so the
    whole matrix hash-verifies."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return transition_matrix(ev, "user_id", "event_type", ["ts", "event_id"])


@query(
    "basket_brand_pairs_lift",
    oracle=f"""
WITH items AS (
    SELECT DISTINCT l_orderkey AS bk, p_brand AS it
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
sized AS (
    SELECT bk, it FROM (
        SELECT bk, it, COUNT(*) OVER (PARTITION BY bk) AS bk_size FROM items
    ) WHERE bk_size <= {_MAX_BASKET}
),
pc AS (
    SELECT a.it AS item_a, b.it AS item_b, COUNT(*) AS n_ab
    FROM sized a JOIN sized b ON a.bk = b.bk AND a.it < b.it
    GROUP BY a.it, b.it
    HAVING COUNT(*) >= {_MIN_PAIR}
),
s AS (SELECT it, COUNT(*) AS n_item FROM sized GROUP BY it),
t AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM sized)
SELECT item_a, item_b, n_ab,
       {sql_round_half_up('CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE)', 6)} AS support,
       {sql_round_half_up('CAST(n_ab AS DOUBLE) / CAST(sa.n_item AS DOUBLE)', 6)} AS confidence_a_to_b,
       {sql_round_half_up(
           'CAST(n_ab * n_baskets AS DOUBLE) / CAST(sa.n_item * sb.n_item AS DOUBLE)', 6)} AS lift
FROM pc
JOIN s sa ON sa.it = pc.item_a
JOIN s sb ON sb.it = pc.item_b
CROSS JOIN t
""",
)
def basket_brand_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.3/A-EXT] Market-basket association: which part brands
    co-occur in the same order beyond chance.  Distinct (order, brand)
    baskets -> basket-size cap (bounds the k(k-1)/2 pair fan-out per
    basket — the guard that keeps one power-law basket from emitting
    billions of pairs; mirrored in the oracle) -> within-basket self-join
    with item_a < item_b -> support / confidence / lift against broadcast
    single-item counts and a 1-row lazy basket total.  All counts exact,
    each measure one rounded division."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from pyspark.sql import functions as F

    baskets = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        "l_orderkey", "p_brand"
    )
    return basket_pairs(
        baskets,
        "l_orderkey",
        "p_brand",
        max_basket=_MAX_BASKET,
        min_pair_count=_MIN_PAIR,
    )


@query(
    "seq_top_paths_3",
    oracle=f"""
WITH s AS (
    SELECT event_type,
           LEAD(event_type, 1) OVER w AS s2,
           LEAD(event_type, 2) OVER w AS s3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {_TS}, event_id)
),
grid AS (
    SELECT event_type || '>' || s2 || '>' || s3 AS path,
           COUNT(*) AS n_occurrences
    FROM s
    WHERE event_type IS NOT NULL AND s2 IS NOT NULL AND s3 IS NOT NULL
    GROUP BY 1
)
SELECT path, n_occurrences, path_rank
FROM (
    SELECT path, n_occurrences,
           ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, path ASC) AS path_rank
    FROM grid
)
WHERE path_rank <= 10
""",
)
def seq_top_paths_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT W-EXT] Clickstream path mining: the 10 most frequent
    consecutive 3-step event-type paths across all user sessions
    (operators/sequences.top_paths) — the n-gram generalization of the
    Markov transition matrix.  One shuffle on user_id builds the double
    lead() chain under the unique (ts, event_id) order; the top-k is a
    row_number over the path-count GRID (at most |types|^3 rows) under
    the total (count DESC, path ASC) order."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return top_paths(
        ev, "user_id", "event_type", ["ts", "event_id"], length=3, k=10
    ).withColumnRenamed("rank", "path_rank")
