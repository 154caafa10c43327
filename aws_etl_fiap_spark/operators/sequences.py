"""Sequence- and co-occurrence-mining operators ([EXT]: behavioral
analytics over the events log and market-basket association over order
line items — the session-mining layer above the funnel/session gates in
queries/{quality_q,events_q}.py).

Scale notes baked into each shape:

- Transition mining is ONE window pass over the per-user order (the event
  log shuffles once on user_id) followed by an aggregate over the tiny
  (state, next_state) grid; transition probabilities normalize with a
  window over that grid, never over raw events.
- Basket pairing self-joins WITHIN basket only, after deduplicating to
  distinct (basket, item) and capping basket size: a basket of k items
  emits k(k-1)/2 pairs, so the explicit ``max_basket`` cap bounds the
  join's output volume per basket at a constant — the standard guard that
  keeps a power-law basket (one order touching 10^5 items) from emitting
  10^10 pairs.  The cap is a semantic parameter (mirrored in oracles),
  not a silent truncation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import round_half_up


def transition_matrix(
    df: DataFrame,
    key: str,
    state: str,
    order_by: list[str],
    scale: int = 6,
) -> DataFrame:
    """First-order Markov transition counts + probabilities per state pair.

    ``order_by`` must be a TOTAL order within each key partition (include
    a unique tiebreaker) or the lead() is nondeterministic.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    pairs = (
        df.select(F.col(state).alias("from_state"), F.lead(state).over(w).alias("to_state"))
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    norm = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n_transitions",
        round_half_up(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm).cast("double"),
            scale,
        ).alias("p_transition"),
    )


def basket_pairs(
    df: DataFrame,
    basket: str,
    item: str,
    max_basket: int = 64,
    min_pair_count: int = 2,
    scale: int = 6,
) -> DataFrame:
    """Pairwise co-occurrence with support / confidence / lift.

    Pipeline: distinct (basket, item) -> drop baskets wider than
    ``max_basket`` (bounds pair fan-out; mirrored in the oracle) ->
    collect each basket's SORTED item set -> generate the k(k-1)/2
    ordered combinations with an expression-only nested ``transform``
    (no self-join: a within-basket equi-join would shuffle the item
    table twice and materialize the full pair stream through a join,
    where the combination explode feeds straight into a MAP-SIDE partial
    aggregate over the tiny (item_a, item_b) grid — 20x smoke: 39.6s
    join-based vs ~4s this shape on 12M items) -> counts -> association
    measures against single-item supports (a broadcast-sized frame) and
    the global basket total.

    The window-filter-then-collect order is deliberate for unbounded
    data: the size guard runs on the sort-based window pass BEFORE any
    ``collect_set`` buffers a basket in memory, so a pathological basket
    (one order touching 10^5 items) is dropped without ever being
    materialized; the collect then reuses the window's hash partitioning
    (one extra exchange-free aggregate in-plan).

    lift = P(a,b) / (P(a) P(b)) computed as the exact integer product
    ``n_ab * n_baskets`` over ``n_a * n_b``, one IEEE division, rounded.
    """
    items = df.select(F.col(basket).alias("bk"), F.col(item).alias("it")).distinct()
    sized = items.withColumn(
        "bk_size", F.count(F.lit(1)).over(Window.partitionBy("bk"))
    ).filter(F.col("bk_size") <= max_basket)
    # ONE materialization feeds pairs, singles, and the basket total: the
    # r13 plan audit showed the distinct -> window -> size-filter pipeline
    # (the only full-input shuffles in the query) executing FOUR times —
    # once per consumer — because nothing pinned it.  The per-basket sets
    # frame is the smallest common ancestor (one row per basket, items
    # already distinct per basket), so every downstream quantity derives
    # from it exactly: singles = per-item row count over the exploded sets
    # (identical to counting ``sized`` rows), n_baskets = COUNT(*) of sets
    # (identical to countDistinct(bk) over ``sized``).  localCheckpoint,
    # not persist: blocks release at GC (the repo-wide discipline).
    sets = (
        sized.groupBy("bk")
        .agg(F.sort_array(F.collect_set("it")).alias("items"))
        .localCheckpoint(eager=False)
    )
    combos = F.expr(
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), y -> struct(x AS item_a, y AS item_b))))"
    )
    pair_counts = (
        sets.select(F.explode(combos).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    singles = (
        sets.select(F.explode("items").alias("it"))
        .groupBy(F.col("it"))
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    # Lazy scalar total as a 1-row broadcast (same pattern as the TPC-H
    # global-threshold joins): no eager action at query-construction time.
    totals = sets.agg(F.count(F.lit(1)).alias("n_baskets"))
    joined = (
        pair_counts.join(
            F.broadcast(singles.withColumnRenamed("it", "item_a").withColumnRenamed("n_item", "n_a")),
            "item_a",
        )
        .join(
            F.broadcast(singles.withColumnRenamed("it", "item_b").withColumnRenamed("n_item", "n_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    return joined.select(
        "item_a",
        "item_b",
        "n_ab",
        round_half_up(
            F.col("n_ab").cast("double") / F.col("n_baskets").cast("double"), scale
        ).alias("support"),
        round_half_up(F.col("n_ab").cast("double") / F.col("n_a").cast("double"), scale).alias(
            "confidence_a_to_b"
        ),
        round_half_up(
            (F.col("n_ab") * F.col("n_baskets")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            scale,
        ).alias("lift"),
    )


def top_paths(
    df: DataFrame,
    key: str,
    state: str,
    order_by: list[str],
    length: int = 3,
    k: int = 10,
) -> DataFrame:
    """Top-k most frequent length-``length`` state paths (consecutive
    per-key n-grams of the event sequence) — clickstream path mining, the
    n-gram generalization of transition_matrix.

    One shuffle on the key builds the lead() chain (``order_by`` must be a
    TOTAL order within the key or the chain is nondeterministic), the
    count grid aggregates paths, and the top-k is a row_number over the
    GRID under the total (count DESC, path ASC) order.  Output:
    (path, n_occurrences, rank).
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    steps = [F.col(state)] + [
        F.lead(state, i).over(w) for i in range(1, length)
    ]
    # F.concat (NOT concat_ws): concat_ws silently SKIPS null segments,
    # emitting a shortened path when a mid-chain state is NULL; concat
    # propagates NULL like SQL '||', so any-NULL windows yield a NULL path
    # and the filter below drops them in both engines identically.
    parts: list[Column] = []
    for i, s in enumerate(steps):
        if i:
            parts.append(F.lit(">"))
        parts.append(s)
    chained = df.select(F.concat(*parts).alias("path"))
    grid = (
        chained.filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    rank_w = Window.orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
    return (
        grid.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("path", "n_occurrences", "rank")
    )
