"""Unit/property tests for the batch-4 operators: market-data analytics
(operators/finance.py), count-min sketch (operators/sketches.py), and
sequence/association mining (operators/sequences.py).  Value parity vs
DuckDB is covered for every registered query by test_oracle_parity; these
pin the operator-level invariants and plan shapes."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.finance import drawdown, ohlc_bars, rolling_bands
from aws_etl_fiap_spark.operators.sequences import basket_pairs, transition_matrix
from aws_etl_fiap_spark.operators.sketches import cms_build, cms_estimate
from aws_etl_fiap_spark.sources.readers import load_table


# ---------------------------------------------------------------- finance

def test_ohlc_is_single_aggregate_no_window(spark, sf_smoke):
    """min_by/max_by keep OHLC a one-shuffle hash aggregate: a Window over
    raw events would add a sort + extra exchange that a 100 TB scan can't
    afford."""
    ev = load_table(spark, sf_smoke, "events")
    bars = ohlc_bars(ev, "event_type", "ts", "event_id", "value", F.col("ts").cast("date"))
    plan = bars._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1


def test_ohlc_semantics_match_pandas_model(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("event_type", "ts", "event_id", "value")
    bars = ohlc_bars(
        ev, "event_type", "ts", "event_id", "value", F.col("ts").cast("date")
    ).toPandas()
    pdf = ev.toPandas().sort_values(["event_type", "ts", "event_id"])
    pdf["bar"] = pdf["ts"].dt.date
    g = pdf.groupby(["event_type", "bar"])["value"]
    model = pd.DataFrame(
        {"open": g.first(), "high": g.max(), "low": g.min(), "close": g.last()}
    ).reset_index()
    merged = bars.merge(model, on=["event_type", "bar"], suffixes=("", "_m"))
    assert len(merged) == len(bars) == len(model)
    for c in ("open", "high", "low", "close"):
        assert (merged[c] == merged[f"{c}_m"]).all()


def test_bollinger_matches_float_model_within_cent_quantization(spark, sf_smoke):
    """The integer-cents rolling moments must agree with a plain pandas
    rolling mean/std up to the cent-quantization error (<= 0.005 on the
    mean, proportionally bounded on the bands)."""
    ev = load_table(spark, sf_smoke, "events").select("event_type", "ts", "value")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum("value").alias("daily_total")
    )
    out = (
        rolling_bands(daily, "event_type", "day", "daily_total", n_rows=20)
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    for _, grp in out.groupby("event_type"):
        x = grp["daily_total"].round(2)  # cent quantization of the model
        mean = x.rolling(20, min_periods=1).mean()
        std = x.rolling(20, min_periods=1).std(ddof=0).fillna(0.0)
        assert (grp["sma"] - mean).abs().max() < 0.01
        assert (grp["bb_upper"] - (mean + 2 * std)).abs().max() < 0.02
        assert (grp["bb_lower"] - (mean - 2 * std)).abs().max() < 0.02


def test_drawdown_invariants(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("event_type", "ts", "value")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum("value").alias("daily_total")
    )
    out = drawdown(daily, "event_type", "day", "daily_total").toPandas()
    assert (out["drawdown_pct"] >= 0).all()  # never above the running peak
    assert (out["running_peak"] >= out["daily_total"] - 1e-9).all()
    # first row of each series: zero drawdown, zero cumulative return
    first = out.sort_values("day").groupby("event_type").first()
    assert (first["drawdown_pct"] == 0).all()
    assert (first["cum_return_pct"] == 0).all()


# ---------------------------------------------------------------- sketches

def test_cms_never_undercounts_and_state_is_bounded(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select("o_custkey")
    depth, width = 4, 256  # deliberately narrow: forces real collisions
    sketch = cms_build(orders, "o_custkey", depth=depth, width=width)
    assert sketch.count() <= depth * width
    est = cms_estimate(
        orders.distinct(), sketch, "o_custkey", depth=depth, width=width
    )
    true = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("true_count"))
    j = est.join(true, "o_custkey").toPandas()
    assert len(j) == orders.distinct().count()
    assert (j["est_count"] >= j["true_count"]).all()  # CM one-sided error
    # and with collisions forced, at least one estimate exceeds truth —
    # proving the probe actually reads merged buckets, not exact counts
    assert (j["est_count"] > j["true_count"]).any()


def test_cms_merge_is_bucket_sum(spark, sf_smoke):
    """Sketch(A union B) == bucketwise sum of Sketch(A) + Sketch(B): the
    mergeability contract that lets per-partition sketches combine."""
    orders = load_table(spark, sf_smoke, "orders").select("o_custkey")
    a = orders.filter(F.col("o_custkey") % 2 == 0)
    b = orders.filter(F.col("o_custkey") % 2 != 0)
    whole = cms_build(orders, "o_custkey", depth=2, width=128).toPandas()
    merged = (
        cms_build(a, "o_custkey", depth=2, width=128)
        .unionByName(cms_build(b, "o_custkey", depth=2, width=128))
        .groupBy("seed", "bucket")
        .agg(F.sum("n").alias("n"))
        .toPandas()
    )
    key = ["seed", "bucket"]
    assert (
        whole.sort_values(key).reset_index(drop=True).equals(
            merged.sort_values(key).reset_index(drop=True)
        )
    )


# ---------------------------------------------------------------- sequences

def test_transition_probabilities_normalize(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    tm = transition_matrix(ev, "user_id", "event_type", ["ts", "event_id"]).toPandas()
    sums = tm.groupby("from_state")["p_transition"].sum()
    # each row rounds half-up at 6dp, so a k-way fan-out drifts <= k*5e-7
    assert ((sums - 1.0).abs() < 1e-4).all()
    assert (tm["n_transitions"] > 0).all()


def test_transition_counts_conserve_events(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    tm = transition_matrix(ev, "user_id", "event_type", ["ts", "event_id"])
    total_transitions = tm.agg(F.sum("n_transitions")).collect()[0][0]
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user contributes (its event count - 1) transitions
    assert total_transitions == n_events - n_users


def test_basket_pairs_respects_cap_and_symmetric_support(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_smoke, "part").select("p_partkey", "p_brand")
    baskets = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        "l_orderkey", "p_brand"
    )
    out = basket_pairs(
        baskets, "l_orderkey", "p_brand", max_basket=16, min_pair_count=1
    ).toPandas()
    assert (out["item_a"] < out["item_b"]).all()  # each unordered pair once
    assert (out["support"] > 0).all() and (out["support"] <= 1).all()
    assert (out["confidence_a_to_b"] <= 1 + 1e-9).all()
    # lift is symmetric in (a, b) by construction: n_ab * N / (n_a * n_b)
    # — sanity: recompute one row by hand
    row = out.iloc[0]
    sized = (
        baskets.distinct()
        .withColumn("k", F.count(F.lit(1)).over(__import__("pyspark").sql.Window.partitionBy("l_orderkey")))
        .filter(F.col("k") <= 16)
    )
    n_baskets = sized.select("l_orderkey").distinct().count()
    n_a = sized.filter(F.col("p_brand") == row["item_a"]).count()
    expected_conf = row["n_ab"] / n_a
    assert math.isclose(row["confidence_a_to_b"], round(expected_conf, 6), abs_tol=1e-6)
    assert math.isclose(row["support"], round(row["n_ab"] / n_baskets, 6), abs_tol=1e-6)
