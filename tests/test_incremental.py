"""Incremental materialized-view maintenance (operators/incremental.py):
chained refreshes over snapshot commits must equal the from-scratch
recompute EXACTLY (decimal accumulators), including groups that vanish and
groups born mid-chain."""

import pyspark.sql.functions as F
import pytest

from aws_etl_fiap_spark.operators.incremental import (
    full_agg_state,
    incremental_agg_refresh,
)
from aws_etl_fiap_spark.sources import snapshot as S
from aws_etl_fiap_spark.sources.readers import load_table

KEYS = ["o_orderstatus", "o_orderpriority"]
SUMS = {"key_sum": ("o_orderkey", 0), "total_price": ("o_totalprice", 2)}


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


def test_chained_refresh_equals_full_recompute(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(
        spark, src.repartitionByRange(6, "o_orderkey"), path,
        n_files=None, stats_cols=["o_orderkey"],
    )
    state = full_agg_state(S.read_table(spark, path), KEYS, SUMS)

    # v2: CoW merge (update + insert + delete)
    upd = src.filter(F.col("o_orderkey") % 11 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(3.0)
    )
    ins = src.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(5_000_000)
    )
    dels = src.filter(
        (F.col("o_orderkey") % 53 == 2) & (F.col("o_orderkey") % 11 != 0)
    ).select("o_orderkey")
    S.upsert(spark, path, upd.unionByName(ins), ["o_orderkey"], deletes=dels)
    state = incremental_agg_refresh(
        spark, path, state, 1, 2, KEYS, SUMS
    ).localCheckpoint(eager=True)
    assert _rows(state) == _rows(
        full_agg_state(S.read_table(spark, path), KEYS, SUMS)
    )

    # v3: a second commit; the refresh composes on the refreshed state
    upd2 = src.filter(F.col("o_orderkey") % 29 == 1).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(7.0)
    )
    S.upsert(spark, path, upd2, ["o_orderkey"])
    state = incremental_agg_refresh(spark, path, state, 2, 3, KEYS, SUMS)
    assert _rows(state) == _rows(
        full_agg_state(S.read_table(spark, path), KEYS, SUMS)
    )


def test_vanishing_and_born_groups(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    # a tiny keyed slice so a whole group can be deleted
    small = src.filter(F.col("o_orderkey") <= 200)
    path = str(tmp_path / "snap")
    S.create_table(spark, small.repartitionByRange(3, "o_orderkey"), path,
                   n_files=None, stats_cols=["o_orderkey"])
    state = full_agg_state(S.read_table(spark, path), ["o_orderstatus"], SUMS)

    # delete EVERY row of one status; insert rows with a brand-new status
    doomed_status = small.select("o_orderstatus").distinct().orderBy(
        "o_orderstatus"
    ).limit(1).collect()[0][0]
    dels = small.filter(F.col("o_orderstatus") == doomed_status).select(
        "o_orderkey"
    )
    born = small.limit(3).select(
        (F.col("o_orderkey") + 9_000_000).alias("o_orderkey"),
        F.lit("Z").alias("o_orderstatus"),
        "o_orderpriority",
        "o_totalprice",
    )
    S.upsert(spark, path, born, ["o_orderkey"], deletes=dels)
    state2 = incremental_agg_refresh(
        spark, path, state, 1, 2, ["o_orderstatus"], SUMS
    )
    got = {r["o_orderstatus"] for r in state2.collect()}
    assert doomed_status not in got  # n_rows hit zero -> group dropped
    assert "Z" in got  # born group materialized from the delta alone
    assert _rows(state2) == _rows(
        full_agg_state(S.read_table(spark, path), ["o_orderstatus"], SUMS)
    )


def test_refresh_rejects_nothing_but_sums_and_counts():
    # API shape guard: the SumSpec carries (expr, scale) pairs only — a
    # MIN/MAX request has no slot to hide in.  (Non-invertible aggregates
    # are deliberately unsupported; see the module docstring.)
    import inspect

    sig = inspect.signature(incremental_agg_refresh)
    assert "sum_cols" in sig.parameters
    assert "min_cols" not in sig.parameters
