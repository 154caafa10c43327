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


def test_incremental_refresh_random_commits_property(spark, tmp_path):
    """Property (r10): for ARBITRARY interleavings of upsert/delete commits
    — groups dying, being reborn, all-NULL measure groups — the chained
    incremental refresh must equal the from-scratch recompute EXACTLY at
    every version.  This pins the delta ALGEBRA itself (negation,
    cancellation, count-zero group drop), not one scripted scenario."""
    import shutil
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.integers(min_value=1, max_value=8)
    grp = st.sampled_from(["a", "b", "c"])
    val = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))
    batch = st.dictionaries(keys, st.tuples(grp, val), min_size=1, max_size=5)
    op = st.one_of(
        st.tuples(st.just("upsert"), batch),
        st.tuples(st.just("delete"), st.sets(keys, min_size=1, max_size=3)),
    )

    @settings(max_examples=5, deadline=None)
    @given(batch, st.lists(op, min_size=1, max_size=3))
    def prop(init, ops):
        tmp = tempfile.mkdtemp(prefix="mvprop_")
        path = tmp + "/t"
        sums = {"sv": ("v", 0)}
        try:
            def df_of(d):
                return spark.createDataFrame(
                    [(k, g, v) for k, (g, v) in sorted(d.items())],
                    "k int, g string, v int",
                )

            S.create_table(spark, df_of(init), path, n_files=2)
            state = full_agg_state(S.read_table(spark, path), ["g"], sums)
            v_prev = 1
            for kind, arg in ops:
                if kind == "upsert":
                    S.upsert(spark, path, df_of(arg), ["k"])
                else:
                    S.delete(
                        spark, path,
                        spark.createDataFrame(
                            [(k,) for k in sorted(arg)], "k int"
                        ),
                        ["k"],
                    )
                v_now = S.current_version(spark, path)
                state = incremental_agg_refresh(
                    spark, path, state, v_prev, v_now, ["g"], sums
                ).localCheckpoint(eager=True)
                v_prev = v_now
                assert _rows(state) == _rows(
                    full_agg_state(S.read_table(spark, path), ["g"], sums)
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    prop()


# --- r13 interplay properties: refresh x compact / vacuum ------------------


def test_mv_refresh_across_compact_is_exact_noop(spark, tmp_path):
    """compact() rewrites small files into consolidated ones WITHOUT
    touching rows — so a refresh spanning the compact version sees every
    moved row on both sides of the delta and must cancel EXACTLY back to
    the same state (the docstring symmetry changed_sides promises, pinned
    here for the maintenance op the random-commits property never
    issues)."""
    path = str(tmp_path / "t_compact")
    df = spark.createDataFrame(
        [(k, "g" + str(k % 3), k * 10) for k in range(1, 31)],
        "k int, g string, v int",
    )
    sums = {"sv": ("v", 0)}
    S.create_table(spark, df, path, n_files=6)
    state = full_agg_state(S.read_table(spark, path), ["g"], sums)
    before = _rows(state)
    stats = S.compact(spark, path, target_rows=1_000_000)
    assert stats["new_version"] > 1, stats  # the maintenance commit exists
    refreshed = incremental_agg_refresh(
        spark, path, state, 1, S.current_version(spark, path), ["g"], sums
    )
    assert _rows(refreshed) == before
    assert _rows(refreshed) == _rows(
        full_agg_state(S.read_table(spark, path), ["g"], sums)
    )


def test_mv_refresh_chain_spanning_compact_and_upserts(spark, tmp_path):
    """A refresh window that spans [upsert, compact, upsert] must fold the
    real changes and cancel the layout-only rewrite in ONE delta — the
    steady-state shape of a merge-heavy table under periodic OPTIMIZE."""
    path = str(tmp_path / "t_mix")
    sums = {"sv": ("v", 0)}
    S.create_table(
        spark,
        spark.createDataFrame(
            [(k, "g" + str(k % 2), k) for k in range(1, 21)],
            "k int, g string, v int",
        ),
        path,
        n_files=5,
    )
    state = full_agg_state(S.read_table(spark, path), ["g"], sums)
    S.upsert(
        spark, path,
        spark.createDataFrame([(1, "g1", 100), (50, "g0", 7)],
                              "k int, g string, v int"),
        ["k"],
    )
    S.compact(spark, path, target_rows=1_000_000)
    S.upsert(
        spark, path,
        spark.createDataFrame([(2, "g0", -5)], "k int, g string, v int"),
        ["k"],
    )
    refreshed = incremental_agg_refresh(
        spark, path, state, 1, S.current_version(spark, path), ["g"], sums
    )
    assert _rows(refreshed) == _rows(
        full_agg_state(S.read_table(spark, path), ["g"], sums)
    )


def test_mv_refresh_from_vacuumed_version_fails_loudly(spark, tmp_path):
    """Refreshing from a version vacuum() has dropped must raise the typed
    missing-manifest error — NEVER silently compute a delta from a partial
    history (the state would be wrong with no diagnostic).  Pinned so the
    manifest-read path keeps failing closed."""
    path = str(tmp_path / "t_vac")
    sums = {"sv": ("v", 0)}
    S.create_table(
        spark,
        spark.createDataFrame([(1, "a", 1), (2, "b", 2)],
                              "k int, g string, v int"),
        path,
        n_files=1,
    )
    state = full_agg_state(S.read_table(spark, path), ["g"], sums)
    S.upsert(
        spark, path,
        spark.createDataFrame([(3, "a", 3)], "k int, g string, v int"),
        ["k"],
    )
    S.vacuum(spark, path, keep_last=1, retain_seconds=0)
    with pytest.raises(FileNotFoundError):
        incremental_agg_refresh(
            spark, path, state, 1, S.current_version(spark, path), ["g"], sums
        ).collect()
