"""Incremental materialized-view maintenance over the snapshot table format.

The 100 TB motivation: a grouped rollup over a full table costs a full scan
plus a full shuffle every time it is refreshed, but a snapshot commit
(sources/snapshot.py) touches only a handful of files — so the rollup's NEXT
state is derivable from its CURRENT state plus the commit's delta, at a cost
proportional to the CHANGED data, not the table.  This is the classic
delta-maintenance result for abelian-group aggregates (SUM/COUNT, and
anything derived from them: AVG, rates, shares): inserts add, deletes
subtract, updates do both — the standard incremental view maintenance
algebra (e.g. Griffin/Libkin-style change propagation), re-expressed on
Spark over the manifest log.

What makes it EXACT here (the oracle gate hashes values):

- measures accumulate in ``DECIMAL(38, s)`` — decimal addition is
  associative and exact, so ``state + delta`` lands bit-identically on the
  same value as a from-scratch recompute.  Floating-point sums would NOT
  (summation order differs between the incremental and full plans), which
  is why the state schema carries decimals and only renders doubles at
  presentation time (functions/parity rules);
- the delta reads come from :func:`snapshot.changed_sides`, which prunes to
  the files removed from / added to the manifest (immutable files + whole-
  file copy-on-write rewrites make that a complete account of change);
  rows that merely moved files appear on both sides with identical values
  and cancel arithmetically;
- MIN/MAX are deliberately NOT offered: they are not group-invertible
  (a delete can expose a new extremum only a rescan can find), and a
  silent wrong answer is worse than an absent feature.
- each measure carries a hidden NON-NULL COUNT (``__nn_<out>``) in the
  state: SQL SUM over zero non-null values is NULL, but pure
  cancellation renders it 0 — a group whose last non-null measure is
  deleted (or replaced by NULLs) must refresh to NULL exactly as the
  recompute would (found by the r10 hypothesis property
  test_incremental_refresh_random_commits_property).

Typical loop::

    state = full_agg_state(snapshot.read_table(spark, path), keys, sums)
    ... commits happen ...
    state = incremental_agg_refresh(
        spark, path, state, v_from=1, v_to=current, key_cols=keys,
        sum_cols=sums,
    )

``state`` is a driver-agnostic DataFrame (checkpoint/persist it as the
application requires); refreshes compose across any number of versions.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: out_col -> (source expression/column name, decimal scale of the measure)
SumSpec = Mapping[str, tuple[str, int]]

_N = "n_rows"


def _agg_exprs(sum_cols: SumSpec) -> list:
    exprs = [F.count(F.lit(1)).cast("long").alias(_N)]
    for out, (src, scale) in sum_cols.items():
        exprs.append(F.sum(F.expr(src).cast(f"decimal(38,{scale})")).alias(out))
        # non-null count per measure: distinguishes "sum cancelled to 0"
        # from "no non-null values left -> SUM must be NULL"
        exprs.append(F.count(F.expr(src)).cast("long").alias(f"__nn_{out}"))
    return exprs


def full_agg_state(
    df: DataFrame, key_cols: Sequence[str], sum_cols: SumSpec
) -> DataFrame:
    """The from-scratch state: one row per key, a ``n_rows`` count and one
    exact ``DECIMAL(38, s)`` sum per measure.  Run once at bootstrap (or
    to audit a refreshed state — equality is exact, not approximate)."""
    return df.groupBy(*key_cols).agg(*_agg_exprs(sum_cols))


def incremental_agg_refresh(
    spark: SparkSession,
    path: str,
    state: DataFrame,
    v_from: int,
    v_to: int,
    key_cols: Sequence[str],
    sum_cols: SumSpec,
) -> DataFrame:
    """``state`` at ``v_from``  +  delta(``v_from`` -> ``v_to``)  =  state
    at ``v_to`` — without rescanning carried data.

    The plan shape: two pruned scans (removed files negated, added files
    positive), one partial-aggregated union keyed the same as the state,
    and one final combine — every stage is keyed on ``key_cols``, so the
    combine shuffle moves at most ``|changed keys| + |state|`` rows and
    AQE coalesces it at runtime.  Groups whose count returns to zero are
    dropped (a group the delta fully deleted must vanish, exactly as the
    full recompute would never produce it)."""
    from aws_etl_fiap_spark.sources.snapshot import changed_sides

    keys = list(key_cols)
    old_side, new_side = changed_sides(spark, path, v_from, v_to)
    pos = new_side.groupBy(*keys).agg(*_agg_exprs(sum_cols))
    neg = (
        old_side.groupBy(*keys)
        .agg(*_agg_exprs(sum_cols))
        .select(
            *keys,
            (-F.col(_N)).cast("long").alias(_N),
            *[
                col
                for out in sum_cols
                for col in (
                    (-F.col(out)).alias(out),
                    (-F.col(f"__nn_{out}")).cast("long").alias(f"__nn_{out}"),
                )
            ],
        )
    )
    combined = state.unionByName(pos).unionByName(neg)
    refreshed = combined.groupBy(*keys).agg(
        F.sum(_N).cast("long").alias(_N),
        *[
            expr
            for out, (_, scale) in sum_cols.items()
            for expr in (
                F.sum(out).cast(f"decimal(38,{scale})").alias(f"__raw_{out}"),
                F.sum(f"__nn_{out}").cast("long").alias(f"__nn_{out}"),
            )
        ],
    )
    # Render each sum NULL when its non-null count is zero: cancellation
    # yields 0 there, but the recompute's SUM over no non-null values is
    # NULL (nn > 0 guarantees at least one non-NULL addend reached F.sum,
    # so the raw sum is non-NULL exactly when it must be).
    refreshed = refreshed.select(
        *keys,
        F.col(_N),
        *[
            col
            for out, (_, scale) in sum_cols.items()
            for col in (
                F.when(F.col(f"__nn_{out}") > 0, F.col(f"__raw_{out}"))
                .cast(f"decimal(38,{scale})")
                .alias(out),
                F.col(f"__nn_{out}"),
            )
        ],
    )
    return refreshed.filter(F.col(_N) > 0)
