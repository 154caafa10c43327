"""Null filtering & row-count accounting (reference §2.2 P1, §2.4 A3/A4).

Reference behavior: four chained ``isNotNull`` filters with before/after counts
(src/glue/b3_transform.py:115-136). Catalyst collapses chained filters into one
conjunctive predicate and pushes it to the parquet scan (row-group stats skip
fully-null chunks), so expressing this declaratively is already the 100 TB-safe
form. What we deliberately do differently: the reference runs its two counts
over an uncached lineage (recompute per action); ``filter_nulls_with_counts``
caches before the fan-out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_nulls(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Drop rows where any of ``columns`` is NULL.

    One conjunctive predicate (Catalyst would merge chained filters anyway,
    but a single ``Filter`` node keeps the logical plan readable in explain).
    """
    if not columns:
        return df
    predicate = F.lit(True)
    for c in columns:
        predicate = predicate & F.col(c).isNotNull()
    return df.filter(predicate)


def filter_nulls_with_counts(df: DataFrame, columns: Sequence[str]) -> tuple[DataFrame, int, int]:
    """Null-filter plus the reference's removed-row accounting
    (b3_transform.py:128-133), without its double full recompute."""
    cached = df.cache()
    before = cached.count()
    filtered = filter_nulls(cached, columns)
    after = filtered.count()
    return filtered, before, after


def audit_checks(
    df: DataFrame, checks: Sequence[tuple[str, "F.Column"]]
) -> DataFrame:
    """Data-quality audit: evaluate named violation predicates in ONE pass
    and return a tall (check_name, n_fail, n_rows) frame.

    All predicates fold into a single aggregate over one scan — at 100 TB
    the audit costs exactly one read however many checks it carries (the
    naive one-count-per-check loop costs N full scans, the reference's
    uncached-recount anti-pattern scaled up).  Conditional counts are
    map-side combined; the final ``stack`` pivots one 1-row frame, so
    nothing wide ever shuffles.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count(F.when(cond, F.lit(1))).alias(f"__c{i}")
        for i, (_, cond) in enumerate(checks)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', __c{i}" for i, (name, _) in enumerate(checks))
    return one.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, n_fail)", "n_rows"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Table reconciliation / CDC extraction: full-outer join two snapshots
    on ``keys`` and classify every key as inserted / deleted / updated,
    dropping unchanged rows.

    Comparison is null-safe (``<=>``) per column, so NULL-to-value and
    value-to-NULL transitions classify as updates rather than vanishing.
    Scale shape: one co-partitioned shuffle join on the key (at 100 TB both
    snapshots bucketed/clustered by key make this exchange-free); the
    change classification is a pure projection, and unchanged rows — the
    overwhelming majority in a daily diff — are filtered before anything
    downstream sees them.
    """
    o = old.select(*keys, *compare_cols).alias("o")
    n = new.select(*keys, *compare_cols).alias("n")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"o.{k}") == F.col(f"n.{k}"))
    joined = o.join(n, cond, "full_outer")
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    old_present = F.col(f"o.{keys[0]}").isNotNull()
    new_present = F.col(f"n.{keys[0]}").isNotNull()
    change = (
        F.when(~new_present, F.lit("deleted"))
        .when(~old_present, F.lit("inserted"))
        .when(any_diff, F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out_keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    return joined.select(*out_keys, change.alias("change_type")).filter(
        F.col("change_type") != "unchanged"
    )


def column_profile(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Deequ-style one-scan column profiler: per column the row count,
    null count, and EXACT distinct count, in long (column-per-row) format
    — the completeness/uniqueness analyzer a data-quality layer runs
    before trusting a feed (sibling of audit_checks' rule audit).

    Single aggregate over one scan; the multiple countDistinct aggregates
    plan Spark's Expand (one stream duplicate per distinct column — the
    standard multi-distinct strategy, map-side partial-combined), then a
    stack() unpivots the 1-row wide result.  At 100 TB swap
    approx_count_distinct for the Expand-free sketch plan; this pins the
    exact anchor.  Output: (column_name, n_rows, n_nulls, n_distinct).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in columns)
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")
