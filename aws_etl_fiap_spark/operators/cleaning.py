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
