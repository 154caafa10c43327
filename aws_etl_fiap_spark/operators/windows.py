"""Window operators: lag pct-change (reference W1) and [EXT] ranking/rolling.

Reference W1 (src/glue/b3_transform.py:69-81): per-ticker, date-ordered
``lag(close, 7)`` / ``lag(close, 30)`` feeding a null-propagating pct-change.
Offsets are ROW offsets, not calendar days — the oracle must use LAG(x, 7),
never date arithmetic.

Scale notes:
- A window ``partitionBy(key).orderBy(...)`` is one hash exchange on ``key``
  plus an in-partition sort; multiple window columns sharing one spec reuse a
  single exchange+sort. We always share the spec.
- The ORDER BY must be a total order within each partition (ties make lag
  nondeterministic and unverifiable), so callers pass tiebreaker columns.
- Skewed keys (one ticker = half the data) serialize into one task; for such
  shapes prefer bounded rolling frames after a salted pre-aggregation, or let
  AQE skew-split handle the exchange (enabled in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import round_half_up


def ordered_window(partition_by: Sequence[str], order_by: Sequence[str]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])


def lag_pct_change(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    offsets: Sequence[int] = (7, 30),
    prev_tpl: str = "{col}_{n}_back",
    pct_tpl: str = "pct_change_{n}",
    decimals: int = 2,
) -> DataFrame:
    """Reference W1 + P9 + P10: lagged value and rounded pct-change per offset.

    pct = round((cur - prev) / prev * 100, d), NULL while fewer than ``n``
    prior rows exist (the ``when(isNotNull)`` guard, b3_transform.py:74-81).
    All offsets share one WindowSpec -> one exchange + one sort at execution.
    Rounding uses the engine-agnostic half-up form (functions.parity) so the
    result is bit-identical under any SQL oracle.
    """
    w = ordered_window(partition_by, order_by)
    cur = F.col(value_col)
    for n in offsets:
        prev_name = prev_tpl.format(col=value_col, n=n)
        prev = F.lag(cur, n).over(w)
        df = df.withColumn(prev_name, prev).withColumn(
            pct_tpl.format(n=n),
            F.when(
                F.col(prev_name).isNotNull(),
                round_half_up((cur - F.col(prev_name)) / F.col(prev_name) * 100.0, decimals),
            ).otherwise(F.lit(None)),
        )
    return df


def add_row_number(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[str],
                   out: str = "rn") -> DataFrame:
    """[EXT] row_number over a total order — the building block for top-N-per-
    group and deterministic dedup."""
    return df.withColumn(out, F.row_number().over(ordered_window(partition_by, order_by)))


def top_n_per_group(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[str],
                    n: int) -> DataFrame:
    """[EXT] keep the first ``n`` rows of each group under a total order.
    Executes as exchange + sort + filter — no global sort, no driver collect."""
    return (
        add_row_number(df, partition_by, order_by, out="__rn")
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def rolling_agg(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    window_rows: int,
    out: str,
    agg: str = "avg",
    decimals: int | None = None,
) -> DataFrame:
    """[EXT] trailing ``window_rows``-row aggregate (e.g. 7-row moving mean),
    frame = rowsBetween(-(window_rows-1), 0)."""
    w = ordered_window(partition_by, order_by).rowsBetween(-(window_rows - 1), 0)
    expr = getattr(F, agg)(F.col(value_col)).over(w)
    if decimals is not None:
        expr = F.round(expr, decimals)
    return df.withColumn(out, expr)


def scd2_collapse(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event/change log:
    collapse consecutive identical states per key into validity intervals
    ``[effective_from, effective_to)`` with a dense version number and an
    ``is_current`` flag on the open interval.

    Classic change-collapse: lag() marks state transitions, a running sum
    numbers the versions, one aggregate takes each version's start, lead()
    closes the interval. ``(ts_col, tiebreak_col)`` must be a TOTAL order
    per key or versioning is nondeterministic. Two narrow windows plus one
    aggregate, all partitioned by the key — a single shuffle of the log at
    scale (Spark reuses the hash partitioning across the three steps).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(state_col)).over(w)
    # Null-safe transition test (IS DISTINCT FROM semantics): a null state
    # following a non-null one IS a change, two consecutive nulls are NOT —
    # a bare ``prev != state`` would evaluate to null and silently miss
    # transitions into a null state.
    chg = F.when(~prev.eqNullSafe(F.col(state_col)), 1).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ver = (
        df.withColumn("__chg", chg)
        .withColumn("version", F.sum("__chg").over(run))
        .groupBy(key_col, "version", state_col)
        .agg(F.min(ts_col).alias("effective_from"))
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    to = F.lead("effective_from").over(wv)
    return ver.select(
        key_col,
        "version",
        state_col,
        "effective_from",
        to.alias("effective_to"),
        F.when(to.isNull(), 1).otherwise(0).alias("is_current"),
    )
