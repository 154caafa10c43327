"""Skew mitigation ([EXT], SURVEY.md §7 scale pass): salting recipes for hot
keys, complementing AQE's runtime skew-join splitting.

When to reach for these at 100 TB:
- AQE skew-join handles skewed SHUFFLE JOINS automatically (session.py turns
  it on), but it cannot fix a skewed AGGREGATION (one reducer still owns the
  hot key) or a broadcast-impossible skewed join against a medium dimension.
- ``salted_agg``: split each key into ``n_salts`` sub-keys, pre-aggregate,
  then aggregate the partials — the hot key's work spreads over n_salts
  reducers. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_join``: replicate the small side once per salt and give each
  big-side row a deterministic salt — the hot key's probe rows spread over
  n_salts tasks. Output is row-identical to the unsalted join.

Both are value-exact (sums run in DECIMAL; replication does not duplicate
matches because each big-side row carries exactly ONE salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the salt-source
    columns (pass a unique id, or the finest-grained columns available) —
    reproducible across retries/partitionings, unlike F.rand()."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_source: Sequence[str],
    n_salts: int = 16,
    scale: int = 2,
) -> DataFrame:
    """Two-phase skew-safe aggregation: COUNT(*) and exact-DECIMAL SUMs.

    Phase 1 groups by (keys + salt) — the hot key becomes ``n_salts``
    groups, each sized ~1/n_salts of the original. Phase 2 groups the
    partials by the true keys; its input is tiny (n_groups * n_salts rows).
    DECIMAL partials make the re-aggregation order-independent, so the
    result is bit-identical to the unsalted plan."""
    phase1 = (
        df.withColumn("__salt", _salt_of(salt_source, n_salts))
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.col(c).cast(f"decimal(38,{scale})")).alias(f"__s_{c}")
                for c in sum_cols
            ],
        )
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[
            F.sum(f"__s_{c}").cast("double").alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_source: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: ``small`` is replicated once per salt value (an
    explode over a literal array — n_salts * |small| rows), ``big`` rows get
    ONE deterministic salt each, and the join key becomes (key, salt). Every
    big-side row still meets every matching small-side row exactly once, so
    the output is row-identical to ``big.join(small, big_key == small_key)``
    while the hot key's rows spread across ``n_salts`` tasks."""
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted_big = big.withColumn("__salt", _salt_of(salt_source, n_salts))
    out = salted_big.join(
        replicated,
        (salted_big[big_key] == replicated[small_key])
        & (salted_big["__salt"] == replicated["__salt"]),
    )
    return out.drop("__salt")
