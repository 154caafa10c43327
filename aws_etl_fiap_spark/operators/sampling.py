"""Deterministic corpus sampling ([EXT]): hash-bucket inclusion, the
reproducible alternative to rand()-based sampling.

Why not df.sample(): at 100 TB a training-data sample must be (a) exactly
re-derivable months later (rand seeds don't survive partitioning changes;
hash-of-key does), (b) stable under re-runs and engine changes, and (c)
consistent ACROSS tables (the same key always lands in the same bucket, so
joined tables sample coherently). Hash-mod sampling gives all three.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.dedup import portable_hash60


def sample_bucket(key: Column, salt: str = "sample") -> Column:
    """Stable bucket in [0, 100) from the PORTABLE hash of (salt, key) —
    re-derivable by any md5-capable engine (DuckDB twin:
    ``CAST('0x' || substr(md5(salt || ':' || key), 1, 15) AS BIGINT) % 100``)."""
    return portable_hash60(F.lit(salt), key.cast("string")) % 100


def deterministic_sample(
    df: DataFrame, key_col: str, rate_pct: int, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose key hashes into the first ``rate_pct`` of 100 buckets.
    Rates compose monotonically: the 5% sample is a subset of the 10% sample
    under the same salt (bucket < 5 implies bucket < 10) — grow a training
    set without resampling what you already curated."""
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be in [0, 100]")
    return df.filter(sample_bucket(F.col(key_col), salt) < rate_pct)


def _portable_order_key(id_col: str, salt: str) -> Column:
    """The ``(md5(salt:id), id)`` order key's hash component, with an
    IN-PLAN null guard: a NULL id would make concat_ws skip the input —
    every null-id row then shares one hash AND a NULL tiebreaker, so which
    of them crosses a quota boundary becomes partition-placement-dependent,
    silently defeating the module's reproducibility contract."""
    idc = F.col(id_col)
    guarded = F.when(
        idc.isNull(),
        F.raise_error(
            F.lit(
                f"deterministic sampling requires a non-null {id_col!r}: "
                "null ids share one hash and tie under the portable order, "
                "making the selected set run-dependent"
            )
        ).cast("string"),
    ).otherwise(idc.cast("string"))
    return F.md5(F.concat_ws(":", F.lit(salt), guarded))


def _order_statistic_take(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    salt: str,
    attach_quota,
) -> DataFrame:
    """Shared two-level ORDER-STATISTIC REFINEMENT (the scale shape of the
    quota samplers): bucket rows by the first hash byte, aggregate
    (stratum, bucket) counts into a KB-sized frame, let ``attach_quota``
    add a ``__quota`` column to it, mark whole/boundary buckets, and pay a
    ROW_NUMBER only inside each stratum's single boundary bucket."""
    hexw = 2  # first hash byte -> 256 refinement buckets
    keyed = df.withColumn("__k", _portable_order_key(id_col, salt)).withColumn(
        "__b", F.conv(F.substring("__k", 1, hexw), 16, 10).cast("int")
    )
    counts = keyed.groupBy(*strata_cols, "__b").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(*strata_cols).orderBy("__b")
    plan = (
        attach_quota(counts)
        .withColumn("__cum", F.sum("__n").over(w))
        .withColumn("__before", F.col("__cum") - F.col("__n"))
        # take_n: rows this bucket contributes (whole bucket, partial, none).
        .withColumn(
            "__take",
            F.greatest(
                F.lit(0),
                F.least(F.col("__n"), F.col("__quota") - F.col("__before")),
            ),
        )
        .filter(F.col("__take") > 0)
        .select(*strata_cols, "__b", "__n", "__take")
    )
    marked = keyed.join(F.broadcast(plan), [*strata_cols, "__b"])
    whole = marked.filter(F.col("__take") == F.col("__n"))
    boundary = marked.filter(F.col("__take") < F.col("__n"))
    wb = Window.partitionBy(*strata_cols, "__b").orderBy("__k", id_col)
    partial = (
        boundary.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") <= F.col("__take"))
        .drop("__rn")
    )
    out_cols = df.columns
    return whole.select(*out_cols).unionByName(partial.select(*out_cols))


def stratified_quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    id_col: str,
    salt: str = "strat",
    n_refine_buckets: int = 256,
) -> DataFrame:
    """EXACT per-stratum quota sample: the ceil(fraction * n_stratum)
    smallest rows of each stratum under the portable order
    ``(md5(salt:id), id)`` — deterministic, engine-re-derivable (the DuckDB
    twin is a plain ROW_NUMBER window), and composable with
    :func:`deterministic_sample`'s reproducibility story but with a HARD
    per-stratum count, which is what curation recipes specify ("10% of each
    language", "50k docs per source").

    Scale shape: the naive implementation is one ROW_NUMBER window
    partitioned by stratum — at 100 TB a dominant stratum (say English at
    50 TB) lands on a single task and dies.  This does the classic two-level
    ORDER-STATISTIC REFINEMENT instead:

    1. bucket every row by its first hash byte (256 slots — the bucket
       count is FIXED by the hash-prefix construction; ``n_refine_buckets``
       is accepted only as a validated back-compat no-op, r9 advice);
    2. aggregate (stratum, bucket) counts — a KB-sized frame — and compute
       per-stratum running totals, locating each stratum's quota BOUNDARY
       bucket;
    3. buckets wholly below the boundary are taken with NO per-row ranking
       (a broadcast-joined plan row marks them take-all); only the single
       boundary bucket per stratum — ~1/n_refine_buckets of the stratum —
       pays a ROW_NUMBER, and its window partition is (stratum, bucket), so
       the heavy stratum's rank work shrinks by the bucket fan-out.

    The output SET is identical to the naive window's (the order key sorts
    primarily by the hash whose prefix defines the bucket; verified row-set
    equal in tests/test_corpus.py).

    The quota is EXACT integer arithmetic: ``fraction`` becomes the
    rational num/den (via its decimal string, so 0.1 is 1/10, not the
    IEEE double 0.1000...0555) and quota = (n*num + den - 1) div den —
    double math has ceil(0.07 * 100) = 8 (0.07*100 = 7.000000000000001),
    which both over-samples and diverges from a decimal-typed SQL twin
    (DuckDB's CEIL(0.1 * n) is exact decimal arithmetic).  The product
    rides DECIMAL(38,0) so petabyte-scale strata cannot overflow."""
    from fractions import Fraction

    if n_refine_buckets != 256:
        raise ValueError(
            "the refinement bucket count is fixed at 256 (the first hash "
            f"byte); got {n_refine_buckets}"
        )
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    frac = Fraction(str(fraction))
    num, den = frac.numerator, frac.denominator

    def attach_quota(counts: DataFrame) -> DataFrame:
        return (
            counts.withColumn(
                "__total", F.sum("__n").over(Window.partitionBy(*strata_cols))
            )
            .withColumn(
                "__quota",
                F.expr(
                    f"CAST((CAST(__total AS DECIMAL(38,0)) * {num} + {den - 1}) "
                    f"div {den} AS BIGINT)"
                ),
            )
            .drop("__total")
        )

    return _order_statistic_take(df, strata_cols, id_col, salt, attach_quota)


def weighted_poisson_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    expected_k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted Poisson sampling: include each row independently with
    probability min(1, expected_k * w / W) — the deterministic weighted
    corpus-mixing primitive (heavier documents proportionally likelier),
    reproducible months later because the coin flip is the portable hash of
    the key, not a RNG.

    Scale shape: W is ONE scalar aggregate broadcast back (crossJoin of a
    1-row frame); the inclusion test is then a pure projection — no
    shuffle of the corpus itself, no ordering, no top-k heap, unlike
    exact-size weighted reservoirs (A-ES) whose log/pow keys are also not
    bit-reproducible across engines.

    The coin flip is the hash of ``key_col``, so rows SHARING a key (or
    all sharing a NULL key) share one u and are included or excluded as a
    block — by design for cross-table coherence; pass a unique key for
    per-row independence.  A non-positive or all-NULL weight total fails
    in-plan (the rate would be NULL/negative and the result silently
    empty).  Output schema = input + ``rate``.
    """
    u = (
        (portable_hash60(F.lit(salt), F.col(key_col).cast("string")) % 1_000_000)
        .cast("double")
        / 1.0e6
    )
    total = df.agg(F.sum(F.col(weight_col)).alias("__W"))
    w_ok = F.col("__W").isNotNull() & (F.col("__W").cast("double") > 0)
    rate = F.when(
        ~w_ok,
        F.raise_error(
            F.lit(
                "weighted_poisson_sample: weight total is NULL or <= 0 — "
                "every rate would be NULL/negative and the sample silently "
                "empty"
            )
        ).cast("double"),
    ).otherwise(
        F.lit(float(expected_k)) * F.col(weight_col).cast("double") / F.col("__W").cast("double")
    )
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn("rate", rate)
        .filter(u < F.col("rate"))
        .drop("__W")
    )


def _default_range_partitions(df: DataFrame) -> int:
    """Partition count for the two-pass range schemes: the configured
    shuffle parallelism, clamped to the INPUT's split count.  Output is
    partition-count-independent (any total order gives the same result),
    so this is latency-only: a vanilla 200-partition session over a
    one-file scan would otherwise run hundreds of near-empty tasks per
    pass (measured 8s at sf0.01); on a real cluster the input split count
    meets/exceeds shuffle.partitions and the configured value wins."""
    spark = df.sparkSession
    return min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        max(1, df.rdd.getNumPartitions()),
    )


def _two_pass_range_stamp(
    df: DataFrame,
    order_cols: list,
    out: str,
    num_partitions: int | None,
    offset_agg: Column,
    stamp_fn,
) -> DataFrame:
    """Shared scaffold of :func:`ordered_global_index` and
    :func:`ordered_prefix_sum` — range-partition + sort on the order
    columns, reduce ONE offset per partition to the driver (bounded by
    partition count), prefix-sum into start offsets, broadcast, and stamp
    in a streaming Arrow pass.  ``stamp_fn(pdf, start) -> (values,
    consumed)`` produces the stamped column for one batch.

    The intermediate is ``localCheckpoint``-pinned so the offsets pass and
    the stamp pass share one shuffle+sort; the blocks live until the frame
    is GC'd (ContextCleaner), and checkpointed state is not recomputable on
    executor loss — a long loop over many shards should materialize each
    result before moving on."""
    from pyspark import TaskContext
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = _default_range_partitions(df)
    parts = df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    )
    parts = parts.localCheckpoint(eager=True)
    per_pid = dict(
        parts.groupBy(F.spark_partition_id().alias("pid"))
        .agg(offset_agg.alias("s"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += int(per_pid.get(pid, 0) or 0)
    bc = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(list(parts.schema.fields) + [StructField(out, LongType())])

    def stamp(batches):
        pid = TaskContext.get().partitionId()
        seen = bc.value[pid]
        for pdf in batches:
            pdf = pdf.copy()
            vals, consumed = stamp_fn(pdf, seen)
            pdf[out] = vals
            seen += consumed
            yield pdf

    return parts.mapInPandas(stamp, out_schema)


def ordered_global_index(
    df: DataFrame,
    order_cols: list[str],
    out: str = "global_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based global index under a TOTAL order — without the
    classic ``row_number() OVER (ORDER BY ...)`` single-reducer window,
    which funnels the whole table through ONE task and is the canonical
    100 TB anti-pattern.

    Two-pass range-partition scheme instead: range-partition + sort on the
    order columns (so partition p holds a contiguous key range), count rows
    per partition (ONE long per partition to the driver — bounded by the
    partition count, never by rows), prefix-sum those counts into start
    offsets, then stamp ``offset + local position`` in a streaming Arrow
    pass.  The result is identical to the window form for any total order,
    but every stage is as parallel as the partition count.  (Correctness
    does not depend on WHERE the range boundaries land — only on the sort —
    so the range partitioner's sampling is free to be approximate.)

    ``order_cols`` must be a total order (add a unique tiebreaker);
    otherwise indices within tied runs are partition-placement-dependent.
    """
    import pandas as pd

    def stamp_fn(pdf, start):
        return pd.RangeIndex(start, start + len(pdf)).to_numpy(), len(pdf)

    return _two_pass_range_stamp(
        df, order_cols, out, num_partitions, F.count(F.lit(1)), stamp_fn
    )


def balanced_class_sample(
    df: DataFrame,
    class_cols: list[str],
    id_col: str,
    salt: str = "balance",
) -> DataFrame:
    """Class-balanced downsample: every class keeps exactly M rows, where
    M is the SMALLEST class's count — the classic majority-downsampling
    recipe for imbalanced training data, made deterministic by taking each
    class's M smallest rows under the portable ``(md5(salt:id), id)``
    order (same order family as :func:`stratified_quota_sample`, so the
    selection is engine-re-derivable and stable across re-runs).

    Scale shape: per-class counts reduce to a class-cardinality-sized
    frame; M broadcasts back as a 1-row lazy aggregate (no driver
    action); the per-class ranking is a window over (class) — for a
    majority class that dwarfs a single task, swap in the same
    order-statistic refinement stratified_quota_sample uses (bucket by
    first hash byte, rank only the boundary bucket); the selected SET is
    identical.
    """
    key = _portable_order_key(id_col, salt)
    counts = df.groupBy(*class_cols).agg(F.count(F.lit(1)).alias("__cn"))
    m = counts.agg(F.min("__cn").alias("__m"))
    w = Window.partitionBy(*class_cols).orderBy("__k", id_col)
    return (
        df.withColumn("__k", key)
        .withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .filter(F.col("__rn") <= F.col("__m"))
        .select(*df.columns)
    )


def bottom_k_sample(df: DataFrame, id_col: str, k: int, salt: str = "bottomk") -> DataFrame:
    """Bottom-k sample: the ``k`` rows with the smallest portable hash of
    (salt, id) — a uniform sample that is MERGEABLE: the bottom-k of a
    union is the bottom-k of the per-partition bottom-ks, so executors
    reduce locally and the driver-side state is k rows no matter the
    input volume (Spark's TakeOrdered does exactly this).  Like
    :func:`deterministic_sample` it is engine-re-derivable (DuckDB twin:
    ORDER BY md5 LIMIT k) and stable across runs/partitionings; unlike
    it, the sample size is EXACT rather than proportional, which is what
    hold-out evaluation sets specify."""
    key = _portable_order_key(id_col, salt)
    return (
        df.withColumn("__k", key)
        .orderBy("__k", id_col)
        .limit(k)
        .drop("__k")
    )


def quota_plan_sample(
    df: DataFrame,
    strata_cols: list[str],
    quotas: DataFrame,
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """EXACT per-stratum sample against an EXPLICIT quota frame
    (``strata_cols`` + a ``quota`` long column): the ``quota`` smallest
    rows of each stratum under the portable order ``(md5(salt:id), id)``.
    The per-stratum mechanics are :func:`stratified_quota_sample`'s
    two-level order-statistic refinement (bucket counts -> boundary
    bucket -> ROW_NUMBER only inside the boundary bucket), but the quota
    comes from the caller — the hook for mixture recipes
    (:func:`temperature_mix_quotas`) and any externally-specified
    per-domain budget.  Strata absent from ``quotas`` contribute nothing;
    quotas larger than the stratum take the whole stratum.  A DUPLICATE
    stratum row in ``quotas`` fails in-plan: the inner join would fan the
    bucket counts out, double-counting the running sum and duplicating
    sampled rows with no error."""
    dupw = Window.partitionBy(*strata_cols)
    checked = quotas.select(
        *strata_cols, F.col("quota").cast("long").alias("__q")
    ).withColumn(
        "__quota",
        F.when(
            F.count(F.lit(1)).over(dupw) > 1,
            F.raise_error(
                F.lit(
                    "quota_plan_sample: duplicate stratum rows in the "
                    "quotas frame — the join would fan out bucket counts "
                    "and duplicate sampled rows"
                )
            ).cast("long"),
        ).otherwise(F.col("__q")),
    ).drop("__q")

    def attach_quota(counts: DataFrame) -> DataFrame:
        return counts.join(F.broadcast(checked), strata_cols)

    return _order_statistic_take(df, strata_cols, id_col, salt, attach_quota)


def temperature_mix_quotas(
    df: DataFrame, stratum_col: str, budget: int, score_scale: int = 10**9
) -> DataFrame:
    """Per-stratum quotas for TEMPERATURE-FLATTENED domain mixing at
    alpha = 0.5 (the multilingual-corpus rebalancing recipe: sample
    domain d with probability proportional to ``n_d ** alpha``, which
    up-weights small domains relative to raw proportions): quota_d =
    round(budget * sqrt(n_d) / sum_e sqrt(n_e)), capped at n_d.

    Bit-reproducibility across engines (the oracle gate hashes the
    SELECTED ROWS): sqrt is IEEE-correctly-rounded everywhere, but a sum
    of doubles depends on summation order — so each sqrt score is
    half-up-quantized onto an integer grid (``score_scale`` parts) FIRST
    and all shares are computed with exact integer arithmetic
    (``(2*budget*s + t) div (2*t)`` is round-half-up of ``budget*s/t``).
    The product rides DECIMAL(38,0): at a 1e8-row stratum the quantized
    score is ~1e13 and ``2*budget*s`` leaves BIGINT range for
    million-document budgets — int64 would wrap to a NEGATIVE quota and
    least(n, quota) would silently drop the stratum.  Alpha is fixed at
    1/2 because
    ``pow(x, a)`` for general a is NOT correctly rounded and diverges
    between libm implementations; other rationals would need nested
    roots.  One aggregate over strata (KB-sized), one scalar total,
    broadcast back — nothing touches the corpus."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    scored = counts.withColumn(
        "__s",
        F.floor(F.sqrt(F.col("__n")) * float(score_scale) + F.lit(0.5)).cast(
            "long"
        ),
    )
    total = scored.agg(F.sum("__s").cast("long").alias("__t"))
    return (
        scored.crossJoin(F.broadcast(total))
        .withColumn(
            "quota",
            F.least(
                F.col("__n"),
                F.expr(
                    f"CAST((2 * CAST({budget} AS DECIMAL(38,0)) * __s + __t) "
                    "div (CAST(2 AS DECIMAL(38,0)) * __t) AS BIGINT)"
                ),
            ).cast("long"),
        )
        .select(stratum_col, "__n", "quota")
    )


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    sum_col: str,
    out: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running SUM of ``sum_col`` under a TOTAL order — the
    budget-accounting sibling of ``ordered_global_index`` (same two-pass
    range-partition scheme, same reason: ``SUM() OVER (ORDER BY ...)``
    with no PARTITION BY funnels the whole table through one task).

    Pass 1 range-partitions + sorts on the order columns and reduces ONE
    per-partition subtotal to the driver (bounded by partition count);
    pass 2 stamps ``prefix_offset + within-partition cumsum`` in a
    streaming Arrow pass.  Identical to the single-reducer window form for
    any total order; ``order_cols`` must include a unique tiebreaker.

    ``sum_col`` must be INTEGRAL (refused loudly otherwise: a double
    column would be silently truncated per row by the int64 stamp, making
    the running sum wrong, not just rounded), and NULLs contribute 0 —
    the same skip semantics as pass 1's F.sum (a NULL used to crash the
    Arrow stamp's astype with 'cannot convert non-finite values')."""
    t = dict(df.dtypes)[sum_col]
    if t not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"ordered_prefix_sum needs an integral sum_col, got {sum_col!r}: "
            f"{t} (cast/scale weights to integers upstream)"
        )

    def stamp_fn(pdf, start):
        vals = pdf[sum_col].fillna(0).astype("int64")
        return (vals.cumsum() + start).to_numpy(), int(vals.sum())

    return _two_pass_range_stamp(
        df, order_cols, out, num_partitions,
        F.sum(F.col(sum_col).cast("long")), stamp_fn,
    )
