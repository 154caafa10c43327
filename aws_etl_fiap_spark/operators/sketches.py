"""Mergeable frequency sketches ([EXT]: the 100 TB profile-pass toolbox
alongside the HLL++/KLL gates in queries/analytics_q.py).

Count-min sketch, built from relational primitives so the whole chain is
plan-visible and cross-engine reproducible:

- UPDATE: explode each row into ``depth`` (row, seed) pairs, hash into
  ``width`` buckets, count per (seed, bucket).  One groupBy over a
  depth-times-larger map-side stream; the reduced sketch is exactly
  ``depth x width`` rows no matter the input volume — the textbook
  mergeable-summary contract (merging two sketches = summing bucket
  counts), here expressed as an aggregate Catalyst can partial-apply.
- QUERY: join candidate keys against the (broadcast-sized) sketch on the
  same (seed, bucket) pair and take ``min(count)`` over the depth rows —
  the classic CM point estimate, which never under-counts.

Hashing uses :func:`operators.dedup.portable_hash60` (md5-prefix), so the
estimates themselves — not just an accuracy bound — are bit-reproducible
in any md5-capable engine and can be exact-hash verified against DuckDB.
Swap ``hash_family="fast"`` for xxhash64 in production where cross-engine
replay is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.dedup import portable_hash60
from aws_etl_fiap_spark.sources.readers import spread_input


def _bucket(seed: Column, key: Column, width: int, hash_family: str) -> Column:
    if hash_family == "portable":
        h = portable_hash60(seed.cast("string"), key.cast("string"))
    elif hash_family in ("fast", "xxhash64"):
        h = F.xxhash64(seed.cast("string"), key.cast("string"))
    else:
        # a typo ('portible', 'Portable') must not silently switch the
        # sketch to non-portable hashing — the failure would surface as an
        # inexplicable oracle mismatch far from the call site
        raise ValueError(f"unknown hash family: {hash_family!r}")
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 1024,
    hash_family: str = "portable",
) -> DataFrame:
    """Count-min sketch of ``df[key]`` as a (seed, bucket, n) frame.

    Output is at most ``depth * width`` rows regardless of input size; the
    exploded update stream is map-side combined before the one shuffle.
    """
    if depth < 1:
        # sequence(0, -1) DESCENDS to [0, -1]: depth=0 would silently
        # build a nonsense two-seed sketch instead of failing
        raise ValueError(f"depth must be >= 1, got {depth}")
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    # Spread to session parallelism before the depth-x explode + md5
    # cascade (guide §2.5): a one-row-group scan otherwise hashes every
    # update serially on one core; a no-op on real multi-split tables.
    updates = spread_input(df.select(F.col(key).alias("__k"))).select(seeds, "__k")
    return (
        updates.select(
            "seed", _bucket(F.col("seed"), F.col("__k"), width, hash_family).alias("bucket")
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 1024,
    hash_family: str = "portable",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Point-estimate each key's frequency from a built sketch.

    ``keys`` is one row per distinct key to probe.  The sketch (<= depth x
    width rows) broadcasts; each key expands to its ``depth`` probe
    coordinates and takes the min matched count.  A probe coordinate with
    no sketch row means count 0 (empty bucket), hence the coalesce-to-0
    BEFORE the min.

    ``passthrough`` columns from ``keys`` (functionally dependent on the
    key, e.g. a pre-computed exact count) ride through the probe expansion
    and come back as extra group keys — they never change which rows group
    together, but they spare the caller a whole key-keyed re-join of the
    estimate against its side data (one exchange + join removed from the
    heavy-hitters query's plan).
    """
    extra = list(passthrough or [])
    probes = keys.select(F.col(key), *[F.col(c) for c in extra]).select(
        key,
        *extra,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"),
    )
    probes = probes.select(
        key,
        *extra,
        "seed",
        _bucket(F.col("seed"), F.col(key), width, hash_family).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .select(key, *extra, F.coalesce("n", F.lit(0)).alias("n"))
        .groupBy(key, *extra)
        .agg(F.min("n").alias("est_count"))
    )


def sql_cms_bucket(seed_expr: str, key_expr: str, width: int) -> str:
    """DuckDB twin of the portable bucket expression (md5-prefix hash60).

    NULL keys mirror Spark's ``concat_ws`` exactly: concat_ws drops a NULL
    argument AND its separator (hashing ``'0'``), whereas a bare CONCAT
    would skip only the NULL and hash ``'0:'`` — a silent one-character
    divergence that breaks bit-reproducibility on any nullable key."""
    pair = (
        "CASE WHEN (" + key_expr + ") IS NULL THEN CAST(" + seed_expr + " AS VARCHAR) "
        "ELSE CONCAT(CAST(" + seed_expr + " AS VARCHAR), ':', CAST(" + key_expr + " AS VARCHAR)) END"
    )
    h = f"CAST(CONCAT('0x', SUBSTR(md5({pair}), 1, 15)) AS BIGINT)"
    return f"(({h}) % {width} + {width}) % {width}"


def bloom_build(
    df: DataFrame,
    key: str,
    n_bits: int = 2048,
    n_hashes: int = 3,
    hash_family: str = "portable",
) -> DataFrame:
    """Bloom filter of ``df[key]`` as a (word, bits) frame — the membership
    sketch expressed relationally, like :func:`cms_build`.

    Each key sets ``n_hashes`` bit positions in an ``n_bits`` bitmap; the
    bitmap is stored as 32-bit words inside BIGINTs (32, not 64, keeps
    every mask positive — ``1 << 63`` wraps negative in Spark and errors
    in other engines, so the sign bit is never used).  Build is one
    map-side-combined ``bit_or`` aggregate over the exploded (key, seed)
    stream; output is at most ``n_bits / 32`` rows regardless of input
    volume, and two filters merge by bitwise-OR on word — the same
    mergeable-summary contract as the count-min sketch.
    """
    if n_bits % 32:
        raise ValueError("n_bits must be a multiple of 32")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    pos = _bucket(F.col("seed"), F.col("__k"), n_bits, hash_family)
    return (
        df.select(F.col(key).alias("__k"))
        .select(seeds, "__k")
        .select((pos / 32).cast("int").alias("word"), (pos % 32).cast("int").alias("bit"))
        # F.shiftleft takes a literal int shift; the SQL form shifts by a column
        .select("word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    keys: DataFrame,
    bloom: DataFrame,
    key: str,
    n_bits: int = 2048,
    n_hashes: int = 3,
    hash_family: str = "portable",
) -> DataFrame:
    """Test each key against a built filter: a key passes iff ALL its
    ``n_hashes`` bit positions are set.  The filter (<= n_bits/32 rows)
    broadcasts; a probe coordinate landing on an absent word row means an
    all-zero word, hence the coalesce-to-0 before the bit test.  No false
    negatives by construction (the gate the registered query verifies
    exactly); false-positive rate falls out of the bitmap density."""
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    probes = keys.select(F.col(key)).select(
        key, F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    )
    pos = _bucket(F.col("seed"), F.col(key), n_bits, hash_family)
    probes = probes.select(
        key,
        (pos / 32).cast("int").alias("word"),
        (pos % 32).cast("int").alias("bit"),
    )
    hit = F.expr("shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit) % 2 = 1")
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(key, hit.alias("hit"))
        .groupBy(key)
        .agg(F.bool_and("hit").alias("passed"))
    )


def mergeable_quantile_summary(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 256,
    emit: str = "violations",
) -> DataFrame:
    """[EXT] Mergeable epsilon-approximate QUANTILE summary with an exact
    error-accounting gate — the fourth classic sketch next to count-min,
    Bloom, and HLL (Manku/Rajagopalan/Lindsay-style stride sampling;
    public-knowledge construction, no RNG, fully deterministic).

    Build: each partition sorts its values (external sort, streamed) and
    keeps the LAST row of every ``stride_p = ceil(n_p / k)`` block with the
    block size as its weight — at most ``k`` weighted samples per
    partition, so the merged summary is ``partitions x k`` rows: bounded
    driver state at any corpus size, and summaries from different
    partitions/machines/days merge by concatenation (the mergeability that
    makes this the production shape for percentile dashboards over 100 TB).
    The estimate for rank r is the first merged sample whose cumulative
    weight reaches r; its true rank error is bounded by
    B = sum_p stride_p <= n/k + P.

    Gate: ONE distributed aggregate re-computes the EXACT attainable-rank
    INTERVAL of every estimate — [count(v < est) + 1, count(v <= est)],
    both conditional sums in a single scan — and emits a row per quantile
    whose interval lies entirely outside target_rank +/- 2B.  The interval
    (not a bare |count(v <= est) - target| compare) is what makes the gate
    sound on DUPLICATE-heavy data: a constant column has
    count(v <= est) = n for a perfect estimate, and the old form flagged
    it as a violation.  Steady-state output: EMPTY, verified against the
    empty-set oracle — the same violation-gate pattern as the ANN recall
    gates.
    """
    import math
    from fractions import Fraction

    from pyspark import TaskContext
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = df.sparkSession
    src = (
        df.select(F.col(value_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .sortWithinPartitions("v")
        .localCheckpoint(eager=True)
    )
    counts = dict(
        src.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = sum(counts.values())
    strides = {pid: max(1, math.ceil(c / k)) for pid, c in counts.items()}
    bound = sum(strides.values())
    bc = spark.sparkContext.broadcast((strides, counts))

    out_schema = StructType(
        [StructField("v", DoubleType()), StructField("w", LongType())]
    )

    def sample_gen(batches):
        import numpy as np
        import pandas as pd

        ctx = TaskContext.get()
        strides_b, counts_b = bc.value
        pid = ctx.partitionId()
        stride = strides_b.get(pid, 1)
        n_p = counts_b.get(pid, 0)
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            arr = pdf["v"].to_numpy()
            # Vectorized stride sampling: keep positions where the 1-based
            # within-partition index is a multiple of the stride — numpy
            # slicing, not a per-row Python loop.
            j0 = (stride - 1 - (seen % stride)) % stride
            vals = arr[j0::stride].astype(float).tolist()
            weights = [stride] * len(vals)
            seen += len(arr)
            if seen == n_p and n_p % stride:  # close the partial tail block
                vals.append(float(arr[-1]))
                weights.append(n_p % stride)
            if vals:
                yield pd.DataFrame({"v": vals, "w": np.array(weights, dtype=np.int64)})

    samples = sorted(
        (r["v"], r["w"]) for r in src.mapInPandas(sample_gen, out_schema).collect()
    )
    bc.unpersist()  # samples are collected; nothing downstream reads it
    ests = []
    for p in probs:
        # exact rational ceil(p * n): double math has 0.55 * 100 ==
        # 55.000000000000007, off-by-one for exact-integer products
        frac = Fraction(str(p))
        target = max(1, (n * frac.numerator + frac.denominator - 1) // frac.denominator)
        cum = 0
        est = samples[-1][0] if samples else None
        for v, w in samples:
            cum += w
            if cum >= target:
                est = v
                break
        ests.append((float(p), target, est))

    ranks = src.agg(
        *[
            expr
            for i, (_, _, e) in enumerate(ests)
            for expr in (
                F.sum((F.col("v") <= F.lit(e)).cast("long")).alias(f"r{i}"),
                F.sum((F.col("v") < F.lit(e)).cast("long")).alias(f"lt{i}"),
            )
        ]
    )
    lits = spark.createDataFrame(
        [(p, t, e, i) for i, (p, t, e) in enumerate(ests)],
        "prob double, target_rank long, est double, idx int",
    )
    exact = F.when(F.col("idx") == 0, F.col("r0"))
    lo = F.when(F.col("idx") == 0, F.col("lt0"))
    for i in range(1, len(ests)):
        exact = exact.when(F.col("idx") == i, F.col(f"r{i}"))
        lo = lo.when(F.col("idx") == i, F.col(f"lt{i}"))
    out = lits.crossJoin(F.broadcast(ranks)).select(
        "prob",
        "target_rank",
        "est",
        exact.alias("exact_rank"),
        F.lit(2 * bound).cast("long").alias("bound"),
        (lo + 1).alias("__rank_lo"),  # attainable-rank interval low end
    )
    if emit == "estimates":
        return out.drop("__rank_lo")
    # violation iff [__rank_lo, exact_rank] lies ENTIRELY outside
    # target_rank +/- bound (any rank of the estimate's duplicate run
    # inside the band means the estimate is a valid approximate quantile)
    return out.filter(
        (F.col("__rank_lo") - F.col("target_rank") > F.col("bound"))
        | (F.col("target_rank") - F.col("exact_rank") > F.col("bound"))
    ).drop("__rank_lo")
