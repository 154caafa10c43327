"""Mergeable-sketch queries ([EXT §2.4 scale path]: the profile pass a
100 TB warehouse runs with bounded state — count-min frequency estimation
and Apache DataSketches HLL distinct-count merging — alongside the
HLL++/KLL accuracy gates already in queries/analytics_q.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    sql_cms_bucket,
)
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table

_CMS_DEPTH = 4
_CMS_WIDTH = 1024

_B_UPD = sql_cms_bucket("seed", "o_custkey", _CMS_WIDTH)


@query(
    "sketch_cms_heavy_hitters",
    oracle=f"""
WITH seeds AS (SELECT unnest(range(0, {_CMS_DEPTH})) AS seed),
upd AS (
    SELECT seed, {_B_UPD} AS bucket FROM orders CROSS JOIN seeds
),
sk AS (SELECT seed, bucket, COUNT(*) AS n FROM upd GROUP BY seed, bucket),
keys AS (SELECT DISTINCT o_custkey FROM orders),
probes AS (
    SELECT o_custkey, seed, {_B_UPD} AS bucket FROM keys CROSS JOIN seeds
),
est AS (
    SELECT o_custkey, MIN(COALESCE(n, 0)) AS est_count
    FROM probes LEFT JOIN sk USING (seed, bucket)
    GROUP BY o_custkey
),
tru AS (SELECT o_custkey, COUNT(*) AS true_count FROM orders GROUP BY o_custkey)
SELECT est.o_custkey, est.est_count, tru.true_count
FROM est JOIN tru USING (o_custkey)
ORDER BY est_count DESC, o_custkey
LIMIT 20
""",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4] Count-min sketch built from relational primitives
    (operators/sketches.py): depth x width bounded state, map-side
    combined update stream, broadcast probe join, classic min-of-rows
    point estimate.  Hashing is the portable md5-prefix family, so the
    driver hash-verifies the ESTIMATES themselves against DuckDB running
    the identical sketch in SQL — not merely an accuracy bound.  Output:
    top-20 customers by estimated order count (est DESC, key ASC total
    order) with the exact count alongside; est >= true everywhere by the
    CM construction."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    sketch = cms_build(orders, "o_custkey", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    # The exact per-key count IS the distinct key set (plus one column), so
    # it serves as the probe frame and rides through the estimate as a
    # passthrough group key — the old distinct() + post-estimate equi-join
    # re-shuffled the key set twice for values this one aggregate already
    # had (r13 plan audit: 2 exchanges + 1 join removed; output identical).
    true = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("true_count"))
    est = cms_estimate(
        true, sketch, "o_custkey", depth=_CMS_DEPTH, width=_CMS_WIDTH,
        passthrough=["true_count"],
    )
    return (
        est.select("o_custkey", "est_count", "true_count")
        .orderBy(F.col("est_count").desc(), F.col("o_custkey"))
        .limit(20)
    )


@query(
    "sketch_hll_merge_gate",
    oracle="""
SELECT CAST(NULL AS VARCHAR) AS l_returnflag, CAST(NULL AS VARCHAR) AS metric,
       CAST(NULL AS DOUBLE) AS approx_value, CAST(NULL AS DOUBLE) AS exact_value
WHERE 1 = 0
""",
)
def sketch_hll_merge_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4] Apache DataSketches HLL as a MERGEABLE summary: build one
    binary sketch per l_returnflag group (hll_sketch_agg), then union-merge
    the per-group sketches (hll_union_agg) into a global sketch — the
    two-level rollup a 1000-executor profile pass ships to the driver as
    KB-sized state instead of re-scanning.  Registered as an exact
    accuracy gate (sketch bits are implementation-defined — same pattern
    as agg_approx_profile): emit one row per estimate deviating > 5% from
    its exactly-computed twin, at lgK=14 (rse ~0.65%) on this data that is
    the empty set, so any violation hash-fails the driver row.

    Both exact sides reduce distinct pairs before counting (no wide
    countDistinct buffer next to the sketch buffer — the Expand-plan
    blowup documented at queries/analytics_q.py:268)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    per_sk = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey", F.lit(14)).alias("sk")
    )
    per_est = per_sk.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").cast("double").alias("approx_value"),
    )
    per_exact = (
        li.distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("double").alias("exact_value"))
    )
    grp_viol = (
        per_est.join(per_exact, "l_returnflag")
        .filter(
            F.abs(F.col("approx_value") - F.col("exact_value"))
            > 0.05 * F.col("exact_value")
        )
        .select(
            "l_returnflag",
            F.lit("grp_distinct_orders").alias("metric"),
            "approx_value",
            "exact_value",
        )
    )
    merged_est = per_sk.agg(F.hll_union_agg("sk").alias("mk")).select(
        F.hll_sketch_estimate("mk").cast("double").alias("approx_value")
    )
    global_exact = (
        li.select("l_orderkey")
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("exact_value"))
    )
    global_viol = (
        merged_est.crossJoin(global_exact)
        .filter(
            F.abs(F.col("approx_value") - F.col("exact_value"))
            > 0.05 * F.col("exact_value")
        )
        .select(
            F.lit(None).cast("string").alias("l_returnflag"),
            F.lit("merged_global_distinct_orders").alias("metric"),
            "approx_value",
            "exact_value",
        )
    )
    return grp_viol.unionByName(global_viol)


_BLOOM_BITS = 2048
_BLOOM_K = 3

_POS = sql_cms_bucket("seed", "k", _BLOOM_BITS)


@query(
    "sketch_bloom_membership",
    oracle=f"""
WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders),
seeds AS (SELECT unnest(range(0, {_BLOOM_K})) AS seed),
upd AS (SELECT seed, {_POS} AS pos FROM members CROSS JOIN seeds),
words AS (
    SELECT CAST(pos // 32 AS INT) AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
    FROM upd GROUP BY word
),
probes AS (SELECT c_custkey AS k FROM customer),
pcoord AS (
    SELECT k, CAST(pos // 32 AS INT) AS word, CAST(pos % 32 AS INT) AS bit
    FROM (SELECT k, {_POS} AS pos FROM probes CROSS JOIN seeds)
),
ptest AS (
    SELECT k, bool_and(((COALESCE(bits, 0) >> bit) % 2) = 1) AS passed
    FROM pcoord LEFT JOIN words USING (word) GROUP BY k
),
ann AS (
    SELECT p.k, p.passed, (m.k IS NOT NULL) AS is_member
    FROM ptest p LEFT JOIN members m ON m.k = p.k
)
SELECT COUNT(*) AS n_probed,
       COUNT(CASE WHEN is_member THEN 1 END) AS n_members,
       COUNT(CASE WHEN passed THEN 1 END) AS n_passed,
       COUNT(CASE WHEN passed AND NOT is_member THEN 1 END) AS n_false_positives,
       COUNT(CASE WHEN is_member AND NOT passed THEN 1 END) AS n_false_negatives
FROM ann
""",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.4 scale path] Bloom filter as relational data
    (operators/sketches.bloom_build/bloom_probe): the ordering-customer
    key set compresses to a 2048-bit bitmap (<= 64 word rows, one
    map-side-combined bit_or aggregate, bitwise-OR mergeable across
    partitions); every customer key then probes the broadcast filter.
    Output is the one-row confusion summary — n_false_negatives MUST be 0
    (the bloom guarantee, hash-verified), and the false-positive count is
    itself exact because the portable md5 hashing lets DuckDB rebuild the
    identical bitmap in SQL.  Complements the Catalyst runtime-bloom gate
    (test_scale_ops) with an explicitly materializable, storable filter."""
    from aws_etl_fiap_spark.operators.sketches import bloom_build, bloom_probe

    members = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    probes = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    bloom = bloom_build(members, "k", n_bits=_BLOOM_BITS, n_hashes=_BLOOM_K)
    tested = bloom_probe(probes, bloom, "k", n_bits=_BLOOM_BITS, n_hashes=_BLOOM_K)
    ann = tested.join(
        members.withColumn("is_member", F.lit(True)), "k", "left"
    ).select("k", "passed", F.coalesce("is_member", F.lit(False)).alias("is_member"))
    return ann.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.count(F.when(F.col("is_member"), F.lit(1))).alias("n_members"),
        F.count(F.when(F.col("passed"), F.lit(1))).alias("n_passed"),
        F.count(F.when(F.col("passed") & ~F.col("is_member"), F.lit(1))).alias(
            "n_false_positives"
        ),
        F.count(F.when(F.col("is_member") & ~F.col("passed"), F.lit(1))).alias(
            "n_false_negatives"
        ),
    )


@query(
    "sketch_quantile_mergeable",
    oracle="""
SELECT CAST(NULL AS DOUBLE) AS prob, CAST(NULL AS BIGINT) AS target_rank,
       CAST(NULL AS DOUBLE) AS est, CAST(NULL AS BIGINT) AS exact_rank,
       CAST(NULL AS BIGINT) AS bound
WHERE 1 = 0
""",
)
def sketch_quantile_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT north star] Mergeable quantile summary over l_extendedprice
    (operators/sketches.mergeable_quantile_summary): per-partition
    deterministic stride sampling (<= k weighted rows per partition, no
    RNG), concatenation-mergeable, estimates for
    p25/p50/p75/p90/p99 with PROVABLE rank error <= sum_p ceil(n_p/k).
    Registered as an exact empty-violation gate like the ANN recall gates:
    one extra scan re-computes every estimate's exact rank and any
    quantile off by more than 2x the bound becomes an output row; the
    oracle is the empty set."""
    from aws_etl_fiap_spark.operators.sketches import mergeable_quantile_summary

    li = load_table(spark, sf_dir, "lineitem")
    return mergeable_quantile_summary(li, "l_extendedprice", k=256)
