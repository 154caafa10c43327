"""Vector similarity search over embedding columns ([EXT] north star).

Embeddings are ``array<float>`` (dim=64). All math is done in DOUBLE via
higher-order expressions — a sequential left fold, which DuckDB's
``list_dot_product`` matches bit-for-bit, so even cosine values are
oracle-exact. No UDFs anywhere: the hot path is whole-stage-codegen JVM code.

Scale design:
- ``brute_force_topk``: queries broadcast against the corpus; per-partition
  top-k via window row_number (TakeOrdered shape). Cost O(|Q| * |corpus|) —
  the right baseline, and the right answer when |Q| is small.
- ``lsh_bucket_topk``: sign-random-projection (SimHash-style) bucketing —
  deterministic pseudo-random hyperplanes derived from xxhash64, vectors
  compared only within matching buckets: the 100 TB path where the corpus
  cross-product is impossible. Recall < 1 by construction (probe multiple
  bands to trade cost for recall).
- ``label_centroids``: per-label mean vector computed with an ORDERED running
  sum (order by vec_id) so the float sum is reproducible bit-for-bit on any
  engine/partitioning — unordered float SUM is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product exactly)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).

    Output: query_id, neighbor_id, cos_sim, rank. The query side is
    broadcast — the corpus never shuffles for the join; the only exchange is
    the per-query top-k window, whose input is already reduced to
    |Q| * |corpus| scored pairs filtered per partition.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean of each dimension, as (label, dim, centroid) rows.

    The sum runs as a window running-sum ordered by ``id_col`` and takes the
    last value — a defined left-fold order, so the float result is identical
    across engines and partitionings (plain SUM(double) is order-dependent).
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("__id"),
        F.posexplode(as_double(vec_col)).alias("dim", "__x"),
    )
    w = (
        Window.partitionBy("label", "dim")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = exploded.select(
        "label",
        "dim",
        F.sum("__x").over(w).alias("__runsum"),
        F.count(F.lit(1)).over(w).alias("__n"),
        F.row_number()
        .over(Window.partitionBy("label", "dim").orderBy(F.col("__id").desc()))
        .alias("__rn"),
    )
    return running.filter(F.col("__rn") == 1).select(
        "label", "dim", (F.col("__runsum") / F.col("__n")).alias("centroid")
    )


N_TABLES = 8
N_PLANES = 4


def _plane_sign(dim_idx: Column, table: int, plane: int) -> Column:
    """Deterministic ±1 from xxhash64(table, plane, dim): the pseudo-random
    hyperplane entries, reproducible on every executor with no state."""
    return F.when(
        F.pmod(F.xxhash64(F.lit(table), F.lit(plane), dim_idx), F.lit(2)) == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def srp_signature(vec: Column, table: int, n_planes: int = N_PLANES) -> Column:
    """Sign-random-projection bucket for one hash table: bit p =
    sign(v . plane_{table,p}), packed into a long. Expression-only (no UDF),
    O(dim * n_planes) per row."""
    def projection(plane: int) -> Column:
        # Closure per plane: PySpark HOF lambdas must take exactly the
        # declared arity (no defaulted capture args).
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x * _plane_sign(i, table, plane),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + F.when(projection(p) >= 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def _with_buckets(df: DataFrame, vec: str, n_tables: int, n_planes: int) -> DataFrame:
    """Explode each vector into (table_id, bucket) rows — L independent hash
    tables; a candidate matches if it shares a bucket in ANY table."""
    pairs = [
        x
        for t in range(n_tables)
        for x in (F.lit(t), srp_signature(F.col(vec), t, n_planes))
    ]
    return df.select("*", F.stack(F.lit(n_tables), *pairs).alias("table_id", "bucket"))


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing an SRP bucket with the
    query in at least one of ``n_tables`` hash tables (classic multi-table
    LSH: more tables -> higher recall, proportionally more candidates).

    At 100 TB the bucket join replaces the cross product: the corpus is
    hashed once (linear scan), the equi-join on (table, bucket) shuffles by
    bucket, and scoring happens within collisions only. ``distinct`` on the
    candidate pair set keeps a vector found in several tables scored once."""
    q = _with_buckets(
        queries.select(F.col(query_id).alias("query_id"), as_double(vec_col).alias("__qv")),
        "__qv",
        n_tables,
        n_planes,
    )
    c = _with_buckets(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), as_double(vec_col).alias("__cv")),
        "__cv",
        n_tables,
        n_planes,
    )
    candidates = (
        c.join(F.broadcast(q.select("query_id", "table_id", "bucket")), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__cv")
        .distinct()
    )
    scored = candidates.join(
        F.broadcast(q.select("query_id", "__qv").distinct()), "query_id"
    ).withColumn("cos_sim", cosine(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
