"""ML-feature-engineering operators ([EXT]: the feature-store layer of a
training-data pipeline — leakage-free point-in-time joins and the
hashing-trick featurizer — alongside the sampling/dedup/text curation ops).

Scale design:

- The point-in-time join is the UNION + running-last trick (same family
  as joins.asof_join and the attribution lookup): one shuffle of
  features+labels on the entity key, no per-label probe join, no range
  cross product.  Strictness (feature_ts < label_ts, never ==) is encoded
  in the sort key, not a post-filter, so same-instant leakage is
  impossible by construction.
- Feature hashing emits the TALL (id, dim, weight) layout: expression-only
  (split -> explode -> portable hash -> aggregate), map-side combinable,
  and joinable/pivotable downstream; the fixed ``n_dims`` bounds state no
  matter how large the vocabulary grows (the entire point of the hashing
  trick at 100 TB: no vocabulary build, no dictionary broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.dedup import portable_hash60


def point_in_time_join(
    features: DataFrame,
    labels: DataFrame,
    key: str,
    ts_col: str,
    feature_vals: list[str],
    label_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """For each label row, attach the latest feature row of the same key
    with ``feature_ts`` STRICTLY BEFORE the label's ``ts_col`` — the
    point-in-time-correct (leakage-free) feature lookup every supervised
    training set needs.

    Requirements: (key, ts_col) unique within ``features``; ``tiebreak``
    non-null on labels (it totals the label order; features sort after
    same-instant labels via the kind flag, which is what enforces strict
    precedence).  Labels with no qualifying feature keep NULL features
    (cold start) rather than being dropped.
    """
    f = features.select(
        F.col(key),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__kind"),  # labels (0) sort first at equal ts
        F.lit(-1).cast("long").alias("__tb"),
        F.struct(F.col(ts_col).alias("feature_ts"), *[F.col(c) for c in feature_vals]).alias(
            "__fv"
        ),
        *[F.lit(None).cast(labels.schema[c].dataType).alias(c) for c in label_cols],
    )
    l = labels.select(
        F.col(key),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__kind"),
        F.col(tiebreak).cast("long").alias("__tb"),
        F.lit(None)
        .cast(f.schema["__fv"].dataType)
        .alias("__fv"),
        *[F.col(c) for c in label_cols],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__kind", "__tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        f.unionByName(l)
        .withColumn("__last", F.last("__fv", ignorenulls=True).over(w))
        .filter(F.col("__kind") == 0)
        .select(
            key,
            F.col("__ts").alias(ts_col),
            *label_cols,
            F.col("__last.feature_ts").alias("feature_ts"),
            *[F.col(f"__last.{c}").alias(c) for c in feature_vals],
        )
    )


def feature_hashing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_dims: int = 64,
    salt: str = "feat",
) -> DataFrame:
    """Hashing-trick featurization: whitespace tokens hash into ``n_dims``
    buckets with a +/-1 sign from an independent hash bit (the signed
    construction that makes collisions cancel in expectation); output is
    the tall (id, dim, weight) frame with integer weights.

    Portable md5 hashing throughout, so the exact feature values are
    re-derivable in any engine (DuckDB twin in the registered oracle).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    dim = F.pmod(portable_hash60(F.lit(f"{salt}-dim"), F.col("tok")), F.lit(n_dims))
    sign = 1 - 2 * F.pmod(
        portable_hash60(F.lit(f"{salt}-sign"), F.col("tok")), F.lit(2)
    )
    return (
        toks.select(F.col(id_col), dim.alias("dim"), sign.alias("sign"))
        .groupBy(id_col, "dim")
        .agg(F.sum("sign").alias("weight"))
    )
