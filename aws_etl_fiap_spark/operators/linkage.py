"""Record linkage / entity resolution primitives.

The scale discipline mirrors the fuzzy-dedup tier (operators/dedup.py): an
all-pairs string comparison over n entities is n²/2 edit-distance calls — a
non-starter at corpus scale — so candidate generation is BLOCKED: entities
only pair inside a cheap deterministic blocking key, bounding the candidate
space to Σ|block|² (the classic Fellegi-Sunter blocking step).  Reference
parity: the reference engine has no linkage surface; this is part of the
[EXT] training-data-pipeline tier (SURVEY.md §2 addendum).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    name_col: str,
    block_fn: Callable[[Column], Column],
    max_dist: int,
) -> DataFrame:
    """Blocked fuzzy entity matching: collapse rows to DISTINCT entity
    names with support counts, self-join within the blocking key, keep
    pairs with ``levenshtein(a, b) <= max_dist``.

    Two-stage shape for 100 TB:

    1. ``groupBy(name)`` first — the expensive quadratic stage then runs on
       the *vocabulary* (distinct names), not the row count; support counts
       ride along so no second pass over the data is needed.
    2. The self-join key is the blocking expression, so the shuffle is one
       exchange of the (tiny) name vocabulary and the edit-distance UDF
       never sees a candidate outside its block.  A skewed block (one giant
       key) is the same hazard as a hot join key — AQE skew splitting or a
       finer blocking function are the standard remedies.

    Output: ``(name_a, name_b, dist, n_a, n_b)`` with ``name_a < name_b``
    — each surviving pair is an edge in the entity-merge graph (feed to
    :func:`aws_etl_fiap_spark.operators.graph.connected_components` to get
    canonical entities).
    """
    names = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", block_fn(F.col("name")))
        .localCheckpoint(eager=False)
    )
    a = names.withColumnsRenamed({"name": "name_a", "n": "n_a"}).alias("__la")
    b = names.withColumnsRenamed({"name": "name_b", "n": "n_b"}).alias("__lb")
    return (
        a.join(
            b,
            (F.col("__la.blk") == F.col("__lb.blk"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )
