"""Blocked record-linkage semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.linkage import blocked_levenshtein_pairs


def test_blocked_matches_respect_block_and_distance(spark):
    rows = [
        ("red bolt",), ("red bolt",), ("rad bolt",),  # dist 1, same block
        ("red gear",),                                # close to 'red bolt' but other block
        ("azure bolt",),                              # same block, dist > 3 from 'red bolt'
    ]
    df = spark.createDataFrame(rows, "p_name string")
    got = {
        (r.name_a, r.name_b): (r.dist, r.n_a, r.n_b)
        for r in blocked_levenshtein_pairs(
            df, "p_name", lambda n: F.split(n, " ")[1], max_dist=3
        ).collect()
    }
    # the dist-1 pair matches, with support counts from the pre-aggregation
    assert got == {("rad bolt", "red bolt"): (1, 1, 2)}


def test_blocking_bounds_candidates(spark):
    """No cross-block comparison happens: with a degenerate 1-name-per-block
    key the result is empty even for identical-distance names."""
    df = spark.createDataFrame([("a x",), ("a y",), ("a z",)], "p_name string")
    out = blocked_levenshtein_pairs(
        df, "p_name", lambda n: F.split(n, " ")[1], max_dist=5
    )
    assert out.count() == 0
