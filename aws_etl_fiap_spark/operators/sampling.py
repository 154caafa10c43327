"""Deterministic corpus sampling ([EXT]): hash-bucket inclusion, the
reproducible alternative to rand()-based sampling.

Why not df.sample(): at 100 TB a training-data sample must be (a) exactly
re-derivable months later (rand seeds don't survive partitioning changes;
hash-of-key does), (b) stable under re-runs and engine changes, and (c)
consistent ACROSS tables (the same key always lands in the same bucket, so
joined tables sample coherently). Hash-mod sampling gives all three.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
