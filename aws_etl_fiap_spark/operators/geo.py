"""Spatial blocking operators ([EXT]: fixed-radius near-neighbor search on
a planar coordinate space — the grid-cell/geohash blocking pattern every
spatial join at scale reduces to).

Reference parity: the reference engine has no spatial operator; this is
part of the demanded large-scale-pipeline surface (same bucket as dedup
blocking — a radius join IS a dedup blocking join in coordinate space).

Parity discipline: coordinates synthesize from the portable 60-bit md5
hash (operators/dedup.portable_hash60 — re-derivable in DuckDB), so both
engines see bit-identical doubles (`integer / 1000.0` is one correctly
rounded IEEE divide); squared distances are pure IEEE subtract/multiply/
add on identical inputs, so the radius comparison — and therefore the
exact PAIR SET — is cross-engine deterministic with no trig in sight
(sin/cos are libm-dependent and would break exact hashing; a planar
equirectangular frame sidesteps that honestly).

Scale shape: each point lands in one ``cell = (floor(x/r), floor(y/r))``;
the LEFT side explodes into its 3x3 cell neighborhood (a fixed x9 fanout,
no data-dependent blowup) and equi-joins the RIGHT side's home cell, so
the shuffle keys on cell ids and every candidate pair is cell-local —
never an all-pairs cross join.  Skewed cells (hot spots) split further
under AQE like any skewed shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.dedup import portable_hash60

#: Side length of the synthetic plane, km.  1e6 exact milli-km positions.
PLANE_KM = 1000.0


def synth_points(df: DataFrame, key_col: str) -> DataFrame:
    """Deterministic planar points from a key column: the portable md5
    hash splits into two base-1e6 digits -> (x, y) in [0, 1000) km with
    exact 3-decimal positions (``m / 1000.0``, one IEEE divide)."""
    hashed = df.select(
        F.col(key_col).alias("id"),
        portable_hash60(F.col(key_col).cast("string")).alias("h"),
    )
    # `div` is exact integral division (h is ~2^60: double division would
    # round the low bits and disagree with DuckDB's integer `//`).
    return hashed.select(
        "id",
        ((F.col("h") % F.lit(1000000)).cast("double") / 1000.0).alias("x"),
        ((F.expr("h div 1000000") % F.lit(1000000)).cast("double") / 1000.0).alias(
            "y"
        ),
    )


def grid_radius_pairs(points: DataFrame, radius_km: float) -> DataFrame:
    """All unordered point pairs within ``radius_km`` (Euclidean, planar):
    grid-cell blocking join + exact squared-distance filter.

    ``a`` explodes into the 3x3 neighborhood of its home cell and joins
    ``b``'s home cell, so a pair meets exactly once per b-cell (cells
    partition the plane — dedup-free by construction); ``id_a < id_b``
    keeps one orientation.  Output: (id_a, id_b, dist_sq).
    """
    r = float(radius_km)
    cell_x = F.floor(F.col("x") / r)
    cell_y = F.floor(F.col("y") / r)
    home = points.select(
        "id", "x", "y", cell_x.alias("cx"), cell_y.alias("cy")
    )
    offsets = F.array(*[F.lit(d).cast("long") for d in (-1, 0, 1)])
    probe = (
        home.select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            "cx",
            "cy",
            F.explode(offsets).alias("dx"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("cx") + F.col("dx")).alias("cx"),
            "cy",
            F.explode(offsets).alias("dy"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            "cx",
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    build = home.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dsq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (dsq <= F.lit(r * r)))
        .select("id_a", "id_b", dsq.alias("dist_sq"))
    )
