"""Spatial blocking-join query ([EXT]: fixed-radius near-neighbor pairs
via grid-cell blocking — operators/geo.py holds the scale argument and the
no-trig parity discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table


@query(
    "geo_radius_pairs_customers",
    oracle="""
WITH pts AS (
    SELECT id,
           CAST(h % 1000000 AS DOUBLE) / 1000.0 AS x,
           CAST((h // 1000000) % 1000000 AS DOUBLE) / 1000.0 AS y
    FROM (
        SELECT c_custkey AS id,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM customer
    )
)
SELECT a.id AS id_a, b.id AS id_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= CAST(25.0 AS DOUBLE)
""",
)
def geo_radius_pairs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT §2.3 spatial] All customer pairs within 5 km on the synthetic
    planar frame (operators/geo.grid_radius_pairs): portable-md5 planar
    coordinates (bit-identical doubles in both engines, no libm trig),
    3x3 grid-cell blocking join keyed on cell ids — cell-local candidates
    only, never an all-pairs cross join — and the exact IEEE
    squared-distance filter.  The DuckDB oracle brute-forces the O(n^2)
    truth, so the driver hash verifies the blocking join finds EXACTLY the
    full pair set (a missed boundary cell would show up as a lost pair)."""
    from aws_etl_fiap_spark.operators.geo import grid_radius_pairs, synth_points

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    pts = synth_points(cust, "c_custkey")
    return grid_radius_pairs(pts, radius_km=5.0)
