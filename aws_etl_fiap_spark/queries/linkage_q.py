"""Entity-resolution queries ([EXT] record-linkage tier).

Spark's ``levenshtein`` and DuckDB's ``levenshtein`` both implement the
classic (unit-cost insert/delete/substitute) edit distance, so the match
predicate itself is oracle-exact — no portable re-implementation needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table


@query(
    "er_blocked_part_names",
    oracle="""
WITH names AS (
    SELECT p_name AS name, COUNT(*) AS n FROM part GROUP BY p_name
),
blocked AS (
    SELECT name, n, split_part(name, ' ', 2) AS blk FROM names
)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS dist,
       a.n AS n_a, b.n AS n_b
FROM blocked a
JOIN blocked b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
""",
)
def er_blocked_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Blocked fuzzy entity matching over part names
    (operators/linkage.blocked_levenshtein_pairs): distinct names with
    support counts, blocked on the head noun (second token), levenshtein
    <= 3 within a block.  The quadratic stage runs on the name VOCABULARY,
    never the row count — the Fellegi-Sunter blocking discipline that keeps
    record linkage feasible at catalog scale."""
    from aws_etl_fiap_spark.operators.linkage import blocked_levenshtein_pairs

    parts = load_table(spark, sf_dir, "part")
    return blocked_levenshtein_pairs(
        parts, "p_name", lambda name: F.split(name, " ")[1], max_dist=3
    )
