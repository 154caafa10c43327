"""Registry plumbing for the (Spark query, DuckDB oracle) catalog.

Contract (driver's __spark_entry__ protocol):
- each Spark callable takes (spark, sf_dir) and returns a lazy DataFrame;
- the oracle is ANSI SQL DuckDB runs over the same parquet tables, registered
  as views named region/nation/customer/supplier/part/orders/lineitem/events/
  documents/embeddings;
- the comparison is row-count + schema + ORDER-INSENSITIVE value hash, with
  columns sorted BY NAME — so every computed column must carry the same alias
  on both sides;
- entries without an oracle (non-SQL-expressible ops: LSH banding, streaming
  state) get a weaker rows-only check.

Determinism rules every entry must obey (else the hash is meaningless):
- window/LIMIT queries use a TOTAL order (unique tiebreaker columns);
- no current_timestamp/random in compared output;
- double aggregates are rounded on both sides to kill summation-order ulps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query (and optional DuckDB oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(spark=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
