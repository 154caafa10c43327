"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``aws_etl_fiap_spark`` package; this module only
adapts its query registry to the driver protocol.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_etl_fiap_spark.queries import oracle_sql as _oracle_sql
from aws_etl_fiap_spark.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's whole EP2
    refined pipeline (filter -> date parts -> rename -> lag pct-change ->
    monthly summary) re-keyed onto lineitem."""
    from aws_etl_fiap_spark.queries.core import flagship_refined_summary

    return flagship_refined_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ [EXT])."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    return _oracle_sql()
