"""Partitioned parquet sinks (reference S4/S6: b3_collector.py:179,
b3_transform.py:309-312).

The reference writes ``mode("overwrite")`` which wipes EVERY partition of the
table on each daily run; with the session default
``partitionOverwriteMode=dynamic`` (session.py) the same call replaces only
the partitions present in the incoming frame — the semantics a daily
append-by-partition pipeline actually wants, and the only sane behavior when
the table holds 100 TB and today's delta is 100 GB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Write a partitioned snappy-parquet table.

    ``target_file_rows``: optional small-files guard — repartition by the
    partition columns before writing so each Hive partition is produced by
    few tasks instead of every task emitting a sliver into every partition
    (the classic 100 TB small-files failure: tasks x partitions files).
    """
    if partition_by and target_file_rows:
        df = df.repartition(*partition_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Round-trip scan (reference S5); partition columns come back from the
    directory layout."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (+ optionally sorted) parquet table into the catalog.

    Bucketing is THE co-located-join tool at 100 TB: two tables bucketed by
    the same key into the same bucket count join with ZERO exchange — each
    task reads bucket i from both sides. Sorting within buckets additionally
    removes the sort before a sort-merge join. The price is paid once at
    write time; every subsequent join/aggregation on the bucket key rides
    free. (Bucketed tables must go through the catalog — ``saveAsTable`` —
    because bucket metadata lives there, not in the directory layout.)
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
