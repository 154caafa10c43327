"""End-to-end pipeline driver: the reference's EventBridge -> Glue collector
-> S3 raw/ -> Lambda -> Glue transform -> S3 refined/ -> Athena chain
(SURVEY.md §3, EP1->EP2->EP3) as one in-process Spark program.

Stage boundaries stay identical (raw parquet layer, refined parquet layer,
catalog tables, SQL surface) — what disappears is the control-plane glue:
direct chaining replaces the S3-event+Lambda hop (S9; the streaming module
offers the file-trigger variant when stages genuinely decouple).

The medallion layout (raw/ refined/ — plus interim/ final/ in the
reference's Terraform, infra/s3/providers.tf:10-18) maps to subdirectories
of one warehouse root.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from aws_etl_fiap_spark.plans.refined import SeriesSpec, refined_detail, refined_summary
from aws_etl_fiap_spark.sources.catalog import register_table
from aws_etl_fiap_spark.sources.ingest import Fetcher, collect_keys, fixture_fetcher
from aws_etl_fiap_spark.sources.writers import write_partitioned

STOCKS_SPEC = SeriesSpec(key="ticker", time="date", price="close", volume="volume")


@dataclass
class PipelineResult:
    raw_path: str
    refined_path: str
    raw_count: int
    refined_count: int
    summary: DataFrame


def run_pipeline(
    spark: SparkSession,
    warehouse: str,
    keys: list[str],
    fetcher: Fetcher = fixture_fetcher,
    database: str = "b3_data",
) -> PipelineResult:
    """EP1 + EP2 + catalog registration.

    1. collect (distributed fetch) -> raw/ parquet partitioned by dataproc,
       catalog table ``{database}.stocks``            [reference EP1]
    2. raw/ -> refined detail (null-filter, date parts, renames, lag
       pct-change) -> refined/ parquet partitioned by (dataproc, ticker),
       catalog table ``{database}.stocks_refined``    [reference EP2]
    3. monthly summary returned lazily (EP3 queries it via SQL).

    Unlike the reference (>=9 actions over uncached lineage), each layer is
    materialized exactly once: write, then read the written files back for
    the next stage — the parquet layer IS the cache.
    """
    raw_path = os.path.join(warehouse, "raw")
    refined_path = os.path.join(warehouse, "refined")

    # EP1: collect -> raw layer.
    raw = collect_keys(spark, keys, fetcher)
    write_partitioned(raw, raw_path, ["dataproc"], target_file_rows=100_000)
    raw_back = spark.read.parquet(raw_path)
    raw_count = raw_back.count()
    register_table(spark, raw_back, database, "stocks", raw_path, ["dataproc"])

    # EP2: raw -> refined layer (reading the materialized raw files, like the
    # reference's second job scanning raw/, b3_transform.py:241). The
    # dataproc partition column rides through to the 2-level refined layout.
    detail = refined_detail(raw_back, STOCKS_SPEC, extra_cols=("dataproc",))
    write_partitioned(detail, refined_path, ["dataproc", "ticker"], target_file_rows=100_000)
    refined_back = spark.read.parquet(refined_path)
    refined_count = refined_back.count()
    register_table(
        spark, refined_back, database, "stocks_refined", refined_path, ["dataproc", "ticker"]
    )

    # EP3 input: the canonical Athena-style summary over the refined layer.
    summary = refined_summary(raw_back, STOCKS_SPEC)
    return PipelineResult(raw_path, refined_path, raw_count, refined_count, summary)
