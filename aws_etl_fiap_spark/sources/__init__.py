"""Sources & sinks: parquet readers/writers, catalog DDL, fixture ingestion.

Maps the reference's §2.1 inventory (S1-S11) onto native Spark:

- S1-S3 ingestion  -> ``ingest`` (pluggable fetcher, pandas -> Spark via Arrow)
- S4/S6 sinks      -> ``writers`` (partitioned parquet, dynamic overwrite)
- S5 scan          -> ``readers``
- S7/S8 catalog    -> ``catalog`` (external tables + MSCK REPAIR)
- S9 file trigger  -> ``aws_etl_fiap_spark.streaming.file_trigger``
"""

from aws_etl_fiap_spark.sources.readers import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
