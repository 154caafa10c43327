"""aws_etl_fiap_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(hgribeiro/aws-etl-fiap: yfinance -> Glue -> S3 parquet -> Athena) as an
idiomatic, standalone PySpark engine, and extends it with the operators a
large-scale (100 TB) LLM-training-data pipeline needs: dedup, similarity
search, text analysis, multimodal column plumbing, and event-stream windows.

Layout
------
- ``session``     : SparkSession factory with scale-ready defaults (AQE, Arrow,
                    snappy parquet, dynamic partition overwrite).
- ``sources``     : readers/writers/catalog — partitioned parquet sinks, external
                    tables, MSCK repair, fixture ingestion (reference §2.1 S1-S11).
- ``operators``   : pure ``DataFrame -> DataFrame`` transforms mirroring the
                    reference's operator inventory (SURVEY.md §2) plus [EXT]
                    joins, set ops, windows, dedup, similarity, text, events.
- ``plans``       : end-to-end pipeline drivers (collect -> raw -> refined ->
                    catalog) replacing EventBridge/Lambda orchestration.
- ``streaming``   : Structured Streaming equivalents of the S3-event trigger and
                    the event-window operators.
- ``functions``   : scalar/array expression helpers shared by operators.
- ``queries``     : the registry of (spark query, duckdb oracle SQL) pairs that
                    backs ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
