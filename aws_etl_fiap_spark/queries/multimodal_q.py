"""Multimodal-column queries ([EXT] north star): binary payload metadata ops
(JVM-side, DuckDB-oracled — sha256/hex/length agree across engines) and the
Arrow-batched feature-extraction path (rows-only: the decode stub is Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.multimodal import (
    attach_payload_metadata,
    documents_as_media,
    extract_features,
)
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table


@query(
    "media_payload_metadata",
    oracle="""
SELECT doc_id AS media_id,
       'fake/text' AS mime,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS digest,
       substr(hex(encode(text)), 1, 16) AS head_hex
FROM documents
""",
)
def media_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata, all JVM-side: byte length, SHA-256 digest,
    head bytes — the dedup/routing columns that let 100 TB of media be
    organized without ever decoding it."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    out = attach_payload_metadata(media)
    return out.select(
        "media_id",
        "mime",
        "n_bytes",
        "digest",
        F.hex(F.substring(F.col("payload"), 1, 8)).alias("head_hex"),
    )


@query(
    "media_dedup_by_digest",
    oracle="""
SELECT sha256(text) AS digest,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS canonical_id
FROM documents
GROUP BY sha256(text)
""",
)
def media_dedup_by_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup on content digest: the shuffle carries 32-byte
    digests, never payloads."""
    media = attach_payload_metadata(documents_as_media(load_table(spark, sf_dir, "documents")))
    return media.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("media_id").alias("canonical_id")
    )


@query("media_extract_features")  # Python decode stub: no SQL oracle
def media_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/featurize via mapInPandas: deterministic fake
    features for fake/* payloads; ok=false rows mark undecodable media
    instead of failing the job. Schema/batching seams tested in
    tests/test_multimodal.py."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media)
