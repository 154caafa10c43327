"""Multimodal plumbing tests: binary payload round-trip, Arrow-batched
feature extraction, per-row decode-failure degradation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload_metadata,
    decode_stub,
    documents_as_media,
    extract_features,
)
from aws_etl_fiap_spark.sources.readers import load_table


def test_payload_metadata_matches_python(spark, sf_smoke):
    media = attach_payload_metadata(documents_as_media(load_table(spark, sf_smoke, "documents")))
    row = media.orderBy("media_id").first()
    raw = load_table(spark, sf_smoke, "documents").orderBy("doc_id").first()
    payload = raw.text.encode()
    assert bytes(row.payload) == payload
    assert row.n_bytes == len(payload)
    assert row.digest == hashlib.sha256(payload).hexdigest()


def test_feature_extraction_deterministic(spark, sf_smoke):
    media = documents_as_media(load_table(spark, sf_smoke, "documents"))
    feats = extract_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert all(r.ok for r in rows.values())
    assert all(len(r.feature) == FEATURE_DIM for r in rows.values())
    raw = {r.doc_id: r.text for r in load_table(spark, sf_smoke, "documents").collect()}
    for mid in list(rows)[:5]:
        assert rows[mid].feature == decode_stub("fake/text", raw[mid].encode())
    # Re-run under a different partitioning: identical features.
    feats2 = {r.media_id: r.feature for r in extract_features(media.repartition(13)).collect()}
    assert feats2 == {m: r.feature for m, r in rows.items()}


def test_undecodable_media_degrades_not_fails(spark):
    df = spark.createDataFrame(
        [(1, "fake/text", b"hello"), (2, "image/png", b"\x89PNG"), (3, "audio/wav", b"RIFF")],
        "media_id bigint, mime string, payload binary",
    )
    rows = {r.media_id: r for r in extract_features(df).collect()}
    assert rows[1].ok and len(rows[1].feature) == FEATURE_DIM
    assert not rows[2].ok and rows[2].feature is None
    assert not rows[3].ok and rows[3].feature is None
