"""Multimodal plumbing: binary payload columns through mapInPandas."""

from __future__ import annotations

from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
    attach_payload,
    extract_media_features,
)
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table


def test_extract_features_stub(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    media = attach_payload(docs, "text")
    feats = extract_media_features(media, "doc_id", "payload")
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.payload_bytes > 0 for r in rows)
    assert all(16 <= r.width < 80 for r in rows)  # stub decoder bounds
    assert all(r.format == "stub" for r in rows)


def test_custom_decoder_and_empty_payload(spark):
    df = spark.createDataFrame([("a", b""), ("b", b"xyz")], ["mid", "payload"])
    feats = extract_media_features(df, "mid", "payload",
                                   decoder=lambda b: {"width": len(b),
                                                      "height": 1,
                                                      "format": "len"}
                                   if b else (_ for _ in ()).throw(NotImplementedError()))
    rows = {r.media_id: r for r in feats.collect()}
    assert rows["a"].width is None      # stubbed decode failure → null features
    assert rows["a"].payload_bytes == 0
    assert rows["b"].width == 3 and rows["b"].format == "len"
