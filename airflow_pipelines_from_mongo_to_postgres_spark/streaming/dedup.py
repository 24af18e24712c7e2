"""Streaming deduplication — the training-data dedup family's streaming
form (batch family: operators/dedup.py).

Two bounded-state strategies:

* ``dedup_within_watermark``: drop re-arrivals of the same key while its
  event time is within the watermark. State holds only keys younger than
  the delay — the streaming analog of exact dedup, with state O(keys per
  watermark window) instead of O(all keys ever).
* ``dedup_exact_stream``: exact content dedup on the md5 fingerprint of
  normalized text, composed with the same watermark bound. A re-posted
  document (retries, crawler revisits) is emitted once per watermark
  period no matter how often it arrives.

The reference has no streams (SURVEY.md §2.8); its idempotent-upsert daily
batch is the closest analog, and ``streaming/incremental.py`` covers that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import text as T


def dedup_within_watermark(events: DataFrame, key_cols: list[str],
                           ts_col: str = "ts",
                           watermark: str = "10 minutes") -> DataFrame:
    """First arrival per key within the watermark horizon. In batch mode
    falls back to plain dropDuplicates on the keys (the watermark-bounded
    operator is streaming-only by definition)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def dedup_exact_stream(docs: DataFrame, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "10 minutes") -> DataFrame:
    """Content-level streaming dedup: fingerprint the normalized text
    (functions/text.py::fingerprint — md5, engine-portable) and keep the
    first arrival per fingerprint within the watermark horizon."""
    with_fp = docs.withColumn("_fp", T.fingerprint(text_col))
    return dedup_within_watermark(with_fp, ["_fp"], ts_col, watermark) \
        .drop("_fp")
