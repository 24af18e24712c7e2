"""Event-time windowed aggregation with watermarks — the streaming form of
plans/streamsql.py (same logical results; readStream + late-data handling).

Watermarking bounds the state store: at 100 TB/day the per-window state is
dropped ``delay`` after the window closes instead of growing unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type", width: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts/sums. Works on both batch and streaming
    DataFrames (watermark is a no-op in batch mode)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), width).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("events"),
             F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                key_col, "events", "total_value")
    )


def session_counts(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "user_id", gap: str = "10 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    """Session windows keyed on inactivity gap. In streaming mode the
    watermark lets Spark finalize (and drop state for) sessions whose gap
    has provably expired — without it session state grows forever."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                    F.col(key_col))
        .agg(F.count(F.lit(1)).alias("events"),
             F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                key_col, "events", "total_value")
    )


def sliding_counts(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "event_type", width: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), width, slide).alias("w"),
                    F.col(key_col))
        .agg(F.count(F.lit(1)).alias("events"),
             F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), key_col,
                "events", "avg_value")
    )
