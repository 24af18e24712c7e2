"""Streaming joins — the two shapes a micro-batch ingest pipeline needs:

* stream-static enrichment (fact stream ⋈ dimension snapshot): the static
  side re-resolves per micro-batch, so a slowly-refreshed dimension table
  is picked up without restarting the query; broadcast keeps the stream
  side shuffle-free.
* stream-stream interval join (e.g. purchases within N minutes of a
  signup): BOTH sides carry watermarks and the join condition bounds
  event-time distance, so Spark can expire buffered state — without the
  time bound, stream-stream state grows forever (the 100 TB/day failure
  mode).

Both work unchanged on batch DataFrames (watermarks are no-ops), which is
what the parity tests exploit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_with_dimension(stream: DataFrame, dim: DataFrame,
                          keys: list[str], how: str = "left") -> DataFrame:
    """Stream-static join: attach dimension attributes to each stream row.
    The dimension is broadcast (dimension-sized by definition); Spark
    re-plans the static side each micro-batch, so an updated snapshot
    (e.g. a daily-refreshed parquet dir) is picked up live."""
    return stream.join(F.broadcast(dim), keys, how)


def interval_join_streams(left: DataFrame, right: DataFrame, key: str,
                          left_ts: str, right_ts: str,
                          within: str = "10 minutes") -> DataFrame:
    """Watermarked stream-stream join: pair each left event with right
    events for the same key whose timestamp lands in
    ``(left_ts, left_ts + within]``. The event-time bound plus the two
    watermarks let Spark drop buffered rows once they can no longer match
    — state stays proportional to ``within``, not to the stream length.
    Right-side columns come back ``r_``-prefixed (self-join lineage safe).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, within)
    if right.isStreaming:
        right = right.withWatermark(right_ts, within)
    r = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") > F.col(left_ts))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return left.join(r, cond)
