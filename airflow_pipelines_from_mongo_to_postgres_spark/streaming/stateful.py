"""Custom stateful streaming operator: latest-state-per-key (CDC
changelog compaction) via ``applyInPandasWithState``.

This is the streaming generalization of the reference's core semantics —
its daily upsert keeps, per ``_id``, the most recent value of each
mutable column (`dags/includes/user_table.py:154-167`, SURVEY.md §2.6).
As a stream that becomes: maintain per-key state = the row with the max
event time seen so far; each micro-batch emits the keys whose state
changed (Update mode), i.e. a compacted changelog a merge sink can apply
idempotently.

Built on ``applyInPandasWithState`` because no built-in expresses it:
windowed aggs need watermark-bounded windows (this state is unbounded by
design, like a dimension table), and ``dropDuplicates`` keeps the FIRST
arrival, not the latest. State per key is one row (timestamp + payload),
so state size is O(distinct keys) — the same footprint the merge target
table already has.

Scale notes: groups hash-partition across executors; each micro-batch
moves one Arrow batch per partition through the Python worker. The
per-key comparison is a pandas idxmax over the batch's rows for that key
— vectorized, no Python-per-row loop.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StructType


def latest_state_per_key(df: DataFrame, key_col: str, ts_col: str,
                         value_cols: list[str]) -> DataFrame:
    """Row with the max ``ts_col`` per key. Streaming: unbounded per-key
    state via applyInPandasWithState, emitting changed keys each batch.
    Batch: the equivalent argmax (row_number over ts desc) — the oracle-
    checkable parity path. Ties on ts break toward the larger key-ordered
    payload deterministically in batch; streams are assumed tie-free per
    key (event-id-stamped feeds are)."""
    if not df.isStreaming:
        w = Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), *[F.col(c).desc() for c in value_cols])
        return (df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(key_col, ts_col, *value_cols))

    import pandas as pd  # local: only the streaming path needs it
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType([df.schema[key_col], df.schema[ts_col]]
                            + [df.schema[c] for c in value_cols])
    state_schema = StructType([df.schema[ts_col]]
                              + [df.schema[c] for c in value_cols])

    def compact(key: tuple, pdfs: Iterator["pd.DataFrame"],
                state: GroupState) -> Iterator["pd.DataFrame"]:
        best = tuple(state.get) if state.exists else None
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            row = pdf.loc[pdf[ts_col].idxmax()]
            cand = (row[ts_col], *(row[c] for c in value_cols))
            if best is None or cand[0] > best[0]:
                best, changed = cand, True
        if changed:
            state.update(best)
            yield pd.DataFrame([{key_col: key[0], ts_col: best[0],
                                 **dict(zip(value_cols, best[1:]))}])

    return df.groupBy(key_col).applyInPandasWithState(
        compact, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)
