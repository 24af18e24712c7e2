"""Incremental ingest as Structured Streaming (SURVEY.md §2.8).

The reference's daily path (ref dags/mongo_to_postgres_updation.py:34 +
dags/includes/user_table.py:127-177) is: probe S3 for a CSV drop →
download → read → per-row upsert → archive the file. Spark-first:

* ``readStream`` file source watches the drop directory (S3/HDFS/local —
  same code), discovering files instead of HEAD-probing (S3 op).
* ``Trigger.AvailableNow`` gives batch-like "process everything then stop"
  daily runs with streaming bookkeeping.
* ``foreachBatch`` applies the set-based merge (operators/merge.py) per
  micro-batch — idempotent replays via checkpointed batch ids (the
  reference gets idempotency only from upsert semantics).
* ``cleanSource=archive`` replaces the copy/rename/upload/delete task
  (ref erase_copy_daily_tables.py:7-30) with built-in file lifecycle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def run_incremental_merge(
    spark: SparkSession,
    drop_dir: str,
    schema: StructType,
    merge_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    archive_dir: str | None = None,
    fmt: str = "csv",
    max_files_per_trigger: int | None = None,
) -> None:
    """Process all pending files in ``drop_dir`` through ``merge_batch``,
    then stop (Trigger.AvailableNow) — the reference's daily cadence with
    exactly-once-per-batch bookkeeping."""
    reader = (spark.readStream.schema(schema).format(fmt))
    if fmt == "csv":
        reader = reader.option("header", True)
    if archive_dir is not None:
        reader = (reader.option("cleanSource", "archive")
                  .option("sourceArchiveDir", archive_dir))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(drop_dir)

    query = (
        stream.writeStream
        .foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
