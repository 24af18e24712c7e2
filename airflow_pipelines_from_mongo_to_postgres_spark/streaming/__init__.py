from airflow_pipelines_from_mongo_to_postgres_spark.streaming.dedup import (
    dedup_exact_stream,
    dedup_within_watermark,
)
from airflow_pipelines_from_mongo_to_postgres_spark.streaming.incremental import (
    date_stamped_name,
    run_incremental_merge,
    stamp_archived_files,
)
from airflow_pipelines_from_mongo_to_postgres_spark.streaming.joins import (
    enrich_with_dimension,
    interval_join_streams,
)
from airflow_pipelines_from_mongo_to_postgres_spark.streaming.stateful import (
    latest_state_per_key,
)
from airflow_pipelines_from_mongo_to_postgres_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = ["run_incremental_merge", "tumbling_counts", "sliding_counts",
           "session_counts", "dedup_within_watermark", "dedup_exact_stream",
           "latest_state_per_key", "stamp_archived_files", "date_stamped_name",
           "enrich_with_dimension", "interval_join_streams"]
