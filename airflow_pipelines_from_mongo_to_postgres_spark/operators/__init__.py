from airflow_pipelines_from_mongo_to_postgres_spark.operators.keygen import assign_surrogate_keys
from airflow_pipelines_from_mongo_to_postgres_spark.operators.merge import (
    insert_if_absent,
    merge_upsert,
)

__all__ = ["assign_surrogate_keys", "insert_if_absent", "merge_upsert"]
