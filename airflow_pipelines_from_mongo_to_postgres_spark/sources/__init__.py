from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
)

__all__ = ["TABLES", "load_table", "load_tables"]
