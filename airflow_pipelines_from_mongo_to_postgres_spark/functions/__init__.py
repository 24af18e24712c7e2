from airflow_pipelines_from_mongo_to_postgres_spark.functions import conform, text, vectors

__all__ = ["conform", "text", "vectors"]
