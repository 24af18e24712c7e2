"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL system
(glinisdev/airflow-pipelines-from-mongo-to-postgres), re-expressed Spark-first.

Subpackages
-----------
sources/    declarative readers (parquet / csv / json / jdbc) + schemas
functions/  column-expression families: conform (flatten/defaults), text, vectors
operators/  composite DataFrame operators: merge, keygen, dedup, similarity
plans/      named query plans exposed through ``__spark_entry__.queries()``
streaming/  Structured Streaming incremental path (file-drop micro-batch, windows)

Design stance (SURVEY.md §7): everything is declared with the DataFrame API so
Catalyst handles pruning/pushdown/join strategy; no driver-side row loops; no
row-at-a-time UDFs in hot paths.
"""

from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
