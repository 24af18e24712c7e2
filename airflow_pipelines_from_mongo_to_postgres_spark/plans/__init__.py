"""Named query plans exposed through ``__spark_entry__``.

Each module exports ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> ANSI SQL str]`` (DuckDB-runnable on the same
parquet views). Names must agree; computed columns are aliased identically
on both sides (the driver hash-compares by sorted column name).
"""

from airflow_pipelines_from_mongo_to_postgres_spark.plans import (
    llmdata,
    mergeops,
    relational,
    streamsql,
    temporal,
)

ALL_PLAN_MODULES = [relational, mergeops, llmdata, streamsql, temporal]


def all_queries():
    out = {}
    for m in ALL_PLAN_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in ALL_PLAN_MODULES:
        out.update(m.ORACLES)
    return out
