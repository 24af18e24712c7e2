"""Live-source connectors: MongoDB collection scans and JDBC tables.

The reference reads 13 MongoDB collections with hand-written aggregation
pipelines (ref dags/includes/user_table.py:19-53) and writes Postgres row
by row. Spark-first, both become DataFrame connectors:

* MongoDB → ``spark.read.format("mongodb")`` (the official Spark
  connector). Catalyst pushes column pruning / predicates to the server
  the same way the reference's hand-built ``$project``/``$match`` stages
  did — declared once in the entity spec instead of three times.
* Postgres → ``spark.read/write.format("jdbc")`` with partitioned reads
  and batched writes; merge semantics live in ``sinks.jdbc_merge``.

Neither driver jar ships in this container, so each builder returns the
(format, options) pair and ``load``/``save`` is a one-liner on top —
the option construction is unit-testable without the jars, and the same
dicts drop straight into a real cluster's reader.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

MONGO_FORMAT = "mongodb"
JDBC_FORMAT = "jdbc"


def mongo_read_options(uri: str, database: str, collection: str,
                       pipeline: Sequence[dict[str, Any]] | None = None,
                       read_preference: str = "secondaryPreferred") -> dict[str, str]:
    """Options for the official MongoDB Spark connector.

    ``pipeline`` is a list of aggregation stages executed server-side
    BEFORE Spark sees the data — the home for ``$match``/``$unwind``
    stages the reference embeds per collection
    (ref dags/includes/loanapplication_table.py:26-49). Plain projections
    and filters don't need it: the connector translates Catalyst pushdown
    into ``$project``/``$match`` automatically.
    """
    import json

    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "readPreference.name": read_preference,
        # partition by _id ranges so a 10^9-doc collection scans in
        # parallel instead of through one cursor (the reference's
        # list(aggregate(...)) pulls everything through one client).
        "partitioner": "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
    }
    if pipeline:
        opts["aggregation.pipeline"] = json.dumps(list(pipeline))
    return opts


def read_mongo(spark: SparkSession, schema: StructType, uri: str,
               database: str, collection: str,
               pipeline: Sequence[dict[str, Any]] | None = None) -> DataFrame:
    """Collection scan as a DataFrame (ref S1, SURVEY.md §2.1). Explicit
    schema: inference samples the collection, which both costs a pass and
    drifts when early documents miss fields — the entity StructTypes
    (schemas.py) are the single source of truth."""
    return (spark.read.format(MONGO_FORMAT)
            .options(**mongo_read_options(uri, database, collection, pipeline))
            .schema(schema).load())


def jdbc_read_options(url: str, table: str, *,
                      partition_column: str | None = None,
                      num_partitions: int = 8,
                      lower_bound: int | None = None,
                      upper_bound: int | None = None,
                      fetchsize: int = 10_000) -> dict[str, str]:
    """Partitioned-parallel JDBC read: without partitionColumn bounds the
    whole table streams through ONE connection — the read-side twin of the
    reference's row-at-a-time write bottleneck."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update({
            "partitionColumn": partition_column,
            "numPartitions": str(num_partitions),
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
        })
    return opts


def read_jdbc(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    return spark.read.format(JDBC_FORMAT) \
        .options(**jdbc_read_options(url, table, **kw)).load()


def jdbc_write_options(url: str, table: str,
                       batchsize: int = 10_000,
                       isolation_level: str = "READ_COMMITTED") -> dict[str, str]:
    """Batched append options: one multi-row INSERT per ``batchsize`` rows,
    one transaction per partition — vs the reference's INSERT+commit per
    row (ref user_table.py:117-118, the ~100-1000 rows/s bound in
    BASELINE.md)."""
    return {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
    }


def write_jdbc_append(df: DataFrame, url: str, table: str,
                      batchsize: int = 10_000) -> None:
    df.write.format(JDBC_FORMAT) \
        .options(**jdbc_write_options(url, table, batchsize)) \
        .mode("append").save()
