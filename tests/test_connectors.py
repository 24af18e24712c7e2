"""Connector option builders (jar-less unit surface: the dicts are what a
real cluster's reader/writer consumes verbatim)."""

from __future__ import annotations

import json

import pytest

from airflow_pipelines_from_mongo_to_postgres_spark.sources.connectors import (
    jdbc_read_options,
    jdbc_write_options,
    mongo_read_options,
)


def test_mongo_options_with_pipeline():
    pipe = [{"$match": {"deleted": False}}, {"$unwind": "$products"}]
    opts = mongo_read_options("mongodb://h/", "prod", "loanapplications", pipe)
    assert opts["database"] == "prod"
    assert opts["collection"] == "loanapplications"
    assert json.loads(opts["aggregation.pipeline"]) == pipe
    assert "SamplePartitioner" in opts["partitioner"]


def test_mongo_options_without_pipeline_omits_key():
    opts = mongo_read_options("mongodb://h/", "prod", "users")
    assert "aggregation.pipeline" not in opts


def test_jdbc_read_partitioned():
    opts = jdbc_read_options("jdbc:postgresql://h/db", "public.users",
                             partition_column="id", num_partitions=16,
                             lower_bound=0, upper_bound=1_000_000)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"


def test_jdbc_read_partition_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_read_options("jdbc:postgresql://h/db", "t", partition_column="id")


def test_jdbc_write_batched():
    opts = jdbc_write_options("jdbc:postgresql://h/db", "public.users",
                              batchsize=5000)
    assert opts["batchsize"] == "5000"
    assert opts["isolationLevel"] == "READ_COMMITTED"
