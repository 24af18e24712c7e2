"""Conform layer: every entity spec flattens its nested fixture with the
reference's default policies (SURVEY.md §2.2–§2.3)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import conform as C
from airflow_pipelines_from_mongo_to_postgres_spark.plans.entities import ENTITIES
from tests.datagen import gen_rows

SENTINEL = datetime(1990, 1, 1)


@pytest.mark.parametrize("name", sorted(ENTITIES))
def test_entity_conform_shape(spark, name):
    spec = ENTITIES[name]
    df = spark.createDataFrame(gen_rows(spec.schema, 40, seed=7), spec.schema)
    flat = spec.conform(df)
    assert flat.columns == list(spec.flatten().keys())
    n_in, n_out = df.count(), flat.count()
    if spec.pre is None:
        assert n_out == n_in
    else:
        # loanapplications: filter + explode may shrink/grow
        assert n_out >= 0
    # no nested types survive flattening
    for _, dtype in flat.dtypes:
        assert not dtype.startswith(("struct", "array", "map")), dtype


def test_bool_default_false(spark):
    spec = ENTITIES["users"]
    rows = gen_rows(spec.schema, 30, seed=9)
    for r in rows:
        r["deleted"] = None  # force missing
    flat = spec.conform(spark.createDataFrame(rows, spec.schema))
    assert flat.filter(F.col("deleted").isNull()).count() == 0
    assert flat.filter(~F.col("deleted")).count() == 30


def test_date_sentinel(spark):
    spec = ENTITIES["users"]
    rows = gen_rows(spec.schema, 10, seed=11)
    for r in rows:
        r["lastLogin"] = None
    flat = spec.conform(spark.createDataFrame(rows, spec.schema))
    vals = {r.last_login for r in flat.select("last_login").collect()}
    assert vals == {SENTINEL}  # ref user_table.py:83-84 policy


def test_first_element_empty_array_null_safe(spark):
    spec = ENTITIES["trades"]
    rows = gen_rows(spec.schema, 12, seed=13)
    rows[0]["products"] = []
    rows[1]["products"] = None
    flat = spec.conform(spark.createDataFrame(rows, spec.schema))
    got = flat.select("product_id").collect()
    assert got[0].product_id is None and got[1].product_id is None


def test_stringify_is_json(spark):
    import json

    spec = ENTITIES["users"]
    rows = gen_rows(spec.schema, 5, seed=15)
    rows[0]["roles"] = ["admin", "buyer"]
    flat = spec.conform(spark.createDataFrame(rows, spec.schema))
    s = flat.select("roles").collect()[0].roles
    assert json.loads(s) == ["admin", "buyer"]


def test_explode_unwind_drops_empty(spark):
    spec = ENTITIES["loanapplications"]
    rows = gen_rows(spec.schema, 20, seed=17)
    cutoff = datetime(2023, 1, 1)
    for i, r in enumerate(rows):
        r["dateCreated"] = cutoff  # all pass the 2022-10-05 filter
        r["products"] = ["loanA", "loanB"] if i % 3 == 0 else ([] if i % 3 == 1 else None)
    flat = spec.conform(spark.createDataFrame(rows, spec.schema))
    # only the multi-product rows survive, one row per element ($unwind)
    expected = sum(2 for i in range(20) if i % 3 == 0)
    assert flat.count() == expected
    assert flat.filter(F.col("products").isin("loanA", "loanB")).count() == expected


def test_loanapplications_date_filter(spark):
    spec = ENTITIES["loanapplications"]
    rows = gen_rows(spec.schema, 10, seed=19)
    for i, r in enumerate(rows):
        r["products"] = ["p1"]
        r["dateCreated"] = datetime(2022, 1, 1) if i < 4 else datetime(2023, 5, 5)
    flat = spec.conform(spark.createDataFrame(rows, spec.schema))
    assert flat.count() == 6  # ref loanapplication_table.py:27-31 cutoff


def test_nested_missing_struct_is_null(spark):
    rows = [{"_id": "x", "personalInformation": None}]
    df = spark.createDataFrame(rows, ENTITIES["users"].schema)
    out = df.select(C.nested("personalInformation.firstName").alias("fn")).collect()
    assert out[0].fn is None
