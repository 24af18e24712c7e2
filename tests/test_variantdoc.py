"""VARIANT document layer (functions/variantdoc.py): typed path
extraction with defaults, $exists, type-bracketed $match parity with
the struct-mode mongoql translator, and quarantine-not-crash on
malformed documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import variantdoc as V


DOCS = [
    '{"_id": "u1", "personal": {"first": "Ada", "age": 36}, "deleted": false}',
    '{"_id": "u2", "personal": {"first": "Bo"}, "deleted": true, "score": 7.5}',
    '{"_id": "u3", "personal": {"age": "not-a-number"}, "deleted": false}',
    'not json at all',
]


@pytest.fixture()
def docs(spark):
    return (spark.createDataFrame([(d,) for d in DOCS], "j string")
            .select(V.as_variant("j").alias("doc")))


def test_conform_defaults_and_type_bracketing(docs):
    flat = V.variant_conform(docs, "doc", {
        "uid": ("$._id", "string"),
        "first": ("$.personal.first", "string", "unknown"),
        "age": ("$.personal.age", "bigint"),
        "deleted": ("$.deleted", "boolean", False),
    })
    rows = {r["uid"]: r for r in flat.collect()}
    assert rows["u1"]["first"] == "Ada" and rows["u1"]["age"] == 36
    assert rows["u2"]["first"] == "Bo" and rows["u2"]["age"] is None
    # type mismatch extracts NULL, never errors (try_variant_get)
    assert rows["u3"]["age"] is None and rows["u3"]["first"] == "unknown"
    # malformed document -> NULL doc -> NULL uid, defaults still applied
    assert rows[None]["first"] == "unknown" and rows[None]["deleted"] is False


def test_variant_match_ops_and_exists(docs):
    def ids(cond):
        hit = V.variant_match(docs, "doc", cond)
        return sorted(r["i"] for r in hit.select(
            V.vget("doc", "$._id", "string").alias("i")).collect())

    assert ids({"deleted": False}) == ["u1", "u3"]
    assert ids({"personal.age": {"$gte": 30}}) == ["u1"]   # u3's string age drops
    assert ids({"score": {"$exists": True}}) == ["u2"]
    # malformed (NULL) doc matches nothing, not even $exists: false
    assert ids({"score": {"$exists": False}}) == ["u1", "u3"]
    assert ids({"$or": [{"score": {"$gt": 5.0}},
                        {"personal.first": "Ada"}]}) == ["u1", "u2"]
    assert ids({"personal.first": {"$in": ["Ada", "Bo"]},
                "deleted": True}) == ["u2"]


def test_variant_match_agrees_with_struct_translator(spark):
    """The same $match, run (a) struct-mode through the mongoql
    translator over a schema'd read, and (b) variant-mode over
    schemaless parse_json docs, selects the same _ids."""
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.mongoql import (
        apply_pipeline,
    )

    raw = [
        ("a", 10, "x"), ("b", 25, "y"), ("c", 31, "x"), ("d", 18, "z"),
    ]
    df = spark.createDataFrame(raw, "_id string, n long, tag string")
    cond = {"$and": [{"n": {"$gt": 15}}, {"tag": {"$in": ["x", "y"]}}]}

    struct_ids = sorted(r["_id"] for r in
                        apply_pipeline(df, [{"$match": cond}]).collect())

    docs = df.select(V.as_variant(F.to_json(F.struct("_id", "n", "tag")))
                     .alias("doc"))
    var_ids = sorted(
        r["i"] for r in V.variant_match(docs, "doc", cond)
        .select(V.vget("doc", "$._id", "string").alias("i")).collect())
    assert struct_ids == var_ids == ["b", "c"]


def test_variant_plan_is_python_free(docs):
    """The whole conform+match pipeline stays JVM-side: no Python UDF,
    no Arrow eval node in the physical plan."""
    flat = V.variant_conform(
        V.variant_match(docs, "doc", {"deleted": False}), "doc",
        {"uid": ("$._id", "string")})
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
