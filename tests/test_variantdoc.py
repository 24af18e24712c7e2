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
    # r12 parity with the struct-mode operator set
    assert ids({"personal.first": {"$regex": "^a", "$options": "i"}}) \
        == ["u1"]
    assert ids({"personal.first": {"$nin": ["Ada"]}}) == ["u2", "u3"]
    # $not matches failures INCLUDING missing/type-mismatched fields
    assert ids({"personal.age": {"$not": {"$gte": 30}}}) == ["u2", "u3"]
    assert ids({"$nor": [{"deleted": True},
                         {"personal.age": {"$gte": 30}}]}) == ["u3"]
    assert ids({"personal.age": {"$mod": [2, 0]}}) == ["u1"]


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


def test_variant_select_rebuilds_document_shape(spark):
    """variant_select turns dotted paths into NESTED typed columns
    (struct rebuild) so mongoql-style dotted refs resolve, applies
    defaults, and rejects leaf/parent path conflicts."""
    docs = spark.createDataFrame(
        [('{"a": 4, "p": {"x": "hi", "y": 2.5}, "tags": ["t2", "t1"]}',),
         ('{"a": 9}',)], "j string") \
        .select(V.as_variant("j").alias("doc"))
    out = V.variant_select(docs, "doc", {
        "a": "bigint",
        "p.x": ("string", "none"),
        "p.y": "double",
        "tags": "array<string>",
    })
    assert [f.simpleString() for f in out.schema.fields] == [
        "a:bigint", "p:struct<x:string,y:double>", "tags:array<string>"]
    r1, r2 = out.orderBy("a").collect()
    assert r1.a == 4 and r1.p.x == "hi" and r1.p.y == 2.5 \
        and r1.tags == ["t2", "t1"]
    # missing PARENT -> NULL struct (typed-schema reading of a missing
    # subdocument); leaf defaults apply only within a present parent
    assert r2.a == 9 and r2.p is None and r2.tags is None

    with pytest.raises(ValueError, match="conflict"):
        V.variant_select(docs, "doc", {"p": "string", "p.x": "string"})


def test_variant_pipeline_unwind_group_and_quarantine(spark):
    """Full mongoql pipeline over variant docs: $match -> $unwind ->
    computed $addFields -> $group, with a malformed document excluded
    (quarantine) rather than polluting the aggregate."""
    raw = [
        '{"_id": 1, "status": "F", "items": [{"q": 2, "r": "A"}, {"q": 3, "r": "B"}]}',
        '{"_id": 2, "status": "O", "items": [{"q": 5, "r": "A"}]}',
        '{"_id": 3, "status": "X", "items": [{"q": 7, "r": "A"}]}',
        '{"_id": 4, "status": "F"}',
        'garbage {{{',
    ]
    docs = spark.createDataFrame([(d,) for d in raw], "j string") \
        .select(V.as_variant("j").alias("doc"))
    out = V.variant_pipeline(docs, "doc", [
        {"$match": {"status": {"$in": ["F", "O"]}}},
        {"$unwind": "$items"},
        {"$addFields": {"q2": {"$multiply": ["$items.q", 10]}}},
        {"$group": {"_id": "$items.r", "n": {"$sum": 1},
                    "qs": {"$sum": "$items.q"},
                    "q2s": {"$sum": "$q2"},
                    "mx": {"$max": "$_id"}}},
    ], fields={
        "_id": "bigint", "status": "string",
        "items": "array<struct<q:bigint,r:string>>",
    })
    rows = {r["_id"]: r for r in out.collect()}
    assert set(rows) == {"A", "B"}
    assert rows["A"].n == 2 and rows["A"].qs == 7 \
        and rows["A"].q2s == 70 and rows["A"].mx == 2
    assert rows["B"].n == 1 and rows["B"].qs == 3 and rows["B"].mx == 1

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_ejson_get_unwraps_extended_json_v2(spark):
    """r14 Extended JSON v2 ingest (the mongoexport/mongodump format):
    $oid, $date (ISO and canonical $numberLong millis),
    $numberLong/Int/Double/Decimal (string payloads incl. Infinity),
    $binary base64 — unwrapped per target type, relaxed plain values
    passing through, wrapper legs winning over the object-serializing
    plain leg, defaults on missing paths."""
    from datetime import datetime as dt

    lines = [
        '{"_id": {"$oid": "64ab"}, "n": {"$numberLong": "123"}, '
        '"x": {"$numberDouble": "2.5"}, '
        '"ts": {"$date": "2020-01-02T03:04:05Z"}, '
        '"amt": {"$numberDecimal": "12.34"}, '
        '"blob": {"$binary": {"base64": "aGk=", "subType": "00"}}, '
        '"tag": "plain"}',
        '{"_id": {"$oid": "64ac"}, "n": {"$numberInt": "7"}, '
        '"x": {"$numberDouble": "Infinity"}, '
        '"ts": {"$date": {"$numberLong": "86400000"}}}',
        '{"_id": "relaxed", "n": 9, "x": 1.5, '
        '"ts": "2021-05-06T07:08:09Z", "amt": 5.5, "tag": "t"}',
    ]
    df = (spark.createDataFrame([(l,) for l in lines], "j string")
          .select(V.as_variant("j").alias("doc")))
    out = V.ejson_conform(df, "doc", {
        "_id": ("$._id", "string"),
        "n": ("$.n", "long"),
        "x": ("$.x", "double", -1.0),
        "ts": ("$.ts", "timestamp"),
        "amt": ("$.amt", "decimal(18,4)"),
        "blob": ("$.blob", "binary"),
        "tag": ("$.tag", "string", "?"),
    })
    rows = {r["_id"]: r for r in out.collect()}
    r1, r2, r3 = rows["64ab"], rows["64ac"], rows["relaxed"]
    assert (r1["n"], r1["x"], r1["tag"]) == (123, 2.5, "plain")
    assert r1["ts"] == dt(2020, 1, 2, 3, 4, 5)
    assert float(r1["amt"]) == 12.34
    assert bytes(r1["blob"]) == b"hi"
    assert (r2["n"], r2["x"]) == (7, float("inf"))
    assert r2["ts"] == dt(1970, 1, 2)
    assert r2["amt"] is None and r2["tag"] == "?"
    assert (r3["n"], r3["x"], r3["tag"]) == (9, 1.5, "t")
    assert float(r3["amt"]) == 5.5


def test_ejson_render_roundtrips_through_conform(spark):
    """r14 write side: ejson_render emits canonical Extended JSON v2
    from typed columns (type-driven wrappers), and parsing it back
    through ejson_conform is the identity — the mongoimport return
    path proven lossless."""
    from datetime import datetime as dt
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, 2.5, Decimal("12.34"), dt(2020, 1, 2, 3), "x", True,
          bytearray(b"hi")),
         (2, None, None, None, None, None, None)],
        "n long, x double, amt decimal(18,2), ts timestamp, "
        "tag string, ok boolean, blob binary")
    rendered = df.select(
        V.ejson_render(df).alias("j"), F.col("n").alias("orig_n"))
    # canonical wrappers present
    row1 = {r["orig_n"]: r["j"] for r in rendered.collect()}
    assert '"$numberLong":"1"' in row1[1].replace(" ", "")
    assert '"$numberDouble":"2.5"' in row1[1].replace(" ", "")
    assert '"$numberDecimal":"12.34"' in row1[1].replace(" ", "")
    assert '"$date"' in row1[1] and '"$binary"' in row1[1]
    assert '"tag":"x"' in row1[1].replace(" ", "") and "true" in row1[1]
    # nulls render as absent fields
    assert row1[2].replace(" ", "") == '{"n":{"$numberLong":"2"}}'

    back = V.ejson_conform(
        rendered.select(V.as_variant("j").alias("doc")), "doc", {
            "n": ("$.n", "long"), "x": ("$.x", "double"),
            "amt": ("$.amt", "decimal(18,2)"), "ts": ("$.ts", "timestamp"),
            "tag": ("$.tag", "string"), "ok": ("$.ok", "boolean"),
            "blob": ("$.blob", "binary")})
    want = sorted(map(tuple, df.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want
