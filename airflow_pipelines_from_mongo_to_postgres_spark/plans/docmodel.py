"""VARIANT document-model queries: the schemaless ingestion path gated
end-to-end through the oracle harness.

The Spark side deliberately takes the LONG way around — relational rows
→ nested JSON documents (the reference's Mongo shape, ref
``dags/includes/user_table.py:31-47``) → ``parse_json`` VARIANT →
typed ``variant_get`` extraction / ``$match`` → aggregate — while the
oracle computes the same result straight from the base columns. Equal
value hashes prove the whole variant round trip (JSON encode, binary
variant encode, path walk, type bracket) is lossless for every type it
carries, including doubles (shortest-round-trip JSON repr) and the
missing-path → default rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions.variantdoc import (
    as_variant,
    variant_conform,
    variant_match,
    variant_pipeline,
)
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
    load_table,
)


def _customer_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers re-shaped as the reference's nested document form:
    {_id, profile:{name, segment}, account:{balance, nation}} — built
    with to_json so the variant layer sees real JSON text, exactly what
    a Mongo export / CDC feed delivers."""
    c = load_table(spark, "customer", sf_dir)
    doc = F.to_json(F.struct(
        F.col("c_custkey").alias("_id"),
        F.struct(F.col("c_name").alias("name"),
                 F.col("c_mktsegment").alias("segment")).alias("profile"),
        F.struct(F.col("c_acctbal").alias("balance"),
                 F.col("c_nationkey").alias("nation")).alias("account"),
    ))
    return c.select(as_variant(doc).alias("doc"))


def q160_variant_docs_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless conform: variant docs → typed scalars (dotted paths,
    missing-path default) → positive-balance filter → per-segment
    aggregate. Exact-arithmetic: balances sum as DECIMAL(18,2) (they
    carry 2dp), cast to double only in the final projection."""
    docs = _customer_docs(spark, sf_dir)
    flat = variant_conform(docs, "doc", {
        "custkey": ("$._id", "bigint"),
        "segment": ("$.profile.segment", "string"),
        "nation": ("$.account.nation", "int"),
        "balance": ("$.account.balance", "double"),
        # absent in every document — proves the default path
        "tier": ("$.profile.tier", "string", "unrated"),
    })
    return (flat.filter(F.col("balance") > 0)
            .groupBy("segment", "tier")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("balance").cast("decimal(18,2)"))
                 .cast("double").alias("bal_sum"),
                 F.max("nation").alias("max_nation"),
                 F.max("custkey").alias("max_custkey")))


Q160_SQL = """
SELECT c_mktsegment AS segment,
       'unrated' AS tier,
       count(*) AS n,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
       max(c_nationkey) AS max_nation,
       max(c_custkey) AS max_custkey
FROM customer
WHERE c_acctbal > 0
GROUP BY 1, 2
"""


def q161_variant_match_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo ``$match`` on VARIANT documents — dotted paths, $gt/$in,
    $exists (both polarities) — then a count/min/max aggregate
    (order-insensitive, hash-stable). The oracle states the same
    predicate over base columns."""
    docs = _customer_docs(spark, sf_dir)
    hits = variant_match(docs, "doc", {
        "account.balance": {"$gt": 1000.0},
        "profile.segment": {"$in": ["BUILDING", "MACHINERY"]},
        "profile.name": {"$exists": True},
        "profile.tier": {"$exists": False},
    })
    flat = variant_conform(hits, "doc", {
        "custkey": ("$._id", "bigint"),
        "segment": ("$.profile.segment", "string"),
    })
    return (flat.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("custkey").alias("min_custkey"),
                 F.max("custkey").alias("max_custkey")))


Q161_SQL = """
SELECT c_mktsegment AS segment,
       count(*) AS n,
       min(c_custkey) AS min_custkey,
       max(c_custkey) AS max_custkey
FROM customer
WHERE c_acctbal > 1000.0
  AND c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_name IS NOT NULL
GROUP BY 1
"""


def q162_variant_props_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table's ``props`` JSON column read the variant way:
    parse once, extract ``$.k`` as bigint, aggregate per event type —
    integer sums only, so cross-engine hashes cannot drift. A malformed
    document would become NULL (try_parse_json) and be counted in
    ``k_null`` instead of failing the scan (M14 quarantine semantics)."""
    ev = load_table(spark, "events", sf_dir)
    k = ev.select("event_type",
                  F.try_variant_get(F.try_parse_json("props"), "$.k",
                                    "bigint").alias("k"))
    return (k.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("k").isNull().cast("long")).alias("k_null"),
                 F.sum("k").alias("k_sum"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max")))


Q162_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS k_null,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_max
FROM events
GROUP BY 1
"""


def q163_variant_unwind_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full mongoql pipeline over VARIANT docs with NO declared table
    schema: orders re-shaped as nested documents with an embedded
    ``items`` array (the Mongo order-with-lineitems shape), then
    $match → $unwind → computed $addFields ($multiply) → $group with
    $sum/$max accumulators, all via
    ``functions.variantdoc.variant_pipeline``. The plan is one
    variant-path select (typed per-access, whole-stage codegen) feeding
    the struct-mode translator — no Python, no second parse.

    The oracle computes the same aggregate straight from the base
    tables, so equal hashes prove the document round trip (JSON encode
    → binary variant → array<struct> cast → explode → expression
    language) is lossless end-to-end."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    items = li.groupBy("l_orderkey").agg(F.sort_array(F.collect_list(
        F.struct(F.col("l_linenumber").alias("ln"),
                 F.col("l_quantity").cast("bigint").alias("qty"),
                 F.col("l_returnflag").alias("rf")))).alias("items"))
    doc = F.to_json(F.struct(F.col("o_orderkey").alias("_id"),
                             F.col("o_orderstatus").alias("status"),
                             F.col("items")))
    docs = (o.join(items.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "o_orderkey", "left")
            .select(as_variant(doc).alias("doc")))
    out = variant_pipeline(docs, "doc", [
        {"$match": {"status": {"$in": ["F", "O"]}}},
        {"$unwind": "$items"},
        {"$addFields": {"qty2": {"$multiply": ["$items.qty", 2]}}},
        {"$group": {"_id": "$items.rf",
                    "n": {"$sum": 1},
                    "qty_sum": {"$sum": "$items.qty"},
                    "qty2_sum": {"$sum": "$qty2"},
                    "max_order": {"$max": "$_id"}}},
    ], fields={
        "_id": "bigint",
        "status": "string",
        "items": "array<struct<ln:int,qty:bigint,rf:string>>",
    })
    return out.select(F.col("_id").alias("rf"), "n", "qty_sum",
                      "qty2_sum", "max_order")


Q163_SQL = """
SELECT l_returnflag AS rf,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
       CAST(sum(CAST(l_quantity AS BIGINT) * 2) AS BIGINT) AS qty2_sum,
       max(l_orderkey) AS max_order
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus IN ('F', 'O')
GROUP BY 1
"""


QUERIES = {
    "q160_variant_docs_conform": q160_variant_docs_conform,
    "q161_variant_match_filter": q161_variant_match_filter,
    "q162_variant_props_metrics": q162_variant_props_metrics,
    "q163_variant_unwind_group": q163_variant_unwind_group,
}

ORACLES = {
    "q160_variant_docs_conform": Q160_SQL,
    "q161_variant_match_filter": Q161_SQL,
    "q162_variant_props_metrics": Q162_SQL,
    "q163_variant_unwind_group": Q163_SQL,
}
