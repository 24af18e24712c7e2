"""Round-7 registry growth: the mongoql expression language gated
end-to-end through the driver's oracle harness, plus three analytics
shapes (two-sample KS drift, Gini concentration, entropy of source
mix) that round out the statistics family.

Each query follows the registry disciplines: exact-arithmetic
aggregation (DECIMAL moments / integer counts) with closed-form double
math only on identical scalar operands, windows always partitioned,
every computed column aliased identically in the Spark plan and the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
    load_table,
)
from airflow_pipelines_from_mongo_to_postgres_spark.sources.mongoql import (
    apply_pipeline,
)


# --- q148: mongo aggregation-expression pipeline over orders ----------------
def q148_mongo_expr_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pipeline idiom, exercised with the EXPRESSION
    language ($match/$addFields[$cond/$concat/$toLower]/$group with a
    conditional accumulator) against a relational table — proving a
    reference user's computed pipelines translate wholesale (ref
    dags/includes/loanapplication_table.py:26-49 is the $match/$project
    shape; this adds the computed-field tier Mongo users reach for
    next). Aggregates are count/min/max only — order-insensitive, so
    cross-engine hashes cannot drift on double addition order."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}}},
        {"$addFields": {
            "tier": {"$cond": [{"$gte": ["$o_totalprice", 150000.0]},
                               "big", "small"]},
            "label": {"$concat": [{"$toLower": "$o_orderstatus"}, "-",
                                  "$o_orderpriority"]},
        }},
        {"$group": {"_id": "$label",
                    "n": {"$sum": 1},
                    "hi": {"$max": "$o_totalprice"},
                    "lo": {"$min": "$o_totalprice"},
                    "big_n": {"$sum": {"$cond": [
                        {"$eq": ["$tier", "big"]}, 1, 0]}}}},
    ])
    return out.select(F.col("_id").alias("label"), "n", "hi", "lo",
                      F.col("big_n").cast("long").alias("big_n"))


Q148_SQL = """
SELECT lower(o_orderstatus) || '-' || o_orderpriority AS label,
       count(*) AS n,
       max(o_totalprice) AS hi,
       min(o_totalprice) AS lo,
       CAST(sum(CASE WHEN o_totalprice >= 150000.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS big_n
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY 1
"""


# --- q149: two-sample Kolmogorov-Smirnov drift per event type ---------------
def q149_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: the exact two-sample KS statistic of
    ``value`` between the even- and odd-event_id halves of each event
    type (the deterministic A/B split the sampling family uses). Values
    are pre-aggregated per (type, value) so the CDF window's ORDER BY
    key is unique (the registry's tiebreak rule), cumulative counts are
    exact integers, and the sup-distance is a max over identical
    integer-ratio doubles on both engines — no float-sum order anywhere.
    ONE shuffle on event_type; the window never spans a single global
    partition."""
    ev = load_table(spark, "events", sf_dir)
    per = (ev.select("event_type", "value",
                     (F.col("event_id") % 2 == 0).cast("long").alias("ia"))
           .groupBy("event_type", "value")
           .agg(F.sum("ia").alias("a"),
                (F.count(F.lit(1)) - F.sum("ia")).alias("b")))
    wc = Window.partitionBy("event_type").orderBy("value")
    # group totals via a tiny re-aggregation + broadcast join-back (a
    # frameless total-window would re-sort the whole partition for a
    # per-group scalar)
    tot = per.groupBy("event_type").agg(F.sum("a").alias("na"),
                                        F.sum("b").alias("nb"))
    cum = (per.withColumn("ca", F.sum("a").over(wc))
           .withColumn("cb", F.sum("b").over(wc))
           .join(F.broadcast(tot), "event_type"))
    return (cum.groupBy("event_type")
            .agg(F.max("na").alias("n_a"), F.max("nb").alias("n_b"),
                 F.round(F.max(F.abs(
                     F.col("ca").cast("double") / F.col("na")
                     - F.col("cb").cast("double") / F.col("nb"))), 6)
                 .alias("ks")))


Q149_SQL = """
WITH per AS (
  SELECT event_type, value,
         sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS b
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type,
         sum(a) OVER (PARTITION BY event_type ORDER BY value) AS ca,
         sum(b) OVER (PARTITION BY event_type ORDER BY value) AS cb,
         sum(a) OVER (PARTITION BY event_type) AS na,
         sum(b) OVER (PARTITION BY event_type) AS nb
  FROM per
)
SELECT event_type,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       round(max(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)),
             6) AS ks
FROM cum GROUP BY 1
"""


# --- q150: Gini concentration of customer spend per nation ------------------
def q150_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit: the Gini coefficient of per-customer
    spend within each nation, via the rank formula
    G = 2*Sum(i*x_i)/(n*Sum(x)) - (n+1)/n over spend sorted ascending.
    Spend sums as DECIMAL (exact), ranks are row_number with a custkey
    tiebreak (equal spends permute without changing Sum(i*x_i)), and the
    rank-weighted sum accumulates as DECIMAL(38,2) — the only double
    math is the final closed form on identical scalars. Two shuffles
    (customer agg, nation agg); the nation dim broadcasts."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    spend = (orders.groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("x")))
    per = (spend.join(cust, spend.o_custkey == cust.c_custkey)
           .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
           .select("n_name", "c_custkey", "x"))
    w = Window.partitionBy("n_name").orderBy("x", "c_custkey")
    ranked = per.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("x").alias("sx"),
        F.sum((F.col("i") * F.col("x")).cast("decimal(38,2)")).alias("sixi"),
    )
    n = F.col("n_customers").cast("double")
    sx = F.col("sx").cast("double")
    sixi = F.col("sixi").cast("double")
    return agg.select(
        "n_name", "n_customers",
        F.round(F.lit(2.0) * sixi / (n * sx) - (n + 1) / n, 6).alias("gini"),
    )


Q150_SQL = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
  FROM orders GROUP BY 1
), per AS (
  SELECT n.n_name, c.c_custkey, s.x,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY s.x, c.c_custkey) AS i
  FROM spend s
  JOIN customer c ON s.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), agg AS (
  SELECT n_name, count(*) AS n_customers, sum(x) AS sx,
         sum(CAST(i * x AS DECIMAL(38,2))) AS sixi
  FROM per GROUP BY 1
)
SELECT n_name, n_customers,
       round(2.0 * CAST(sixi AS DOUBLE)
             / (n_customers * CAST(sx AS DOUBLE))
             - (n_customers + 1.0) / n_customers, 6) AS gini
FROM agg
"""


# --- q151: Shannon entropy of the source mix per language -------------------
def q151_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix health: Shannon entropy (bits) of the source
    distribution within each language — the scalar a curation pipeline
    watches to catch a source collapsing out of the mix. Per-source
    terms -p*log2(p) are rounded to 9dp and summed as DECIMAL(18,9)
    (the registry's float-sum rule: term-wise rounding then exact
    addition, so engine-order of the sum cannot move the hash), final
    round 6. Two map-side aggregations, one shuffle each."""
    docs = load_table(spark, "documents", sf_dir)
    cnt = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    p = F.col("c").cast("double") / F.col("t").cast("double")
    term = F.round(-p * F.log2(p), 9).cast("decimal(18,9)")
    return (cnt.join(F.broadcast(tot), "lang")
            .withColumn("term", term)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_sources"),
                 F.round(F.sum("term").cast("double"), 6).alias("entropy")))


Q151_SQL = """
WITH cnt AS (
  SELECT lang, source, count(*) AS c
  FROM documents GROUP BY 1, 2
), p AS (
  SELECT lang,
         CAST(round(-(CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY lang))
                    * log2(CAST(c AS DOUBLE)
                           / sum(c) OVER (PARTITION BY lang)), 9)
              AS DECIMAL(18,9)) AS term
  FROM cnt
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
       round(CAST(sum(term) AS DOUBLE), 6) AS entropy
FROM p GROUP BY 1
"""


QUERIES = {
    "q148_mongo_expr_orders": q148_mongo_expr_orders,
    "q149_ks_drift": q149_ks_drift,
    "q150_gini_concentration": q150_gini_concentration,
    "q151_entropy_mix": q151_entropy_mix,
}

ORACLES = {
    "q148_mongo_expr_orders": Q148_SQL,
    "q149_ks_drift": Q149_SQL,
    "q150_gini_concentration": Q150_SQL,
    "q151_entropy_mix": Q151_SQL,
}
