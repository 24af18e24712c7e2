"""Round-7 registry growth: the mongoql expression language gated
end-to-end through the driver's oracle harness, plus analytics and
curation shapes that round out the statistics family — two-sample KS
drift, Gini concentration, entropy of source mix, Gopher/C4-style
document-rule audit, and quality-ordered source-balanced curriculum
sharding.

Each query follows the registry disciplines: exact-arithmetic
aggregation (DECIMAL moments / integer counts) with closed-form double
math only on identical scalar operands, windows always partitioned,
every computed column aliased identically in the Spark plan and the
DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators import similarity
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
    load_table,
    spread,
)
from airflow_pipelines_from_mongo_to_postgres_spark.sources.mongoql import (
    apply_pipeline,
)
from airflow_pipelines_from_mongo_to_postgres_spark.sources.mongoql.stages import (
    _VS_PLANES,
    _VS_TABLES,
    _vs_query_buckets,
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


# --- q152: Gopher/C4-style document-quality rule audit ----------------------
def q152_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rule-based document filter family (Gopher's word-count /
    mean-word-length / repetition gates; C4's rule-audit reporting):
    ONE explode + two aggregations compute per-document word counts,
    mean word length and top-word fraction, then the pass/fail tally
    per rule — every number an exact integer (ratios compared as
    identical int-ratio doubles on both engines). At 100 TB this is a
    shuffle on (doc_id, word) then (doc_id): the standard corpus-audit
    cost; the final tally is 3 rows."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("w")) \
        .filter(F.col("w") != "")
    pw = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    pd_ = pw.groupBy("doc_id").agg(
        F.sum("c").alias("nw"),
        F.max("c").alias("top"),
        F.sum(F.col("c") * F.length("w")).alias("chars"))
    mwl = F.col("chars").cast("double") / F.col("nw")
    topf = F.col("top").cast("double") / F.col("nw")
    fl = pd_.select(
        F.col("nw").between(40, 1000).cast("long").alias("ok_words"),
        ((mwl >= 3.0) & (mwl <= 10.0)).cast("long").alias("ok_mwl"),
        (topf <= F.lit(0.12)).cast("long").alias("ok_rep"))
    agg = fl.agg(F.count(F.lit(1)).alias("_n"),
                 F.sum("ok_words").alias("_w"),
                 F.sum("ok_mwl").alias("_m"),
                 F.sum("ok_rep").alias("_r"))
    rules = F.array(
        F.struct(F.lit("words_in_range").alias("rule"),
                 F.col("_w").alias("pass_n"),
                 (F.col("_n") - F.col("_w")).alias("fail_n")),
        F.struct(F.lit("mean_word_len").alias("rule"),
                 F.col("_m").alias("pass_n"),
                 (F.col("_n") - F.col("_m")).alias("fail_n")),
        F.struct(F.lit("top_word_frac").alias("rule"),
                 F.col("_r").alias("pass_n"),
                 (F.col("_n") - F.col("_r")).alias("fail_n")))
    return agg.select(F.explode(rules).alias("r")).select("r.*")


Q152_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
  FROM documents
), pw AS (
  SELECT doc_id, w, count(*) AS c FROM w WHERE w <> '' GROUP BY 1, 2
), pd AS (
  SELECT doc_id, sum(c) AS nw, max(c) AS top,
         sum(c * length(w)) AS chars
  FROM pw GROUP BY 1
), fl AS (
  SELECT
    CASE WHEN nw BETWEEN 40 AND 1000 THEN 1 ELSE 0 END AS ok_words,
    CASE WHEN CAST(chars AS DOUBLE) / nw >= 3.0
          AND CAST(chars AS DOUBLE) / nw <= 10.0 THEN 1 ELSE 0
         END AS ok_mwl,
    CASE WHEN CAST(top AS DOUBLE) / nw <= 0.12 THEN 1 ELSE 0
         END AS ok_rep
  FROM pd
)
SELECT 'words_in_range' AS rule, CAST(sum(ok_words) AS BIGINT) AS pass_n,
       CAST(count(*) - sum(ok_words) AS BIGINT) AS fail_n FROM fl
UNION ALL
SELECT 'mean_word_len', CAST(sum(ok_mwl) AS BIGINT),
       CAST(count(*) - sum(ok_mwl) AS BIGINT) FROM fl
UNION ALL
SELECT 'top_word_frac', CAST(sum(ok_rep) AS BIGINT),
       CAST(count(*) - sum(ok_rep) AS BIGINT) FROM fl
"""


# --- q153: curriculum shards (quality-ordered, source-balanced) -------------
def q153_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum sharding for training: ntile(4) over length within
    each source assigns every document to a quality-ordered shard while
    keeping each shard's SOURCE MIX balanced by construction (each
    source contributes ~1/4 of its docs to every shard). Deterministic:
    the window orders by (n_chars, doc_id) — the unique tiebreak the
    registry's window rule requires. Output is the per-(shard, source)
    manifest a trainer consumes; all integers."""
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (docs.withColumn("shard", F.ntile(4).over(w))
            .groupBy("shard", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars")))


Q153_SQL = """
WITH t AS (
  SELECT source, n_chars,
         ntile(4) OVER (PARTITION BY source
                        ORDER BY n_chars, doc_id) AS shard
  FROM documents
)
SELECT shard, source, count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM t GROUP BY 1, 2
"""


# --- q154: exact-substring scrub audit (Lee et al. removal stats) -----------
def q154_span_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage audit for exact-substring dedup (the stats side of
    operators/dedup.py::scrub_repeated_spans): per source, how many
    token positions are covered by 5-token windows that repeat across
    >= 2 documents — the volume span-scrubbing would remove. Positioned
    spans join back to the cross-doc duplicate set, coverage intervals
    explode (5 rows per hit) and dedupe per (doc, position); all counts
    exact integers. One explode + two hash-aggs + one equi join.

    Plan note: this gated query keys the frequency agg and join-back on
    the raw span STRING so the oracle comparison is collision-free by
    construction. The production-scale variant is
    ``operators.dedup.scrub_repeated_spans(hash_spans=True)``, which
    ships 8-byte ``xxhash64(span)`` keys through the same plan shape
    (see its docstring for the collision trade)."""
    # spread() (r17, guide §2.5): the documents fixture is a single-row-
    # group parquet, so tokenize + 5-gram explode ran as ONE task — and
    # the spans subtree runs twice (frequency agg + coverage join-back).
    # Widening the scan measured 2.69 s -> 1.76 s at sf0.1; no-op at
    # scale where the scan splits.
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select(
        "doc_id", "source",
        F.filter(F.split(F.lower("text"), r"\s+"),
                 lambda t: t != "").alias("ts"))
    n = 5
    grams = F.when(
        F.size("ts") >= n,
        F.transform(F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(F.col("ts"), i + j)
                               for j in range(n)]))
    ).otherwise(F.array().cast("array<string>"))
    spans = toks.select("doc_id", "source",
                        F.posexplode(grams).alias("pos", "span"))
    dup = (spans.groupBy("span")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("span"))
    covered = (spans.join(dup, "span")
               .select("doc_id", "source",
                       F.explode(F.sequence(F.col("pos"),
                                            F.col("pos") + n - 1))
                       .alias("cp"))
               .distinct())
    per_doc_cov = covered.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("cov"))
    base = toks.select("doc_id", "source", F.size("ts").alias("nt"))
    per_doc = base.join(per_doc_cov.drop("source"), "doc_id", "left") \
        .select("source", "nt",
                F.coalesce(F.col("cov"), F.lit(0)).alias("cov"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("nt").alias("total_tokens"),
                 F.sum("cov").alias("covered_tokens"),
                 F.sum((F.col("cov") > 0).cast("long"))
                 .alias("docs_touched")))


_T154 = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
_GP154 = ("list_transform(range(1, greatest(len(ts) - 4, 0) + 1), "
          "i -> {'pos': i, 's': ts[i] || ' ' || ts[i+1] || ' ' || "
          "ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]})")

Q154_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {_T154} AS ts FROM documents
), spans AS (
  SELECT doc_id, source, u.pos AS pos, u.s AS span
  FROM (SELECT doc_id, source, unnest({_GP154}) AS u FROM toks)
), dup AS (
  SELECT span FROM spans GROUP BY span
  HAVING count(DISTINCT doc_id) >= 2
), covered AS (
  SELECT DISTINCT s.doc_id, s.source, s.pos + o.off AS cp
  FROM spans s JOIN dup USING (span), unnest(range(5)) AS o(off)
), per_cov AS (
  SELECT doc_id, source, count(*) AS cov FROM covered GROUP BY 1, 2
), per_doc AS (
  SELECT t.source, len(t.ts) AS nt, coalesce(p.cov, 0) AS cov
  FROM toks t LEFT JOIN per_cov p ON t.doc_id = p.doc_id
)
SELECT source, count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       CAST(sum(cov) AS BIGINT) AS covered_tokens,
       CAST(sum(CASE WHEN cov > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_touched
FROM per_doc GROUP BY 1
"""


# --- q155: TPC-H Q5 shape — local supplier volume ---------------------------
def q155_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 re-keyed to the fixture: revenue per nation where the CUSTOMER
    and the SUPPLIER share the nation (c_nationkey = s_nationkey) — the
    five-table chain whose scale story is co-location: the two big
    sides shuffle on their join keys once each, the nation dim
    broadcasts, and the nation-equality predicate applies as a cheap
    post-join filter, never a join explosion. Revenue sums as
    DECIMAL(18,6) from per-row DECIMAL products (the registry's
    float-sum rule)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)")
              - F.col("l_discount").cast("decimal(18,4)"))) \
        .cast("decimal(18,6)")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .filter(F.col("c_nationkey") == F.col("s_nationkey"))
         .join(F.broadcast(nat),
               F.col("c_nationkey") == nat.n_nationkey))
    return (j.groupBy("n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .select("n_name", F.round("revenue", 4).alias("revenue"),
                    "n_items"))


Q155_SQL = """
SELECT n.n_name,
       round(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4))
                    - CAST(l.l_discount AS DECIMAL(18,4)))
                 AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY 1
"""


# --- q156: TPC-H Q9 shape — brand profit by nation and year -----------------
def q156_brand_profit_by_nation_year(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Q9 re-keyed (no partsupp in the fixture): discounted revenue of
    one brand's parts, by supplier nation x order year. The part filter
    pushes into the part scan BEFORE its join (semi-reduction of the
    fact), supplier/nation broadcast, and the year derives from
    o_orderdate post-join. DECIMAL accumulation throughout."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)")
              - F.col("l_discount").cast("decimal(18,4)"))) \
        .cast("decimal(18,6)")
    p = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    j = (li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey))
    return (j.groupBy("n_name", F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(rev).cast("double").alias("profit"))
            .select("n_name", "o_year",
                    F.round("profit", 4).alias("profit")))


Q156_SQL = """
SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4))
                    - CAST(l.l_discount AS DECIMAL(18,4)))
                 AS DECIMAL(18,6))) AS DOUBLE), 4) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#13'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


# --- q157: TPC-H Q10 shape — returned-item top customers --------------------
def q157_returned_top_customers(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Q10 re-keyed: the 20 customers losing the most revenue to
    returns (l_returnflag = 'R'). Global top-k AFTER the aggregation —
    the reduced per-customer table is top-k'd (TakeOrdered on ~|custs|
    rows), never the fact; deterministic under ties via the custkey
    tiebreak. Revenue exact-DECIMAL; the double cast happens after the
    ordering so the rank is decided on exact values."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)")
              - F.col("l_discount").cast("decimal(18,4)"))) \
        .cast("decimal(18,6)")
    per = (li.filter(F.col("l_returnflag") == "R")
           .join(orders, li.l_orderkey == orders.o_orderkey)
           .join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
           .groupBy("c_custkey", "c_name", "n_name")
           .agg(F.sum(rev).alias("_rev"),
                F.count(F.lit(1)).alias("n_returned")))
    return (per.orderBy(F.col("_rev").desc(), F.col("c_custkey"))
            .limit(20)
            .select("c_custkey", "c_name", "n_name", "n_returned",
                    F.round(F.col("_rev").cast("double"), 4)
                    .alias("lost_revenue")))


Q157_SQL = """
WITH per AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(18,4))
                - CAST(l.l_discount AS DECIMAL(18,4)))
             AS DECIMAL(18,6))) AS _rev,
         count(*) AS n_returned
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, n_name, n_returned,
       round(CAST(_rev AS DOUBLE), 4) AS lost_revenue
FROM per ORDER BY _rev DESC, c_custkey LIMIT 20
"""


# --- q158: quantity-weighted median price per return flag -------------------
def q158_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (not a sketch): per return flag, the
    smallest extended price whose cumulative quantity weight reaches
    half the total. Prices pre-aggregate per (flag, price) so the
    cumulative window's ORDER BY key is unique; weights are exact
    decimals; the half-total threshold compares identical decimal
    operands on both engines. One shuffle + one partitioned window —
    the lower-percentile generalization a trainer's loss-weighting
    audit needs."""
    li = load_table(spark, "lineitem", sf_dir)
    per = (li.groupBy("l_returnflag",
                      F.col("l_extendedprice").alias("price"))
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .alias("w")))
    wc = Window.partitionBy("l_returnflag").orderBy("price")
    tot = per.groupBy("l_returnflag").agg(F.sum("w").alias("tw"))
    cum = (per.withColumn("cw", F.sum("w").over(wc))
           .join(F.broadcast(tot), "l_returnflag")
           .filter(F.col("cw") * 2 >= F.col("tw")))
    return (cum.groupBy("l_returnflag")
            .agg(F.min("price").alias("weighted_median_price"),
                 F.max(F.col("tw").cast("double")).alias("total_weight")))


Q158_SQL = """
WITH per AS (
  SELECT l_returnflag, l_extendedprice AS price,
         sum(CAST(l_quantity AS DECIMAL(18,4))) AS w
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, price, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM per
)
SELECT l_returnflag,
       min(price) AS weighted_median_price,
       max(CAST(tw AS DOUBLE)) AS total_weight
FROM cum WHERE cw * 2 >= tw GROUP BY 1
"""


# --- q159: modal order priority per status (deterministic ties) -------------
def q159_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE with a pinned tiebreak: the most frequent
    o_orderpriority within each order status; equal counts resolve to
    the lexicographically smallest value (max_by over a (count, 
    reversed-tiebreak) struct would be opaque — a ranked window over
    the pre-aggregated (status, priority, n) table is 25 rows and
    reads as the spec). Two tiny aggregations; the window runs over
    the REDUCED table."""
    orders = load_table(spark, "orders", sf_dir)
    per = (orders.groupBy("o_orderstatus", "o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("o_orderstatus") \
        .orderBy(F.col("n").desc(), F.col("o_orderpriority"))
    return (per.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("mode_priority"),
                    F.col("n").alias("n_orders")))


Q159_SQL = """
WITH per AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY 1, 2
), rk AS (
  SELECT o_orderstatus, o_orderpriority, n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY n DESC, o_orderpriority) AS r
  FROM per
)
SELECT o_orderstatus, o_orderpriority AS mode_priority,
       n AS n_orders
FROM rk WHERE r = 1
"""


# --- q164: TPC-H Q2 shape — cheapest supplier per part (decorrelated) -------
def q164_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated ``= (SELECT min(...))`` subquery, decorrelated
    the way modern planners rewrite it — as a windowed min over the
    per-(part, supplier) offer table: the part filter semi-reduces the
    FACT first (broadcast left_semi on the filtered ~10% of p_partkey,
    map-side, BEFORE the groupBy — per-part min is unchanged by
    dropping other parts, so semantics are identical and the first
    shuffle carries a tenth of the pairs), the fact then shuffles ONCE
    with map-side-combined (part, supplier) pairs, the per-part minimum
    is a window over that reduced table (second exchange moves pairs,
    not lineitems), and the equality filter keeps the best-price rows —
    no self-join, no third shuffle. No partsupp in the fixture, so the
    \"offer\" is the best observed lineitem price per (part,
    supplier); min of stored doubles is comparison-only (no
    accumulation), so the equality cannot drift cross-engine. Ties
    keep ALL best-price suppliers (rows are distinct pairs —
    deterministic without an arbitrary pick)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    p = part.filter(F.col("p_size") <= 5).select("p_partkey", "p_brand")
    li_r = li.join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey", "left_semi")
    offers = (li_r.groupBy("l_partkey", "l_suppkey")
              .agg(F.min("l_extendedprice").alias("offer")))
    w = Window.partitionBy("l_partkey")
    j = (offers.withColumn("best_offer", F.min("offer").over(w))
         .filter(F.col("offer") == F.col("best_offer"))
         .select(F.col("l_partkey").alias("p_partkey"), "l_suppkey",
                 "best_offer")
         .join(F.broadcast(p), "p_partkey")
         .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")))
    return j.select("p_partkey", "p_brand", F.col("s_name"),
                    F.col("n_name"), "best_offer")


Q164_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS offer
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min(offer) AS best_offer FROM offers GROUP BY 1
)
SELECT o.l_partkey AS p_partkey, p.p_brand, s.s_name, n.n_name,
       b.best_offer
FROM offers o
JOIN best b ON o.l_partkey = b.l_partkey AND o.offer = b.best_offer
JOIN part p ON o.l_partkey = p.p_partkey AND p.p_size <= 5
JOIN supplier s ON o.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


# --- q165: TPC-H Q3 shape — shipping-priority top orders ---------------------
def q165_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 near-canonical (the fixture has c_mktsegment): revenue of
    not-yet-shipped lineitems for BUILDING-segment customers' orders
    placed before the cutoff, top 10. Both date predicates and the
    segment filter push into their scans BEFORE any join (the scan
    reads a fraction of each table); customer semi-reduces orders via
    broadcast; revenue is exact DECIMAL and the top-10 is decided on
    the exact value with the orderkey tiebreak."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    cutoff = "1998-07-01"
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)")
              - F.col("l_discount").cast("decimal(18,4)"))) \
        .cast("decimal(18,6)")
    c = cust.filter(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    per = (li.filter(F.col("l_shipdate") > cutoff)
           .join(orders.filter(F.col("o_orderdate") < cutoff),
                 li.l_orderkey == orders.o_orderkey)
           .join(F.broadcast(c), orders.o_custkey == F.col("c_custkey"))
           .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
           .agg(F.sum(rev).alias("_rev")))
    return (per.orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
            .limit(10)
            .select("l_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    "o_orderpriority",
                    F.round(F.col("_rev").cast("double"), 4)
                    .alias("revenue")))


Q165_SQL = """
WITH per AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(18,4))
                - CAST(l.l_discount AS DECIMAL(18,4)))
             AS DECIMAL(18,6))) AS _rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-07-01'
    AND l.l_shipdate > TIMESTAMP '1998-07-01'
  GROUP BY 1, 2, 3
)
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority, round(CAST(_rev AS DOUBLE), 4) AS revenue
FROM per ORDER BY _rev DESC, l_orderkey LIMIT 10
"""


# --- q166: TPC-H Q6 shape — forecast revenue change --------------------------
def q166_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 verbatim-shape: ONE scan, three pushed predicates, one
    global aggregate — the query whose entire cost at 100 TB is how
    little of the fact the scan reads (year + discount-band + quantity
    filters all reach PushedFilters; no shuffle except the final
    single-row reduce). Revenue delta sums DECIMAL products exactly."""
    li = load_table(spark, "lineitem", sf_dir)
    delta = (F.col("l_extendedprice").cast("decimal(18,4)")
             * F.col("l_discount").cast("decimal(18,4)")) \
        .cast("decimal(18,6)")
    return (li.filter((F.col("l_shipdate") >= "1997-01-01")
                      & (F.col("l_shipdate") < "1998-01-01")
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(delta).cast("double"), 4)
                 .alias("revenue_delta"),
                 F.count(F.lit(1)).alias("n_lines")))


Q166_SQL = """
SELECT round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,6)))
             AS DOUBLE), 4) AS revenue_delta,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- q167: TPC-H Q12 shape — late shipments by priority class ----------------
def q167_late_shipment_priority(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Q12's conditional-aggregation-after-join shape, re-keyed (no
    l_shipmode in the fixture): lineitems shipped more than 90 days
    after their order date, counted per line status into high-priority
    (URGENT/HIGH) vs low-priority buckets. The lateness predicate is
    row-local post-join arithmetic on two timestamp columns; the
    conditional counts are integer-exact map-side partial aggregates —
    one fact shuffle total."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .filter(F.col("l_shipdate")
                 > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")))
    return (j.groupBy("l_linestatus")
            .agg(F.sum(high.cast("long")).alias("high_line_count"),
                 F.sum((~high).cast("long")).alias("low_line_count"),
                 F.count(F.lit(1)).alias("n_late")))


Q167_SQL = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
       count(*) AS n_late
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY 1
"""


# --- q168: $setWindowFields pipeline over events -----------------------------
def q168_mongo_window_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo 5.0 window functions ($setWindowFields) translated to
    Spark windows, end-to-end through the pipeline dispatcher: per-user
    running value (documents frame), sequence number, and previous
    event type ($shift by -1), keeping each user's first 3 events. The
    running sum accumulates DECIMAL in the (ts, event_id)-pinned order,
    so cross-engine addition order is identical; the window partitions
    by user_id (never global). Decimal -> double happens outside the
    pipeline, at the output boundary (the no-decimal-output gate)."""
    ev = load_table(spark, "events", sf_dir) \
        .withColumn("value_d", F.col("value").cast("decimal(18,4)"))
    out = apply_pipeline(ev, [
        {"$setWindowFields": {
            "partitionBy": "$user_id",
            "sortBy": {"ts": 1, "event_id": 1},
            "output": {
                "running_value": {"$sum": "$value_d",
                                  "window": {"documents": ["unbounded",
                                                           "current"]}},
                "seq": {"$documentNumber": {}},
                "prev_type": {"$shift": {"output": "$event_type",
                                         "by": -1, "default": "none"}},
            }}},
        {"$match": {"seq": {"$lte": 3}}},
    ])
    return out.select("event_id", "user_id", "seq", "prev_type",
                      F.round(F.col("running_value").cast("double"), 4)
                      .alias("running_value"))


Q168_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type,
         sum(CAST(value AS DECIMAL(18,4))) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS seq,
         lag(event_type, 1, 'none') OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT event_id, user_id, seq, prev_type,
       round(CAST(running_value AS DOUBLE), 4) AS running_value
FROM w WHERE seq <= 3
"""


# --- q169: $bucket histogram of document lengths ------------------------------
def q169_mongo_bucket_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$bucket over documents.n_chars: left-closed boundaries, _id =
    lower bound, string 'xl' default (label coercion to string — the
    documented deviation), output accumulators compiled by the $group
    compiler. Integer-exact aggregates only."""
    docs = load_table(spark, "documents", sf_dir)
    return apply_pipeline(docs, [
        {"$bucket": {"groupBy": "$n_chars",
                     "boundaries": [0, 200, 500, 1000, 5000],
                     "default": "xl",
                     "output": {"n_docs": {"$sum": 1},
                                "total_chars": {"$sum": "$n_chars"}}}},
    ]).select("_id", "n_docs", F.col("total_chars").cast("long")
              .alias("total_chars"))


Q169_SQL = """
SELECT CASE WHEN n_chars >= 0 AND n_chars < 200 THEN '0'
            WHEN n_chars >= 200 AND n_chars < 500 THEN '200'
            WHEN n_chars >= 500 AND n_chars < 1000 THEN '500'
            WHEN n_chars >= 1000 AND n_chars < 5000 THEN '1000'
            ELSE 'xl' END AS _id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


# --- q170: $sortByCount over document languages -------------------------------
def q170_mongo_sort_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$sortByCount — the $group + $sort(-count) sugar with the pinned
    _id tiebreak (Mongo leaves count-ties unordered; deterministic
    beats unspecified, the translator convention)."""
    docs = load_table(spark, "documents", sf_dir)
    return apply_pipeline(docs, [{"$sortByCount": "$lang"}])


Q170_SQL = """
SELECT lang AS _id, count(*) AS "count"
FROM documents GROUP BY 1 ORDER BY count(*) DESC, lang
"""


# --- q171: $out + $merge terminal write stages --------------------------------
def q171_mongo_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship shape end-to-end IN the translator:
    a pipeline that WRITES (ref dags/mongo_to_postgres_migration.py:109-155
    reads a Mongo pipeline then row-wise-upserts Postgres). Seed a
    snapshot table via ``$out`` (per-nation stats of the low-key
    nations), then ``$merge`` a second aggregation into it with Mongo's
    defaults (whenMatched=merge / whenNotMatched=insert): batch columns
    overwrite, the target-only ``n_cust`` column carries over for
    matched nations and NULLs for inserted ones. Both writes are single
    atomic snapshot commits (merge-on-read, O(batch)); the returned
    frame is the target's post-merge snapshot. DECIMAL sums for
    cross-engine hash stability."""
    import tempfile

    cust = load_table(spark, "customer", sf_dir).withColumn(
        "bal_d", F.col("c_acctbal").cast("decimal(18,2)"))
    path = f"{tempfile.mkdtemp(prefix='q171_')}/stats"
    targets = {"stats": path}
    apply_pipeline(cust, [
        {"$match": {"c_nationkey": {"$lt": 13}}},
        {"$group": {"_id": "$c_nationkey", "n_cust": {"$sum": 1},
                    "bal_sum": {"$sum": "$bal_d"}}},
        {"$out": "stats"},
    ], targets=targets)
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "BUILDING"}},
        {"$group": {"_id": "$c_nationkey",
                    "bal_sum": {"$sum": "$bal_d"}}},
        {"$merge": {"into": "stats", "on": "_id",
                    "whenMatched": "merge", "whenNotMatched": "insert"}},
    ], targets=targets)
    return out.select(
        "_id", "n_cust",
        F.round(F.col("bal_sum").cast("double"), 2).alias("bal_sum"))


Q171_SQL = """
WITH seed AS (
  SELECT c_nationkey AS _id, count(*) AS n_cust,
         sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
  FROM customer WHERE c_nationkey < 13 GROUP BY 1),
b AS (
  SELECT c_nationkey AS _id, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1)
SELECT b._id, s.n_cust, round(CAST(b.bal AS DOUBLE), 2) AS bal_sum
FROM b JOIN seed s ON b._id = s._id
UNION ALL
SELECT b._id, NULL, round(CAST(b.bal AS DOUBLE), 2)
FROM b WHERE b._id NOT IN (SELECT _id FROM seed)
UNION ALL
SELECT s._id, s.n_cust, round(CAST(s.bal AS DOUBLE), 2)
FROM seed s WHERE s._id NOT IN (SELECT _id FROM b)
"""


# --- q172: $facet multi-aggregation dashboard over documents -------------------
def q172_mongo_facet_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$facet``: three sub-aggregations (language leaderboard, length
    histogram, global totals) over ONE persisted scan of documents,
    collapsed to a single dashboard document, then ``$project``
    expression ops ($size/$arrayElemAt over the facet arrays) reduce it
    to scalars so the oracle gate is exact. sort_array pins the facet
    arrays, so element 0 of the language facet is the alphabetically
    first language."""
    docs = load_table(spark, "documents", sf_dir)
    out = apply_pipeline(docs, [
        {"$facet": {
            "langs": [{"$sortByCount": "$lang"}],
            "buckets": [{"$bucket": {
                "groupBy": "$n_chars",
                "boundaries": [0, 200, 500, 1000, 5000],
                "default": "xl",
                "output": {"n": {"$sum": 1}}}}],
            "totals": [{"$group": {"_id": {"$literal": 1},
                                   "docs": {"$sum": 1},
                                   "chars": {"$sum": "$n_chars"}}}],
        }},
        {"$project": {
            "n_langs": {"$size": "$langs"},
            "first_lang": {"$arrayElemAt": ["$langs._id", 0]},
            "first_lang_docs": {"$arrayElemAt": ["$langs.count", 0]},
            "n_buckets": {"$size": "$buckets"},
            "total_docs": {"$arrayElemAt": ["$totals.docs", 0]},
            "total_chars": {"$arrayElemAt": ["$totals.chars", 0]},
        }},
    ])
    return out.select(
        F.col("n_langs").cast("long").alias("n_langs"),
        "first_lang", "first_lang_docs",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        "total_docs", F.col("total_chars").cast("long").alias("total_chars"))


Q172_SQL = """
WITH l AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1)
SELECT CAST((SELECT count(*) FROM l) AS BIGINT) AS n_langs,
       (SELECT min(lang) FROM l) AS first_lang,
       CAST((SELECT c FROM l WHERE lang = (SELECT min(lang) FROM l))
            AS BIGINT) AS first_lang_docs,
       CAST((SELECT count(DISTINCT
              CASE WHEN n_chars >= 0 AND n_chars < 200 THEN '0'
                   WHEN n_chars >= 200 AND n_chars < 500 THEN '200'
                   WHEN n_chars >= 500 AND n_chars < 1000 THEN '500'
                   WHEN n_chars >= 1000 AND n_chars < 5000 THEN '1000'
                   ELSE 'xl' END) FROM documents) AS BIGINT) AS n_buckets,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS total_docs,
       CAST((SELECT sum(n_chars) FROM documents) AS BIGINT) AS total_chars
"""


# --- q173: $setWindowFields range window with a time unit ----------------------
def q173_mongo_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-time windows — the most common real
    ``$setWindowFields`` use: per-user trailing-7-day DECIMAL revenue
    sum and trailing-1-day event count, lowered onto rangeBetween over
    the sort field's epoch milliseconds (no self-join, no UDF — one
    native running window per output). Timestamps are ms-truncated in
    the DATA on both engines so the ms-grain order key is exact;
    RANGE frames make tied timestamps peers, so no tiebreak column is
    needed for hash stability (unlike ROWS windows)."""
    ev = load_table(spark, "events", sf_dir) \
        .withColumn("ts", F.date_trunc("millisecond", F.col("ts"))) \
        .withColumn("value_d", F.col("value").cast("decimal(18,4)"))
    out = apply_pipeline(ev, [
        {"$setWindowFields": {
            "partitionBy": "$user_id",
            "sortBy": {"ts": 1},
            "output": {
                "week_sum": {"$sum": "$value_d",
                             "window": {"range": [-7, 0], "unit": "day"}},
                "day_n": {"$count": {},
                          "window": {"range": [-1, 0], "unit": "day"}},
            }}},
    ])
    return out.select(
        "event_id", "user_id",
        F.round(F.col("week_sum").cast("double"), 4).alias("week_sum"),
        F.col("day_n").cast("long").alias("day_n"))


Q173_SQL = """
WITH e AS (SELECT event_id, user_id,
                  date_trunc('milliseconds', ts) AS ts,
                  CAST(value AS DECIMAL(18,4)) AS v
           FROM events)
SELECT event_id, user_id,
       round(CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
             AS DOUBLE), 4) AS week_sum,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
             AS BIGINT) AS day_n
FROM e
"""


# --- q174: array higher-order functions over grouped orders -------------------
def q174_mongo_array_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$push builds a per-customer cents array (integer-exact), then
    the array HOF toolkit reduces it inside codegen: $size, $filter
    (+$size) for the big-order count, $reduce for the exact total, and
    $slice[-3]+$reduce for the top-3 sum ($push arrays are pinned
    ascending, so the last 3 are the largest — tie-immune because a sum
    of the 3 largest VALUES doesn't depend on which tied order wins).
    No shuffle beyond the one groupBy; no Python in the loop."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    out = apply_pipeline(orders, [
        {"$group": {"_id": "$o_custkey", "arr": {"$push": "$cents"}}},
        {"$addFields": {
            "n_orders": {"$size": "$arr"},
            "n_big": {"$size": {"$filter": {
                "input": "$arr",
                "cond": {"$gt": ["$$this", 15000000]}}}},
            "total_cents": {"$reduce": {
                "input": "$arr", "initialValue": {"$toLong": 0},
                "in": {"$add": ["$$value", "$$this"]}}},
            "top3_cents": {"$reduce": {
                "input": {"$slice": ["$arr", -3]},
                "initialValue": {"$toLong": 0},
                "in": {"$add": ["$$value", "$$this"]}}},
        }},
        {"$unset": "arr"},
    ])
    return out.select(
        "_id", F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_big").cast("long").alias("n_big"),
        F.col("total_cents").cast("long").alias("total_cents"),
        F.col("top3_cents").cast("long").alias("top3_cents"))


Q174_SQL = """
WITH o AS (SELECT o_custkey,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders),
r AS (SELECT o_custkey, cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY cents DESC) AS rn
      FROM o)
SELECT o_custkey AS _id,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN cents > 15000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_big,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN rn <= 3 THEN cents ELSE 0 END)
            AS BIGINT) AS top3_cents
FROM r GROUP BY 1
"""


# --- q175: $densify + $fill gap-filled daily series ----------------------------
def q175_mongo_densify_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily purchase series: $dateTrunc day buckets,
    $group, $densify onto the full day grid (sequence + anti-join —
    grid size is data-bounded), then $fill: count 0 on generated days,
    last-observed daily max carried forward (locf). The $fill window is
    global but runs POST-AGGREGATION over #days rows (bounded — ~366
    per data year), the same shape as q66's accounted-for global
    window. max(value) is order-independent, so doubles hash stably."""
    ev = load_table(spark, "events", sf_dir)
    out = apply_pipeline(ev, [
        {"$match": {"event_type": "purchase"}},
        {"$addFields": {"day": {"$dateTrunc": {"date": "$ts",
                                               "unit": "day"}}}},
        {"$group": {"_id": "$day", "n": {"$sum": 1},
                    "mx": {"$max": "$value"}}},
        {"$densify": {"field": "_id",
                      "range": {"step": 1, "unit": "day",
                                "bounds": "full"}}},
        {"$fill": {"sortBy": {"_id": 1},
                   "output": {"n": {"value": 0},
                              "mx": {"method": "locf"}}}},
    ])
    return out.select(F.col("_id").alias("day"),
                      F.col("n").cast("long").alias("n_day"),
                      F.round(F.col("mx"), 2).alias("carried_max"))


Q175_SQL = """
WITH d AS (SELECT date_trunc('day', ts) AS day, count(*) AS n,
                  max(value) AS mx
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
grid AS (SELECT unnest(generate_series((SELECT min(day) FROM d),
                                       (SELECT max(day) FROM d),
                                       INTERVAL 1 DAY)) AS day),
j AS (SELECT g.day, d.n, d.mx FROM grid g LEFT JOIN d USING (day))
SELECT day, CAST(coalesce(n, 0) AS BIGINT) AS n_day,
       round(last_value(mx IGNORE NULLS) OVER
             (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW), 2) AS carried_max
FROM j
"""


# --- q176: $bucketAuto equal-population histogram ------------------------------
def q176_mongo_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$bucketAuto over order value cents: boundaries = exact octile
    percentiles (ONE distributed sort-agg; the driver sees 7 scalars),
    assignment is a branch-free running comparison — no global
    row_number window, so the stage scales like a groupBy. Both
    engines interpolate percentiles identically (R-7) over exact
    integer cents, so the bucket sets match bit-for-bit."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    out = apply_pipeline(orders, [
        {"$bucketAuto": {"groupBy": "$cents", "buckets": 8,
                         "output": {"n": {"$sum": 1},
                                    "s": {"$sum": "$cents"}}}},
    ])
    return out.select(F.col("_id.min").alias("lo"),
                      F.col("_id.max").alias("hi"),
                      F.col("n").cast("long").alias("n"),
                      F.col("s").cast("long").alias("s"))


Q176_SQL = """
WITH o AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
           FROM orders),
b AS (SELECT quantile_cont(c, 0.125) AS b1, quantile_cont(c, 0.250) AS b2,
             quantile_cont(c, 0.375) AS b3, quantile_cont(c, 0.500) AS b4,
             quantile_cont(c, 0.625) AS b5, quantile_cont(c, 0.750) AS b6,
             quantile_cont(c, 0.875) AS b7
      FROM o),
x AS (SELECT c, ((c >= b1)::INT + (c >= b2)::INT + (c >= b3)::INT +
                 (c >= b4)::INT + (c >= b5)::INT + (c >= b6)::INT +
                 (c >= b7)::INT) AS idx
      FROM o CROSS JOIN b)
SELECT CAST(min(c) AS BIGINT) AS lo, CAST(max(c) AS BIGINT) AS hi,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
FROM x GROUP BY idx
"""


# --- q177: $graphLookup bounded ancestor traversal -----------------------------
def q177_mongo_graph_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$graphLookup over a derived parent chain (nation k's parent is
    k-1): BFS to maxDepth 3 — one distributed join per depth level,
    lineage cut per round — then the HOF toolkit summarizes the
    ancestor arrays ($size; $map + $reduce for the exact key sum). The
    oracle is the closed form of the bounded chain, so the gate proves
    traversal depth, membership, and the depth cap simultaneously."""
    nation = load_table(spark, "nation", sf_dir)
    docs = nation.select(
        F.col("n_nationkey").alias("_id"),
        F.when(F.col("n_nationkey") > 0,
               F.col("n_nationkey") - 1).alias("parent"))
    out = apply_pipeline(docs, [
        {"$graphLookup": {"from": "nodes", "startWith": "$parent",
                          "connectFromField": "parent",
                          "connectToField": "_id",
                          "as": "anc", "maxDepth": 3}},
        {"$addFields": {
            "n_anc": {"$size": "$anc"},
            "key_sum": {"$reduce": {
                "input": {"$map": {"input": "$anc",
                                   "in": "$$this._id"}},
                "initialValue": {"$literal": 0},
                "in": {"$add": ["$$value", "$$this"]}}},
        }},
    ], collections={"nodes": docs})
    return out.select("_id", F.col("n_anc").cast("long").alias("n_anc"),
                      F.col("key_sum").cast("long").alias("key_sum"))


Q177_SQL = """
SELECT n_nationkey AS _id,
       CAST(LEAST(n_nationkey, 4) AS BIGINT) AS n_anc,
       CAST(CASE WHEN n_nationkey = 0 THEN 0 ELSE
            (GREATEST(n_nationkey - 4, 0) + n_nationkey - 1)
            * (n_nationkey - GREATEST(n_nationkey - 4, 0)) // 2
            END AS BIGINT) AS key_sum
FROM nation
"""


# --- q178: composite $group keys + date parts ----------------------------------
def q178_mongo_composite_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo's multi-field group key — {_id: {t, d}} becomes a struct,
    '$_id.t' works downstream — over a $dateTrunc'd day column, with
    $isoDayOfWeek proving the date-part family end-to-end. One shuffle;
    DECIMAL revenue for hash stability; the final $project flattens the
    composite key so the oracle gate stays rectangular."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "value_d", F.col("value").cast("decimal(18,4)"))
    out = apply_pipeline(ev, [
        {"$addFields": {"day": {"$dateTrunc": {"date": "$ts",
                                               "unit": "day"}}}},
        {"$group": {"_id": {"t": "$event_type", "d": "$day"},
                    "n": {"$sum": 1}, "rev": {"$sum": "$value_d"}}},
        {"$addFields": {"dow": {"$isoDayOfWeek": "$_id.d"}}},
        {"$project": {"t": "$_id.t", "d": "$_id.d", "n": 1, "rev": 1,
                      "dow": 1, "_id": 0}},
    ])
    return out.select(
        "t", "d", F.col("n").cast("long").alias("n"),
        F.round(F.col("rev").cast("double"), 4).alias("rev"),
        F.col("dow").cast("int").alias("dow"))


Q178_SQL = """
SELECT event_type AS t, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS rev,
       CAST(isodow(date_trunc('day', ts)) AS INT) AS dow
FROM events GROUP BY event_type, date_trunc('day', ts)
"""


# --- q179: $linearFill + $derivative over a densified series --------------------
def q179_mongo_linear_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full gap-filled-series toolkit in one pipeline: daily error
    maxima -> $densify onto the day grid -> $linearFill interpolates
    the generated days on the time axis -> $derivative gives the
    day-over-day rate over a 2-row frame. Interpolation and rate are
    IEEE double chains replicated operation-for-operation in the
    oracle (same inputs, same order -> identical bits), rounded at the
    boundary. Post-aggregation global window over #days rows (bounded,
    the q66/q175 class)."""
    ev = load_table(spark, "events", sf_dir)
    out = apply_pipeline(ev, [
        {"$match": {"event_type": "error"}},
        {"$addFields": {"day": {"$dateTrunc": {"date": "$ts",
                                               "unit": "day"}}}},
        {"$group": {"_id": "$day", "mx": {"$max": "$value"}}},
        {"$densify": {"field": "_id",
                      "range": {"step": 1, "unit": "day",
                                "bounds": "full"}}},
        {"$setWindowFields": {
            "sortBy": {"_id": 1},
            "output": {
                "lin": {"$linearFill": "$mx"},
                "rate": {"$derivative": {"input": "$mx", "unit": "day"},
                         "window": {"documents": [-1, 0]}},
            }}},
    ])
    return out.select(
        F.col("_id").alias("day"),
        F.round(F.col("lin"), 4).alias("lin"),
        F.round(F.col("rate"), 4).alias("rate"))


Q179_SQL = """
WITH d AS (SELECT date_trunc('day', ts) AS day, max(value) AS mx
           FROM events WHERE event_type = 'error' GROUP BY 1),
grid AS (SELECT unnest(generate_series((SELECT min(day) FROM d),
                                       (SELECT max(day) FROM d),
                                       INTERVAL 1 DAY)) AS day),
j AS (SELECT g.day, epoch_ms(g.day) / 1000.0 AS k, d.mx
      FROM grid g LEFT JOIN d USING (day)),
w AS (SELECT day, k, mx,
        last_value(mx IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS pv,
        last_value(CASE WHEN mx IS NOT NULL THEN k END IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS pk,
        first_value(mx IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
          AS nv,
        first_value(CASE WHEN mx IS NOT NULL THEN k END IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
          AS nk,
        lag(mx) OVER (ORDER BY day) AS pmx,
        lag(k) OVER (ORDER BY day) AS pkk
      FROM j)
SELECT day,
       round(COALESCE(mx, CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
             THEN pv + (nv - pv) * (k - pk) / (nk - pk) END), 4) AS lin,
       round((mx - pmx) / ((k * 1000 - pkk * 1000) / 86400000.0), 4)
           AS rate
FROM w
"""


# --- q180: $group rank accumulators ($top/$topN/$minN) --------------------------
def q180_mongo_group_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-k orders with the Mongo 5.2 $group rank family:
    $top (scalar best, max_by — no array), $topN (sorted-slice array,
    one agg expression) and $minN — all inside the single o_custkey
    groupBy, no per-group row_number shuffle. The sort key is made
    TIE-IMMUNE (cents<<32 | orderkey, exact in long) so the gate is
    deterministic at every SF; bit-packing covers orderkeys to 2^32.
    The array outputs are JSON-stringified in the FINAL projection
    (to_json on Spark, to_json::VARCHAR on DuckDB) because the driver's
    pandas canon cannot hash list cells — same discipline as P6 and the
    no-DecimalType gate (VERDICT r11 "What's wrong" #1)."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    out = apply_pipeline(orders, [
        {"$addFields": {"rk": {"$add": [
            {"$multiply": ["$cents", 4294967296]}, "$o_orderkey"]}}},
        {"$group": {"_id": "$o_custkey",
            "best_order": {"$top": {"output": "$o_orderkey",
                                    "sortBy": {"rk": -1}}},
            "top3": {"$topN": {"output": "$o_orderkey",
                               "sortBy": {"rk": -1}, "n": 3}},
            "cheapest2": {"$minN": {"input": "$cents", "n": 2}},
        }},
    ])
    return out.select(
        "_id", "best_order",
        F.to_json("top3").alias("top3"),
        F.to_json("cheapest2").alias("cheapest2"))


Q180_SQL = """
WITH o AS (SELECT o_custkey, o_orderkey,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT)
                    * 4294967296 + o_orderkey AS rk
           FROM orders),
r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY rk DESC) AS rn,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY cents, o_orderkey) AS rn_min
      FROM o)
SELECT o_custkey AS _id,
       arg_max(o_orderkey, rk) AS best_order,
       CAST(to_json(list(o_orderkey ORDER BY rk DESC)
                    FILTER (WHERE rn <= 3)) AS VARCHAR) AS top3,
       CAST(to_json(list(cents ORDER BY cents, o_orderkey)
                    FILTER (WHERE rn_min <= 2)) AS VARCHAR) AS cheapest2
FROM r GROUP BY 1
"""


# --- q181: correlated $lookup (let + pipeline, equality subset) -----------------
def q181_mongo_lookup_let(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order lineitem sub-aggregation via correlated ``$lookup``
    (``let`` + pipeline): the translator decompiles the leading
    ``$match`` ``$expr`` equality into ONE left equi-join against a
    per-key pre-aggregated foreign side — the sub-pipeline runs once
    over lineitem, never per order (Mongo re-executes it per document;
    the equality correlation makes per-key grouping equivalent).
    Oracle is a genuine DuckDB CORRELATED SUBQUERY, so the comparison
    exercises the rewrite, not a shared join plan. l_quantity is
    whole-valued in the fixture, so the double sum is exact and
    hash-stable across engines."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderpriority": "1-URGENT"}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"ok": "$o_orderkey"},
            "pipeline": [
                {"$match": {"$expr": {"$and": [
                    {"$eq": ["$$ok", "$l_orderkey"]},
                    {"$gt": ["$l_quantity", 25]},
                ]}}},
                {"$group": {"_id": None,
                            "n": {"$sum": 1},
                            "qty": {"$sum": "$l_quantity"}}},
            ],
            "as": "big"}},
        {"$addFields": {
            "n_big": {"$ifNull": [{"$arrayElemAt": ["$big.n", 0]}, 0]},
            "qty_big": {"$ifNull": [{"$arrayElemAt": ["$big.qty", 0]},
                                    0.0]}}},
    ], collections={"lineitem": lineitem})
    return out.select("o_orderkey", "n_big", "qty_big")


Q181_SQL = """
SELECT o_orderkey,
       CAST((SELECT count(*) FROM lineitem
             WHERE l_orderkey = o_orderkey AND l_quantity > 25)
            AS BIGINT) AS n_big,
       CAST(COALESCE((SELECT sum(l_quantity) FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 25),
                     0.0) AS DOUBLE) AS qty_big
FROM orders
WHERE o_orderpriority = '1-URGENT'
"""


# --- q182: $merge whenMatched update pipeline (conflict-increment) --------------
def q182_mongo_merge_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo's conflict-increment idiom: ``$merge`` with a
    ``whenMatched`` UPDATE PIPELINE (``$set`` + ``$$new``) that adds
    the incoming batch's counters onto the existing target row instead
    of replacing it. Seed per-customer counters from 'F'-status orders
    via ``$out``, then merge the 'O'-status aggregation with
    ``{$set: {n: {$add: ["$n", "$$new.n"]}, ...}}`` — lowered to one
    inner join + column expressions + ONE snapshot merge commit
    (sources/mongoql/writes.py::_merge_update_pipeline), never a per-doc
    update loop. DECIMAL sums for cross-engine hash stability; the
    oracle reproduces the final state as a FULL OUTER join."""
    import tempfile

    orders = load_table(spark, "orders", sf_dir).withColumn(
        "price_d", F.col("o_totalprice").cast("decimal(18,2)"))
    path = f"{tempfile.mkdtemp(prefix='q182_')}/cnt"
    targets = {"cnt": path}
    apply_pipeline(orders, [
        {"$match": {"o_orderstatus": "F"}},
        {"$group": {"_id": "$o_custkey", "n": {"$sum": 1},
                    "spend": {"$sum": "$price_d"}}},
        {"$out": "cnt"},
    ], targets=targets)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderstatus": "O"}},
        {"$group": {"_id": "$o_custkey", "n": {"$sum": 1},
                    "spend": {"$sum": "$price_d"}}},
        {"$merge": {"into": "cnt", "on": "_id",
                    "whenMatched": [{"$set": {
                        "n": {"$add": ["$n", "$$new.n"]},
                        "spend": {"$add": ["$spend", "$$new.spend"]}}}],
                    "whenNotMatched": "insert"}},
    ], targets=targets)
    return out.select(
        "_id", "n",
        F.round(F.col("spend").cast("double"), 2).alias("spend"))


Q182_SQL = """
WITH seed AS (
  SELECT o_custkey AS _id, count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
b AS (
  SELECT o_custkey AS _id, count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
SELECT COALESCE(s._id, b._id) AS _id,
       CAST(COALESCE(s.n, 0) + COALESCE(b.n, 0) AS BIGINT) AS n,
       round(CAST(COALESCE(s.spend, 0) + COALESCE(b.spend, 0)
                  AS DOUBLE), 2) AS spend
FROM seed s FULL OUTER JOIN b ON s._id = b._id
"""


# --- q183: calendar range window (trailing 3 months) ----------------------------
def q183_mongo_calendar_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-month revenue per order priority — ``$setWindowFields``
    with a CALENDAR range unit (``{range: [-2, 0], unit: "month"}``):
    per-month revenue via ``$dateTrunc``+``$group`` (so sort values are
    month-aligned, the calendar-frame contract), then the window runs on
    the months-since-epoch integer key — one shuffle for the group, one
    for the window partition, no self-join. Oracle uses DuckDB's native
    variable-width frame (RANGE BETWEEN INTERVAL 2 MONTH PRECEDING),
    i.e. Mongo's exact semantics — the gate proves the months-key
    lowering matches it on aligned data. DECIMAL sums for hash
    stability."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "price_d", F.col("o_totalprice").cast("decimal(18,2)"))
    out = apply_pipeline(orders, [
        {"$group": {"_id": {"pri": "$o_orderpriority",
                            "m": {"$dateTrunc": {"date": "$o_orderdate",
                                                 "unit": "month"}}},
                    "rev": {"$sum": "$price_d"}}},
        {"$addFields": {"pri": "$_id.pri", "m": "$_id.m"}},
        {"$setWindowFields": {
            "partitionBy": "$pri", "sortBy": {"m": 1},
            "output": {"rev3": {"$sum": "$rev",
                                "window": {"range": [-2, 0],
                                           "unit": "month"}}}}},
    ])
    return out.select(
        "pri", F.col("m").cast("date").alias("m"),
        F.round(F.col("rev").cast("double"), 2).alias("rev"),
        F.round(F.col("rev3").cast("double"), 2).alias("rev3"))


Q183_SQL = """
WITH monthly AS (
  SELECT o_orderpriority AS pri,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1, 2)
SELECT pri, m,
       round(CAST(rev AS DOUBLE), 2) AS rev,
       round(CAST(sum(rev) OVER (
           PARTITION BY pri ORDER BY m
           RANGE BETWEEN INTERVAL 2 MONTH PRECEDING AND CURRENT ROW)
         AS DOUBLE), 2) AS rev3
FROM monthly
"""


# --- q184: correlated $lookup, general path (non-equi conjunct) -----------------
def q184_mongo_lookup_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated ``$lookup`` through the GENERAL distinct-let-tuples
    path: the non-equi conjunct (lineitem price above HALF of this
    order's own total — a per-document threshold) cannot fold into the
    equality join, so the translator materializes distinct (orderkey,
    threshold) tuples, equi-joins them to lineitem, filters post-join,
    and aggregates per tuple (sources/mongoql/lookup.py::_correlated_lookup,
    the Neumann-Kemper unnesting rewrite). Oracle is a genuine DuckDB
    correlated subquery. 0.5*price is exact in double, so the strict >
    compare is engine-stable."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderpriority": "2-HIGH"}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"ok": "$o_orderkey",
                    "thr": {"$multiply": ["$o_totalprice", 0.5]}},
            "pipeline": [
                {"$match": {"$expr": {"$and": [
                    {"$eq": ["$$ok", "$l_orderkey"]},
                    {"$gt": ["$l_extendedprice", "$$thr"]},
                ]}}},
                {"$group": {"_id": None, "n": {"$sum": 1}}},
            ],
            "as": "big"}},
        {"$addFields": {
            "n_big": {"$ifNull": [{"$arrayElemAt": ["$big.n", 0]}, 0]}}},
    ], collections={"lineitem": lineitem})
    return out.select("o_orderkey", "n_big")


Q184_SQL = """
SELECT o_orderkey,
       CAST((SELECT count(*) FROM lineitem
             WHERE l_orderkey = o_orderkey
               AND l_extendedprice > 0.5 * o_totalprice)
            AS BIGINT) AS n_big
FROM orders
WHERE o_orderpriority = '2-HIGH'
"""


# --- q185: $integral window (trapezoid AUC over hourly series) -------------------
def q185_mongo_integral_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running area-under-curve of per-hour event value with the
    ``$integral`` window operator (Mongo 5.0): hourly pre-aggregation
    (cents — integer-valued doubles, so trapezoids are exact halves and
    the running sum is bit-stable under ANY summation association),
    then one lag-pair increment column + one frame sum — two chained
    Window operators on a single exchange, no self-join. Oracle mirrors
    the trapezoid algebra with explicit lag/sum windows in DuckDB."""
    events = load_table(spark, "events", sf_dir)
    out = apply_pipeline(events, [
        {"$group": {"_id": {"u": "$user_id",
                            "h": {"$dateTrunc": {"date": "$ts",
                                                 "unit": "hour"}}},
                    "cents": {"$sum": {"$round": [
                        {"$multiply": ["$value", 100]}, 0]}}}},
        {"$addFields": {"u": "$_id.u", "h": "$_id.h"}},
        {"$setWindowFields": {
            "partitionBy": "$u", "sortBy": {"h": 1},
            "output": {"auc": {"$integral": {"input": "$cents",
                                             "unit": "hour"},
                               "window": {"documents": ["unbounded",
                                                        "current"]}}}}},
    ])
    return out.select("u", "h", F.col("cents").cast("double").alias("cents"),
                      F.col("auc").cast("double").alias("auc"))


Q185_SQL = """
WITH hourly AS (
  SELECT user_id AS u, date_trunc('hour', ts) AS h,
         sum(round(value * 100, 0)) AS cents
  FROM events GROUP BY 1, 2),
w AS (SELECT u, h, cents,
             lag(h) OVER (PARTITION BY u ORDER BY h) AS ph,
             lag(cents) OVER (PARTITION BY u ORDER BY h) AS pc
      FROM hourly)
SELECT u, h, CAST(cents AS DOUBLE) AS cents,
       CAST(sum(CASE WHEN ph IS NULL THEN 0
                     ELSE (epoch(h) - epoch(ph)) / 3600.0
                          * (cents + pc) / 2 END)
            OVER (PARTITION BY u ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS auc
FROM w
"""


# --- q186: scalar expression family ($convert/$cmp/$strcasecmp/ISO dates) -------
def q186_mongo_scalar_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level scalar expression sweep over orders gating the r12
    expression additions in one projection — ``$convert`` (try_cast
    with onError/onNull), ``$cmp`` sign compare, ``$strcasecmp``,
    ``$isoWeekYear`` (Thursday trick) and ``$isoWeek`` — all pure
    column expressions inside whole-stage codegen, zero shuffles."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$addFields": {
            "pr_num": {"$convert": {
                "input": {"$substrCP": ["$o_orderpriority", 0, 1]},
                "to": "int", "onError": -1, "onNull": 0}},
            "sgn": {"$cmp": ["$o_totalprice", 150000.0]},
            "sc": {"$strcasecmp": ["$o_orderstatus", "f"]},
            "iwy": {"$isoWeekYear": "$o_orderdate"},
            "iw": {"$isoWeek": "$o_orderdate"},
        }},
    ])
    return out.select("o_orderkey", "pr_num", "sgn", "sc", "iwy", "iw")


Q186_SQL = """
SELECT o_orderkey,
       CAST(substr(o_orderpriority, 1, 1) AS INT) AS pr_num,
       CASE WHEN o_totalprice < 150000.0 THEN -1
            WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS sgn,
       CASE WHEN upper(o_orderstatus) < 'F' THEN -1
            WHEN upper(o_orderstatus) > 'F' THEN 1 ELSE 0 END AS sc,
       CAST(isoyear(o_orderdate) AS INT) AS iwy,
       CAST(week(o_orderdate) AS INT) AS iw
FROM orders
"""


# --- q187: $match query-operator language ($regex/$not/$nor/$mod) ---------------
def q187_mongo_match_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate the ``$match`` query-operator language over documents:
    ``$regex`` with ``$options`` (one JVM RLIKE — inline flags),
    ``$mod``, and the null-including negations ``$not``/``$nor``
    (Mongo matches docs where the clause FAILS, nulls included —
    lowered as coalesce(NOT cond, true) so Spark's null filtering
    can't silently drop rows). Pure pushable filters, zero shuffles."""
    docs = load_table(spark, "documents", sf_dir)
    out = apply_pipeline(docs, [
        {"$match": {"text": {"$regex": "spark.*window", "$options": "i"},
                    "doc_id": {"$mod": [7, 3]}}},
        {"$match": {"$nor": [{"lang": "en"},
                             {"n_chars": {"$lt": 130}}]}},
    ])
    return out.select("doc_id", "lang", "n_chars")


Q187_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE regexp_matches(text, '(?i)spark.*window')
  AND doc_id % 7 = 3
  AND COALESCE(NOT (lang = 'en'), TRUE)
  AND COALESCE(NOT (n_chars < 130), TRUE)
"""


# --- q188: array-valued $match operators ($all/$size/$elemMatch) ----------------
def q188_mongo_array_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate the ARRAY query operators over a words column built with
    ``$split``: ``$all`` (conjunction of array_contains), ``$size``
    comparison via ``$expr``, and ``$elemMatch`` with a ``$regex``
    element predicate (one exists() lambda — no explode, no shuffle).
    The words array itself never reaches the output (the no-array
    output gate), only scalar summaries do."""
    docs = load_table(spark, "documents", sf_dir)
    out = apply_pipeline(docs, [
        {"$addFields": {"words": {"$split": ["$text", " "]}}},
        {"$match": {"words": {"$all": ["spark", "join"]}}},
        {"$match": {"words": {"$elemMatch": {"$regex": "^wind"}}}},
        {"$addFields": {"n_words": {"$size": "$words"}}},
        {"$match": {"n_words": {"$gte": 20}}},
    ])
    return out.select("doc_id", "lang", "n_words")


Q188_SQL = """
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words
FROM documents
WHERE list_contains(string_split(text, ' '), 'spark')
  AND list_contains(string_split(text, ' '), 'join')
  AND EXISTS (SELECT 1 FROM unnest(string_split(text, ' ')) AS t(w)
              WHERE regexp_matches(w, '^wind'))
  AND len(string_split(text, ' ')) >= 20
"""


# --- q189: $sortArray + $slice array pipeline --------------------------------
def q189_mongo_sort_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$sortArray`` (Mongo 5.2) + ``$slice`` over the $split words
    column: the top-3 lexicographically-greatest words per document,
    JSON-stringified in the final projection on both engines (the
    no-array-output discipline). Binary UTF8 string ordering matches
    DuckDB's default varchar collation, so the gate is exact."""
    docs = load_table(spark, "documents", sf_dir)
    out = apply_pipeline(docs, [
        {"$addFields": {"words": {"$split": ["$text", " "]}}},
        {"$addFields": {"top3": {"$slice": [
            {"$sortArray": {"input": "$words", "sortBy": -1}}, 3]}}},
    ])
    return out.select("doc_id", F.to_json("top3").alias("top3"))


Q189_SQL = """
SELECT doc_id,
       CAST(to_json(list_slice(list_sort(string_split(text, ' '), 'DESC'),
                               1, 3)) AS VARCHAR) AS top3
FROM documents
"""


# --- q190: $redact with in-pipeline document literals ----------------------------
def q190_mongo_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$redact`` end-to-end over orders: tag each order and an
    embedded detail sub-document (document LITERAL in $addFields) with
    security levels, then redact with the canonical
    ``$cond -> $$DESCEND/$$PRUNE`` expression — low-level roots drop
    (row filter), low-level sub-documents null out, all in plan-time
    compiled column expressions (sources/mongoql/stages.py::_redact). The
    surviving detail's price projects through the possibly-null struct,
    which the oracle reproduces with a plain CASE."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$addFields": {
            "level": {"$cond": [{"$gte": ["$o_totalprice", 150000.0]},
                                5, 1]},
            "detail": {
                "level": {"$cond": [{"$eq": ["$o_orderstatus", "O"]},
                                    5, 1]},
                "price": "$o_totalprice"},
        }},
        {"$redact": {"$cond": [{"$gte": ["$level", 5]},
                               "$$DESCEND", "$$PRUNE"]}},
    ])
    return out.select("o_orderkey", "level",
                      F.col("detail.price").alias("dprice"))


Q190_SQL = """
SELECT o_orderkey, 5 AS level,
       CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS dprice
FROM orders
WHERE o_totalprice >= 150000.0
"""


# --- q191: $top output $$ROOT (best-document-per-group idiom) -------------------
def q191_mongo_top_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The best-document-per-group idiom: ``$group`` with
    ``$top {output: "$$ROOT", sortBy: ...}`` keeps the WHOLE winning
    document per order priority — one max_by on a tie-immune packed
    key (cents<<32 | orderkey), no row_number shuffle, the stage-level
    ``$$ROOT`` binding making the document a struct. Scalars project
    out of the struct for the gate; oracle is DuckDB arg_max over the
    same packed key."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    out = apply_pipeline(orders, [
        {"$addFields": {"rk": {"$add": [
            {"$multiply": ["$cents", 4294967296]}, "$o_orderkey"]}}},
        {"$group": {"_id": "$o_orderpriority",
                    "best": {"$top": {"output": "$$ROOT",
                                      "sortBy": {"rk": -1}}},
                    "n": {"$sum": 1}}},
    ])
    return out.select(
        F.col("_id").alias("priority"), "n",
        F.col("best.o_orderkey").alias("best_order"),
        F.col("best.cents").cast("double").alias("best_cents"),
        F.col("best.o_orderstatus").alias("best_status"))


Q191_SQL = """
WITH o AS (SELECT *, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders),
r AS (SELECT *, cents * 4294967296 + o_orderkey AS rk FROM o)
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n,
       arg_max(o_orderkey, rk) AS best_order,
       CAST(arg_max(cents, rk) AS DOUBLE) AS best_cents,
       arg_max(o_orderstatus, rk) AS best_status
FROM r GROUP BY 1
"""


# --- q192: $documents literal source + $unionWith + $group ----------------------
def q192_mongo_documents_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$documents`` (collectionless literal source) seeding region
    aliases, ``$unionWith`` pulling the real region table through a
    sub-pipeline, and one ``$group`` over the heterogeneous union —
    absent fields NULL on the rectangular side, Mongo's rule. The
    oracle builds the same literals with VALUES."""
    region = load_table(spark, "region", sf_dir)
    out = apply_pipeline(spark.range(1), [
        {"$documents": [
            {"r_name": "AFRICA", "bonus": 10},
            {"r_name": "EUROPE", "bonus": 20},
            {"r_name": "ATLANTIS", "bonus": 99},
        ]},
        {"$unionWith": {"coll": "region",
                        "pipeline": [{"$project": {"r_name": 1,
                                                   "r_regionkey": 1}}]}},
        {"$group": {"_id": "$r_name",
                    "n": {"$sum": 1},
                    "bonus_max": {"$max": "$bonus"},
                    "key_max": {"$max": "$r_regionkey"}}},
    ], collections={"region": region})
    return out.select(F.col("_id").alias("r_name"), "n", "bonus_max",
                      "key_max")


Q192_SQL = """
WITH lits(r_name, bonus) AS (
  VALUES ('AFRICA', 10), ('EUROPE', 20), ('ATLANTIS', 99)),
u AS (
  SELECT r_name, bonus, NULL::BIGINT AS r_regionkey FROM lits
  UNION ALL
  SELECT r_name, NULL, r_regionkey FROM region)
SELECT r_name, CAST(count(*) AS BIGINT) AS n,
       CAST(max(bonus) AS BIGINT) AS bonus_max,
       max(r_regionkey) AS key_max
FROM u GROUP BY 1
"""


# --- q193: $merge whenMatched update pipeline on a LIVE JDBC target -------------
def q193_mongo_merge_jdbc_pipeline(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The reference's actual sink is live Postgres (ref
    user_table.py:105-121); this gates ``$merge`` with a
    ``whenMatched`` UPDATE PIPELINE against a LIVE JDBC database
    (embedded Derby, ansi dialect — the same statement shape ships as
    Postgres ``ON CONFLICT`` via dialect='postgres'): the ``$set``
    pipeline compiles into the SET clause of the ONE server-side
    staging+MERGE statement (sources/mongoql/writes.py::_compile_merge_set_sql)
    — conflict-increment ($add) and running-max ($cond) run inside the
    database transaction, no read-modify-write round trip, no per-row
    loop. All metrics are integer cents, so every engine computes
    exact BIGINT arithmetic and the oracle (a FULL OUTER join
    reproducing the final table state) hash-matches bit-for-bit."""
    import tempfile

    cents_expr = {"$sum": {"$toLong": {"$round": [
        {"$multiply": ["$o_totalprice", 100]}, 0]}}}
    orders = load_table(spark, "orders", sf_dir)
    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='q193_')}/db;create=true"
    targets = {"cnt": {"kind": "jdbc", "url": url, "table": "q193cnt",
                       "dialect": "ansi"}}
    seed = [
        {"$match": {"o_orderstatus": "F"}},
        {"$group": {"_id": "$o_custkey", "n": {"$sum": 1},
                    "cents": cents_expr}},
        {"$addFields": {"mx": "$cents"}},
        {"$out": "cnt"},
    ]
    apply_pipeline(orders, seed, targets=targets)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderstatus": "O"}},
        {"$group": {"_id": "$o_custkey", "n": {"$sum": 1},
                    "cents": cents_expr}},
        {"$addFields": {"mx": "$cents"}},
        {"$merge": {"into": "cnt", "on": "_id",
                    "whenMatched": [{"$set": {
                        "n": {"$add": ["$n", "$$new.n"]},
                        "cents": {"$add": ["$cents", "$$new.cents"]},
                        "mx": {"$cond": [{"$gt": ["$$new.cents", "$mx"]},
                                         "$$new.cents", "$mx"]}}}],
                    "whenNotMatched": "insert"}},
    ], targets=targets)
    return out.select("_id", "n", "cents", "mx")


Q193_SQL = """
WITH seed AS (
  SELECT o_custkey AS _id, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
b AS (
  SELECT o_custkey AS _id, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
SELECT COALESCE(s._id, b._id) AS _id,
       CAST(COALESCE(s.n, 0) + COALESCE(b.n, 0) AS BIGINT) AS n,
       CAST(COALESCE(s.cents, 0) + COALESCE(b.cents, 0) AS BIGINT)
         AS cents,
       CAST(CASE WHEN s._id IS NULL THEN b.cents
                 WHEN b._id IS NULL THEN s.cents
                 WHEN b.cents > s.cents THEN b.cents
                 ELSE s.cents END AS BIGINT) AS mx
FROM seed s FULL OUTER JOIN b ON s._id = b._id
"""


# --- q195: correlated $lookup terminal $sort+$limit (latest match) ---------------
def q195_mongo_lookup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo's single most common correlated-$lookup idiom — 'latest
    matching doc per outer document' (sub-pipeline ending in ``$sort``
    + ``$limit: 1``): per urgent order, the lineitem with the max
    l_shipdate (extendedprice tiebreak). The translator splits the
    terminal suffix and lowers it to a per-KEY ordered top-1 —
    ``array_sort`` with a desc/asc comparator + ``slice`` on the packed
    array (sources/mongoql/lookup.py::_split_term_sort_limit) — so the limit
    is applied per outer document, NEVER globally: one equi-join + one
    groupBy, no window over the fact table, no per-doc subquery loop.
    Oracle uses a genuine row_number-over-partition top-1, so the
    comparison pins the per-key scoping. The tiebreak is the OUTPUT
    column itself (extendedprice), so even fixture rows duplicated on
    (orderkey, linenumber, shipdate) — they exist at sf0.1 — yield one
    deterministic result on both engines; price is a raw parquet
    double (no arithmetic)."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderpriority": "1-URGENT"}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"ok": "$o_orderkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$ok", "$l_orderkey"]}}},
                {"$sort": {"l_shipdate": -1, "l_extendedprice": 1}},
                {"$limit": 1}],
            "as": "last"}},
        {"$addFields": {
            "ship": {"$arrayElemAt": ["$last.l_shipdate", 0]},
            "price": {"$arrayElemAt": ["$last.l_extendedprice", 0]}}},
    ], collections={"lineitem": lineitem})
    return out.select("o_orderkey", "ship", "price")


Q195_SQL = """
SELECT o.o_orderkey, l.ship, l.price
FROM orders o LEFT JOIN (
  SELECT l_orderkey, l_shipdate AS ship, l_extendedprice AS price,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_shipdate DESC,
                                     l_extendedprice ASC) AS rn
  FROM lineitem) l
  ON l.l_orderkey = o.o_orderkey AND l.rn = 1
WHERE o.o_orderpriority = '1-URGENT'
"""


# --- q196: $regexFind / $regexFindAll extraction ---------------------------------
def q196_mongo_regex_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$regexFind``/``$regexFindAll`` (Mongo's structured regex
    extraction) over the documents corpus: first '[Ss]park <word>'
    occurrence (full match + capture group) and the total occurrence
    count — one projection of JVM regexp_extract/regexp_extract_all
    expressions inside whole-stage codegen, zero shuffles, filter-free
    scan. r14 adds the first match's per-match ``idx`` from
    $regexFindAll (the position walk that closed the deviation) —
    oracled via DuckDB ``strpos`` of the matched text, sound because
    for a context-free pattern the earliest literal occurrence of the
    FIRST match's text IS the match position (identical earlier text
    would itself have matched).
    The struct results are unpacked to scalar columns for the
    driver's hash canon (match/capture null when absent on BOTH
    engines via NULLIF('') on the oracle side)."""
    docs = load_table(spark, "documents", sf_dir)
    out = apply_pipeline(docs, [
        {"$addFields": {
            "f": {"$regexFind": {"input": "$text",
                                 "regex": "[Ss]park ([a-z]+)"}},
            "fa": {"$regexFindAll": {"input": "$text",
                                     "regex": "[Ss]park ([a-z]+)"}},
        }},
        {"$addFields": {
            "m": "$f.match",
            "w": {"$arrayElemAt": ["$f.captures", 0]},
            "cnt": {"$size": "$fa"},
            "i0": {"$arrayElemAt": ["$fa.idx", 0]},
        }},
    ])
    return out.select("doc_id", "m", "w",
                      F.col("cnt").cast("long").alias("cnt"),
                      F.col("i0").cast("long").alias("i0"))


Q196_SQL = """
SELECT doc_id,
       NULLIF(regexp_extract(text, '[Ss]park ([a-z]+)', 0), '') AS m,
       NULLIF(regexp_extract(text, '[Ss]park ([a-z]+)', 1), '') AS w,
       CAST(len(regexp_extract_all(text, '[Ss]park ([a-z]+)', 0))
            AS BIGINT) AS cnt,
       CAST(CASE WHEN regexp_extract(text, '[Ss]park ([a-z]+)', 0) <> ''
                 THEN strpos(text,
                             regexp_extract(text, '[Ss]park ([a-z]+)', 0))
                      - 1 END AS BIGINT) AS i0
FROM documents
"""


# --- q197: date-math family ($dateAdd/$dateSubtract/$dateDiff/$dateTrunc) --------
def q197_mongo_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate the date-math expression family in one projection over
    orders: ``$dateAdd`` (+3 months), ``$dateSubtract`` (-2 weeks),
    ``$dateDiff`` with Mongo's BOUNDARY-CROSSING month semantics
    (23:59 → 00:01 across a month edge counts 1 — DuckDB's date_diff
    counts partition boundaries, the same rule, so the oracle is
    native), and ``$dateTrunc`` to quarter. Pure column expressions in
    whole-stage codegen, zero shuffles, scan-linear."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$addFields": {
            "due": {"$dateAdd": {"startDate": "$o_orderdate",
                                 "unit": "month", "amount": 3}},
            "back": {"$dateSubtract": {"startDate": "$o_orderdate",
                                       "unit": "week", "amount": 2}},
            "age_m": {"$dateDiff": {"startDate": "$o_orderdate",
                                    "endDate": {"$toDate": "1998-12-01"},
                                    "unit": "month"}},
            "q": {"$dateTrunc": {"date": "$o_orderdate",
                                 "unit": "quarter"}},
        }},
    ])
    return out.select("o_orderkey", "due", "back",
                      F.col("age_m").cast("long").alias("age_m"),
                      F.col("q").cast("date").alias("q"))


Q197_SQL = """
SELECT o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) + INTERVAL 3 MONTH AS due,
       CAST(o_orderdate AS TIMESTAMP) - INTERVAL 14 DAY AS back,
       CAST(date_diff('month', o_orderdate, DATE '1998-12-01')
            AS BIGINT) AS age_m,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q
FROM orders
"""


# --- q194: $expMovingAvg window (exact sequential fold) --------------------------
def q194_mongo_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$expMovingAvg`` — the last ``$setWindowFields`` accumulator:
    hourly cents per user (integer-valued doubles, the q185 idiom),
    then an N=3 (α=1/2 EXACTLY) EMA per (user, day) series. The
    lowering collects each partition sorted and folds the recurrence
    ema_i = α·x_i + (1-α)·ema_{i-1} left-to-right JVM-side
    (sources/mongoql/windows.py::_set_window_fields $expMovingAvg) — the SAME
    flop order as a sequential cursor walk, so with dyadic α and
    integer inputs every EMA value is an exact dyadic rational and the
    DuckDB recursive-CTE oracle (true row-by-row recurrence, ≤24
    iterations since partitions are day-bounded) matches bit-for-bit.
    O(partition)=O(24) state per key — Mongo's own partition bound."""
    events = load_table(spark, "events", sf_dir)
    out = apply_pipeline(events, [
        {"$group": {"_id": {"u": "$user_id",
                            "h": {"$dateTrunc": {"date": "$ts",
                                                 "unit": "hour"}}},
                    "cents": {"$sum": {"$round": [
                        {"$multiply": ["$value", 100]}, 0]}}}},
        {"$addFields": {"u": "$_id.u", "h": "$_id.h",
                        "d": {"$dateTrunc": {"date": "$_id.h",
                                             "unit": "day"}}}},
        {"$setWindowFields": {
            "partitionBy": {"pu": "$u", "pd": "$d"},
            "sortBy": {"h": 1},
            "output": {"ema": {"$expMovingAvg": {"input": "$cents",
                                                 "N": 3}}}}},
    ])
    return out.select("u", "h",
                      F.col("cents").cast("double").alias("cents"),
                      F.col("ema").cast("double").alias("ema"))


Q194_SQL = """
WITH RECURSIVE hourly AS (
  SELECT user_id AS u, date_trunc('day', ts) AS d,
         date_trunc('hour', ts) AS h,
         sum(round(value * 100, 0)) AS cents
  FROM events GROUP BY 1, 2, 3),
base AS (
  SELECT u, d, h, CAST(cents AS DOUBLE) AS cents,
         row_number() OVER (PARTITION BY u, d ORDER BY h) AS rn
  FROM hourly),
r AS (
  SELECT u, d, h, cents, rn, cents AS ema FROM base WHERE rn = 1
  UNION ALL
  SELECT b.u, b.d, b.h, b.cents, b.rn,
         0.5 * b.cents + 0.5 * r.ema AS ema
  FROM base b JOIN r ON b.u = r.u AND b.d = r.d AND b.rn = r.rn + 1)
SELECT u, h, cents, ema FROM r
"""


# --- q199: correlated $lookup pagination ($sort+$skip+$limit) --------------------
def q199_mongo_lookup_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo's pagination idiom inside a correlated ``$lookup`` —
    sub-pipeline ending ``$sort + $skip + $limit`` (r14: terminal
    ``$skip`` joins the r13 top-k splitter): per urgent order, PAGE 2
    of its lineitems (skip 1, take 2) by shipdate desc. Lowered to a
    per-KEY ordered slice-after-offset — ``array_sort`` comparator +
    ``slice(start=skip+1)`` on the packed array
    (sources/mongoql/lookup.py::_split_term_sort_limit) — so the offset
    applies per outer document, NEVER globally: one equi-join + one
    groupBy, no window over the fact table. The oracle is a genuine
    row_number-over-partition rn IN (2,3), pinning the per-key scope.
    Sort keys (shipdate desc, extendedprice, linenumber) are exactly
    the output columns, so fixture rows duplicated on a natural key
    still yield one deterministic multiset on both engines; $unwind's
    drop-empty default reproduces the inner-join shape for orders with
    fewer than 2 matching lineitems."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderpriority": "1-URGENT"}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"ok": "$o_orderkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$ok", "$l_orderkey"]}}},
                {"$sort": {"l_shipdate": -1, "l_extendedprice": 1,
                           "l_linenumber": 1}},
                {"$skip": 1},
                {"$limit": 2}],
            "as": "pg"}},
        {"$unwind": {"path": "$pg"}},
        {"$addFields": {"ship": "$pg.l_shipdate",
                        "price": "$pg.l_extendedprice",
                        "ln": "$pg.l_linenumber"}},
    ], collections={"lineitem": lineitem})
    return out.select("o_orderkey", "ship", "price",
                      F.col("ln").cast("long").alias("ln"))


Q199_SQL = """
SELECT o.o_orderkey, l.ship, l.price, l.ln
FROM orders o JOIN (
  SELECT l_orderkey, l_shipdate AS ship, l_extendedprice AS price,
         CAST(l_linenumber AS BIGINT) AS ln,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_shipdate DESC,
                                     l_extendedprice ASC,
                                     l_linenumber ASC) AS rn
  FROM lineitem) l
  ON l.l_orderkey = o.o_orderkey AND l.rn IN (2, 3)
WHERE o.o_orderpriority = '1-URGENT'
"""


# --- q198: $geoNear haversine lowering -------------------------------------------
def q198_mongo_geonear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$geoNear`` — the r13 verdict's one high-frequency refused
    stage, now lowered to index-free haversine expression math
    (sources/mongoql/geo.py::_geo_near). Deterministic integer-grid
    coordinates derived from c_custkey become GeoJSON Point structs;
    the stage computes spherical METERS from a GeoJSON near point
    (Mongo's R = 6378.1 km constant), applies the ``query`` match +
    inclusive ``maxDistance`` on the RAW meters, and scales the output
    by ``distanceMultiplier`` to km. Distance is rounded to 6 dp (mm)
    on BOTH engines — JVM and DuckDB libm trig can differ in the last
    ulp, ~1e-10 m here, seven orders below the rounding grain. Pure
    per-row codegen math + one filter; scan-linear, shuffle-free until
    the nearest-first sort (TakeOrdered under the $geoNear+$limit
    idiom)."""
    cust = load_table(spark, "customer", sf_dir)
    pts = cust.withColumn(
        "loc", F.struct(
            F.lit("Point").alias("type"),
            F.array(
                ((F.col("c_custkey") * 37) % 360 - 180).cast("double"),
                ((F.col("c_custkey") * 53) % 160 - 80).cast("double"),
            ).alias("coordinates")))
    out = apply_pipeline(pts, [
        {"$geoNear": {
            "near": {"type": "Point", "coordinates": [12.5, 42.0]},
            "distanceField": "dist",
            "key": "loc",
            "query": {"c_mktsegment": "BUILDING"},
            "maxDistance": 6_000_000.0,
            "distanceMultiplier": 0.001,
        }},
    ])
    return out.select("c_custkey", F.round("dist", 6).alias("km"))


Q198_SQL = """
WITH pts AS (
  SELECT c_custkey, c_mktsegment,
         CAST((c_custkey * 37) % 360 - 180 AS DOUBLE) AS lon,
         CAST((c_custkey * 53) % 160 - 80 AS DOUBLE) AS lat
  FROM customer),
d AS (
  SELECT c_custkey, c_mktsegment,
         2 * asin(least(1.0, sqrt(
             pow(sin((radians(lat) - radians(42.0)) / 2), 2)
             + cos(radians(42.0)) * cos(radians(lat))
             * pow(sin((radians(lon) - radians(12.5)) / 2), 2)
         ))) * 6378100.0 AS m
  FROM pts)
SELECT c_custkey, round(m * 0.001, 6) AS km
FROM d WHERE c_mktsegment = 'BUILDING' AND m <= 6000000.0
"""


# --- q200: correlated-$lookup terminal $group with a grouping _id ---------------
def q200_mongo_lookup_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal ``$group`` with a GROUPING ``_id`` inside a correlated
    ``$lookup`` (r14) — 'order count + spend by (status, year) per
    BUILDING customer', Mongo's per-document sub-aggregation idiom.
    Lowered to ONE aggregation over (join key, _id expr) + a per-key
    pack (sources/mongoql/lookup.py::_correlated_lookup pack), never a
    per-document re-run: two shuffles total, no window over orders.
    The composite ``_id`` {s, yr} round-trips as a struct ('$g._id.s'
    downstream, exactly Mongo's contract); the $unwind re-flatten
    keeps the gated output rectangular. DECIMAL spend for value-hash
    stability; zero-order customers drop via $unwind's default
    (Mongo's zero-input $group emits no documents)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "price_d", F.col("o_totalprice").cast("decimal(18,4)"))
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "BUILDING"}},
        {"$lookup": {"from": "orders", "localField": "c_custkey",
                     "foreignField": "o_custkey",
                     "pipeline": [{"$group": {
                         "_id": {"s": "$o_orderstatus",
                                 "yr": {"$year": "$o_orderdate"}},
                         "n": {"$sum": 1},
                         "spend": {"$sum": "$price_d"}}}],
                     "as": "g"}},
        {"$unwind": "$g"},
        {"$addFields": {"status": "$g._id.s", "yr": "$g._id.yr",
                        "n": "$g.n", "spend": "$g.spend"}},
    ], collections={"orders": orders})
    return out.select(
        "c_custkey", "status", F.col("yr").cast("long").alias("yr"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("spend").cast("double"), 4).alias("spend"))


Q200_SQL = """
SELECT c.c_custkey, g.status, g.yr, g.n, g.spend
FROM customer c JOIN (
  SELECT o_custkey, o_orderstatus AS status,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(count(*) AS BIGINT) AS n,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                    AS DOUBLE), 4) AS spend
  FROM orders GROUP BY o_custkey, o_orderstatus, year(o_orderdate)) g
  ON g.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
"""


# --- q201: Sunday-week family + $dateFromParts carry -----------------------------
def q201_mongo_week_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r14 week-family close: ``$week`` (Mongo's Sunday-based
    week-of-year, week 0 before the first Sunday — NOT ISO),
    ``$dateTrunc`` unit=week honoring ``startOfWeek`` (default Sunday;
    Spark's own date_trunc is pinned Monday — the closed deviation),
    ``$dateDiff`` unit=week counting Sunday-boundary crossings from a
    fixed anchor, and ``$dateFromParts`` CARRYING out-of-range parts
    (month+12, day 0 -> last day of the prior month, Mongo's additive
    carry rule). All pure day-arithmetic column expressions in
    whole-stage codegen — zero shuffles, scan-linear; the oracle
    reproduces each closed form natively (DuckDB dayofweek is
    0=Sunday)."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$addFields": {
            "w": {"$week": "$o_orderdate"},
            "ws": {"$dateTrunc": {"date": "$o_orderdate",
                                  "unit": "week"}},
            "wm": {"$dateTrunc": {"date": "$o_orderdate", "unit": "week",
                                  "startOfWeek": "monday"}},
            "dw": {"$dateDiff": {"startDate": {"$toDate": "1995-06-04"},
                                 "endDate": "$o_orderdate",
                                 "unit": "week"}},
            "carried": {"$dateFromParts": {
                "year": {"$year": "$o_orderdate"},
                "month": {"$add": [{"$month": "$o_orderdate"}, 12]},
                "day": 0}},
        }},
    ])
    return out.select(
        "o_orderkey", F.col("w").cast("long").alias("w"),
        F.col("ws").cast("date").alias("ws"),
        F.col("wm").cast("date").alias("wm"),
        F.col("dw").cast("long").alias("dw"), "carried")


Q201_SQL = """
WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
SELECT o_orderkey,
       CAST(floor((dayofyear(d) + 6 - dayofweek(d)) / 7) AS BIGINT) AS w,
       d - CAST(dayofweek(d) AS INT) AS ws,
       d - CAST((dayofweek(d) + 6) % 7 AS INT) AS wm,
       CAST(((d - CAST(dayofweek(d) AS INT))
             - DATE '1995-06-04') / 7 AS BIGINT) AS dw,
       CAST(make_date(CAST(year(d) AS INT), 1, 1) AS TIMESTAMP)
           + to_months(CAST(month(d) + 11 AS INT)) + to_days(-1)
           AS carried
FROM o
"""


# --- q202: bitwise family + type introspection -----------------------------------
def q202_mongo_bitwise_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo 6.3 bitwise expression family ($bitAnd/$bitOr/$bitXor/
    $bitNot over the key columns — value-varying per row) and the
    type-introspection trio ($type/$isNumber/$isArray; static per
    column on a rectangular frame, so Catalyst folds the typeof CASE
    chain to a constant). Pure codegen expressions, zero shuffles,
    scan-linear; DuckDB's native &, |, xor(), ~ mirror the semantics
    on BIGINT exactly."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$addFields": {
            "band": {"$bitAnd": ["$o_orderkey", 255]},
            "bor": {"$bitOr": ["$o_orderkey", "$o_custkey"]},
            "bxor": {"$bitXor": ["$o_orderkey", "$o_custkey", 15]},
            "bnot": {"$bitNot": "$o_custkey"},
            "tprice": {"$type": "$o_totalprice"},
            "tstat": {"$type": "$o_orderstatus"},
            "isnum": {"$isNumber": "$o_totalprice"},
        }},
        {"$match": {"o_orderkey": {"$type": "number"}}},
    ])
    return out.select(
        "o_orderkey", F.col("band").cast("long").alias("band"),
        F.col("bor").cast("long").alias("bor"),
        F.col("bxor").cast("long").alias("bxor"),
        F.col("bnot").cast("long").alias("bnot"),
        "tprice", "tstat", "isnum")


Q202_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS band,
       CAST(o_orderkey | o_custkey AS BIGINT) AS bor,
       CAST(xor(xor(o_orderkey, o_custkey), 15) AS BIGINT) AS bxor,
       CAST(~o_custkey AS BIGINT) AS bnot,
       'double' AS tprice, 'string' AS tstat, TRUE AS isnum
FROM orders
"""


# --- q203: zoned date family ($dateTrunc/$hour/$dateToString w/ timezone) --------
def q203_mongo_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 timezone support, gated against DuckDB's ICU zone tables:
    every events timestamp is read as a UTC instant and presented in
    America/New_York — part getters in the {date, timezone} long form,
    zoned $dateTrunc (the zone's wall-clock midnight as a UTC
    instant), zoned $dateToString, and a zoned $dateDiff day count.
    The events fixture spans DST transitions, so both engines' IANA
    rules are exercised on both offsets (EST -5 / EDT -4). Scan-linear
    expression work; the from/to-UTC shifts are per-row JVM zone-rule
    lookups, no shuffle."""
    NY = "America/New_York"
    events = load_table(spark, "events", sf_dir)
    out = apply_pipeline(events, [
        {"$addFields": {
            "h_ny": {"$hour": {"date": "$ts", "timezone": NY}},
            "dow_ny": {"$dayOfWeek": {"date": "$ts", "timezone": NY}},
            "day_ny": {"$dateTrunc": {"date": "$ts", "unit": "day",
                                      "timezone": NY}},
            "s_ny": {"$dateToString": {"date": "$ts",
                                       "format": "%Y-%m-%d %H",
                                       "timezone": NY}},
            "dd_ny": {"$dateDiff": {"startDate": {"$toDate": "2024-01-01"},
                                    "endDate": "$ts", "unit": "day",
                                    "timezone": NY}},
        }},
    ])
    return out.select(
        "event_id", F.col("h_ny").cast("long").alias("h_ny"),
        F.col("dow_ny").cast("long").alias("dow_ny"), "day_ny", "s_ny",
        F.col("dd_ny").cast("long").alias("dd_ny"))


Q203_SQL = """
WITH w AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS utc,
         CAST(timezone('America/New_York',
              CAST(CAST(ts AS TIMESTAMP) AS TIMESTAMPTZ)) AS TIMESTAMP)
         AS wall
  FROM events)
SELECT event_id,
       CAST(hour(wall) AS BIGINT) AS h_ny,
       CAST(dayofweek(wall) + 1 AS BIGINT) AS dow_ny,
       CAST(timezone('America/New_York', date_trunc('day', wall))
            AS TIMESTAMP) AS day_ny,
       strftime(wall, '%Y-%m-%d %H') AS s_ny,
       CAST(date_trunc('day', wall)::DATE
            - (CAST(timezone('America/New_York',
                    CAST(TIMESTAMP '2024-01-01 00:00:00' AS TIMESTAMPTZ))
               AS TIMESTAMP))::DATE AS BIGINT) AS dd_ny
FROM w
"""


# --- q204: Extended JSON v2 ingest roundtrip --------------------------------------
def q204_ejson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MongoDB Extended JSON v2 ingest, hash-gated end-to-end: every
    orders row is rendered as the CANONICAL mongoexport document
    ({$oid}, {$date:{$numberLong}} millis, {$numberLong},
    {$numberDecimal}) with format_string, parsed back through
    try_parse_json -> VARIANT -> ejson_conform
    (functions/variantdoc.py::ejson_get), and must hash-match the
    original typed columns read straight off parquet — the oracle IS
    the identity, so any wrapper mis-unwrap, millis/seconds slip, or
    decimal drift fails the gate. Scan-linear: one render + one parse
    per row, variant byte-walking in codegen, zero UDFs, no shuffle."""
    from airflow_pipelines_from_mongo_to_postgres_spark.functions.variantdoc import (
        as_variant,
        ejson_conform,
    )

    orders = load_table(spark, "orders", sf_dir)
    line = F.format_string(
        '{"_id": {"$oid": "%s"}, "n": {"$numberLong": "%s"}, '
        '"ts": {"$date": {"$numberLong": "%s"}}, '
        '"amt": {"$numberDecimal": "%s"}, "tag": "%s"}',
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp"))
        .cast("string"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.col("o_orderstatus"))
    docs = orders.select(as_variant(line).alias("doc"))
    out = ejson_conform(docs, "doc", {
        "_id": ("$._id", "string"),
        "n": ("$.n", "long"),
        "ts": ("$.ts", "timestamp"),
        "amt": ("$.amt", "decimal(18,2)"),
        "tag": ("$.tag", "string"),
    })
    return out.select("_id", "n", "ts",
                      F.col("amt").cast("double").alias("amt"), "tag")


Q204_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS _id,
       CAST(o_custkey AS BIGINT) AS n,
       CAST(o_orderdate AS TIMESTAMP) AS ts,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amt,
       o_orderstatus AS tag
FROM orders
"""


# --- q205: correlated-$lookup terminal $bucket (per-document histogram) ----------
def q205_mongo_lookup_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal ``$bucket`` inside a correlated ``$lookup`` (r14): a
    spend histogram of each BUILDING customer's own orders — the
    bucket label is row-local, so the stage rewrites to
    $addFields($switch) + terminal grouping-_id $group
    (sources/mongoql/lookup.py::_bucket_as_group_stages) and rides the
    per-key pack: ONE aggregation over (custkey, bucket), one join,
    never a per-document re-run. Integer labels (no string default →
    no stringify), count-only output, $unwind re-flatten."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "BUILDING"}},
        {"$lookup": {"from": "orders", "localField": "c_custkey",
                     "foreignField": "o_custkey",
                     "pipeline": [{"$bucket": {
                         "groupBy": "$o_totalprice",
                         "boundaries": [0, 50000, 150000, 300000],
                         "default": -1,
                         "output": {"n": {"$sum": 1}}}}],
                     "as": "h"}},
        {"$unwind": "$h"},
        {"$addFields": {"bucket": "$h._id", "n": "$h.n"}},
    ], collections={"orders": orders})
    return out.select(
        "c_custkey", F.col("bucket").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n"))


Q205_SQL = """
SELECT c.c_custkey, g.bucket, g.n
FROM customer c JOIN (
  SELECT o_custkey,
         CAST(CASE WHEN o_totalprice >= 0 AND o_totalprice < 50000
                   THEN 0
                   WHEN o_totalprice >= 50000 AND o_totalprice < 150000
                   THEN 50000
                   WHEN o_totalprice >= 150000 AND o_totalprice < 300000
                   THEN 150000
                   ELSE -1 END AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2) g
  ON g.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
"""


# --- q206: $mergeObjects accumulator (sparse-doc collapse per key) ---------------
def q206_mongo_merge_objects_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$mergeObjects`` as a $group ACCUMULATOR (r14): collapse a
    sparse per-order document (status only when urgent / price only
    when low priority) to the FRESHEST non-null value per field per customer —
    $sort by (date, key) then merge in document order. Lowered to one
    max_by(field, non-null position) per field inside ONE aggregation
    (sources/mongoql/stages.py::_group) — no window, no self-join; the oracle
    is DuckDB's arg_max over a row_number, which skips null keys the
    same way. Documented rectangular deviation: SQL NULL counts as a
    missing field."""
    orders = load_table(spark, "orders", sf_dir)
    sparse = orders.withColumn(
        "doc", F.struct(
            F.when(F.col("o_orderpriority") == "1-URGENT",
                   F.col("o_orderstatus")).alias("urgent_status"),
            F.when(F.col("o_orderpriority") == "5-LOW",
                   F.col("o_totalprice").cast("decimal(18,2)"))
            .alias("low_price")))
    out = apply_pipeline(sparse, [
        {"$sort": {"o_orderdate": 1, "o_orderkey": 1}},
        {"$group": {"_id": "$o_custkey",
                    "n": {"$sum": 1},
                    "m": {"$mergeObjects": "$doc"}}},
    ])
    return out.select(
        F.col("_id").alias("c"), F.col("n").cast("long").alias("n"),
        F.col("m.urgent_status").alias("urgent_status"),
        F.col("m.low_price").cast("double").alias("low_price"))


Q206_SQL = """
WITH o AS (
  SELECT o_custkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderstatus END
           AS urgent_status,
         CASE WHEN o_orderpriority = '5-LOW'
              THEN CAST(o_totalprice AS DECIMAL(18,2)) END AS low_price,
         row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders)
SELECT o_custkey AS c, CAST(count(*) AS BIGINT) AS n,
       arg_max(urgent_status,
               CASE WHEN urgent_status IS NOT NULL THEN rn END)
         AS urgent_status,
       CAST(arg_max(low_price,
                    CASE WHEN low_price IS NOT NULL THEN rn END)
            AS DOUBLE) AS low_price
FROM o GROUP BY o_custkey
"""


# --- q207: correlated-$lookup terminal $sortByCount ------------------------------
def q207_mongo_lookup_sort_by_count(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Terminal ``$sortByCount`` inside a correlated ``$lookup``
    (r14): each BUILDING customer's order-status frequency table,
    packed (count desc, _id asc) per key — sugar rewritten onto the
    grouping-_id $group pack, ONE aggregation over (custkey, status)
    + one broadcast join. The $unwind's includeArrayIndex exposes the
    pack ORDER as a rank column, so the oracle's row_number over
    (count desc, status) verifies the ordering contract, not just the
    multiset."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "BUILDING"}},
        {"$lookup": {"from": "orders", "localField": "c_custkey",
                     "foreignField": "o_custkey",
                     "pipeline": [{"$sortByCount": "$o_orderstatus"}],
                     "as": "s"}},
        {"$unwind": {"path": "$s", "includeArrayIndex": "rk"}},
        {"$addFields": {"status": "$s._id", "n": "$s.count"}},
    ], collections={"orders": orders})
    return out.select(
        "c_custkey", "status", F.col("n").cast("long").alias("n"),
        F.col("rk").cast("long").alias("rk"))


Q207_SQL = """
SELECT c.c_custkey, g.status, g.n, g.rk
FROM customer c JOIN (
  SELECT o_custkey, o_orderstatus AS status,
         CAST(count(*) AS BIGINT) AS n,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY count(*) DESC, o_orderstatus)
              - 1 AS BIGINT) AS rk
  FROM orders GROUP BY o_custkey, o_orderstatus) g
  ON g.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
"""


# --- q208: $setWindowFields inside a correlated $lookup --------------------------
def q208_mongo_lookup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$setWindowFields`` INSIDE a correlated ``$lookup`` (r14):
    each MACHINERY customer's orders ranked by price with a running
    spend — a per-PARTITION stage made per-DOCUMENT by extending its
    partition key with the join keys
    (sources/mongoql/lookup.py::_augment_partitions), which is exact: every
    window partition is one customer's matched set. ONE window over
    the orders scan + one broadcast join; the oracle is the same
    window PARTITION BY o_custkey, pinning that nothing leaks across
    documents. DECIMAL running sum for hash stability; (price,
    orderkey) sort ties pinned by the key."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "price_d", F.col("o_totalprice").cast("decimal(18,2)"))
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "MACHINERY"}},
        {"$lookup": {"from": "orders", "localField": "c_custkey",
                     "foreignField": "o_custkey",
                     "pipeline": [
                         {"$setWindowFields": {
                             "sortBy": {"price_d": -1, "o_orderkey": 1},
                             "output": {
                                 "rk": {"$rank": {}},
                                 "run": {"$sum": "$price_d",
                                         "window": {"documents":
                                                    ["unbounded",
                                                     "current"]}}}}},
                         {"$project": {"o_orderkey": 1, "o_custkey": 1,
                                       "rk": 1, "run": 1}},
                         {"$sort": {"rk": 1}}],
                     "as": "s"}},
        {"$unwind": "$s"},
        {"$addFields": {"ok": "$s.o_orderkey", "rk": "$s.rk",
                        "run": "$s.run"}},
    ], collections={"orders": orders})
    return out.select(
        "c_custkey", F.col("ok").cast("long").alias("ok"),
        F.col("rk").cast("long").alias("rk"),
        F.col("run").cast("double").alias("run"))


Q208_SQL = """
SELECT c.c_custkey, g.ok, g.rk, g.run
FROM customer c JOIN (
  SELECT o_custkey, o_orderkey AS ok,
         CAST(rank() OVER w AS BIGINT) AS rk,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
              (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS run
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey
               ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                        o_orderkey)) g
  ON g.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'MACHINERY'
"""


# --- q209: correlated $lookup, $sort + ordered-accumulator $group ---------------
def q209_mongo_lookup_sort_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo's 'latest doc per key' idiom inside a correlated
    ``$lookup`` (r15): sub-pipeline ``$sort`` (multi-field, desc) then
    ``$group`` with ORDER-SENSITIVE accumulators — ``$first`` (the
    latest lineitem's shipdate and linenumber), an ordered ``$push``
    (quantities in sort order), and ``$sum``. The $sort is ABSORBED
    into the accumulators (sources/mongoql/stages.py::_group ``sort_spec``:
    $first compiles to $top, $push packs comparator-sorted), so the
    plan is ONE aggregation over the filtered foreign side + one
    equi-join — no global sort, no window over the fact table, no
    per-document re-run. Fixture rows can be DUPLICATED on the natural
    key (the q199 lesson, seen at sf0.1), so (shipdate, linenumber)
    ties are real — the translator's tie contract pins them by the
    pushed value ascending (whole-element comparator fallthrough), and
    the oracle appends the same final ORDER BY key. Quantities pushed
    as $toLong (they are whole-valued) so the JSON rendering is
    integer on both engines — the q180 to_json discipline."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderpriority": "1-URGENT"}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"ok": "$o_orderkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$ok", "$l_orderkey"]}}},
                {"$sort": {"l_shipdate": -1, "l_linenumber": -1}},
                {"$group": {"_id": None,
                            "latest_ship": {"$first": "$l_shipdate"},
                            "latest_ln": {"$first": "$l_linenumber"},
                            "qtys": {"$push": {"$toLong": "$l_quantity"}},
                            "n": {"$sum": 1}}}],
            "as": "agg"}},
        {"$unwind": {"path": "$agg"}},
    ], collections={"lineitem": lineitem})
    return out.select(
        "o_orderkey",
        F.col("agg.latest_ship").alias("latest_ship"),
        F.col("agg.latest_ln").cast("long").alias("latest_ln"),
        F.to_json("agg.qtys").alias("qtys"),
        F.col("agg.n").cast("long").alias("n"))


Q209_SQL = """
SELECT o.o_orderkey, l.latest_ship, l.latest_ln, l.qtys, l.n
FROM orders o JOIN (
  SELECT l_orderkey,
         first(l_shipdate ORDER BY l_shipdate DESC,
                                   l_linenumber DESC) AS latest_ship,
         CAST(first(l_linenumber ORDER BY l_shipdate DESC,
                                          l_linenumber DESC)
              AS BIGINT) AS latest_ln,
         CAST(to_json(list(CAST(l_quantity AS BIGINT)
                           ORDER BY l_shipdate DESC, l_linenumber DESC,
                                    CAST(l_quantity AS BIGINT) ASC))
              AS VARCHAR) AS qtys,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_orderkey) l
  ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
"""


# --- q210: correlated $lookup, MID-pipeline $sort+$limit ------------------------
def q210_mongo_lookup_mid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo's per-document 'top-k, then keep transforming' idiom —
    a MID-pipeline ``$sort`` + ``$limit`` inside a correlated
    ``$lookup``, followed by ``$addFields`` and an include-``$project``
    (so the run is NOT terminal and the r14 scope guard would have
    refused it). r15 lowering
    (sources/mongoql/lookup.py::_lower_mid_sort_limit): the run
    becomes a ``$documentNumber`` ranking window whose partition key
    ``_augment_partitions`` extends with the join key — per-document
    exact — and the rank rides as the internal ``__rn`` column so the
    packed array keeps the sort order through the later row-local
    stages (then is stripped). ONE shuffle: the window's
    hash-partitioning on l_orderkey is the same partitioning the pack
    groupBy needs. Plan-gated: no global Sort node. Price emitted as
    integer cents (the q180 discipline); (extendedprice desc,
    linenumber) ties can only be full-duplicate fixture rows, whose
    outputs are identical — one deterministic multiset on both
    engines."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    out = apply_pipeline(orders, [
        {"$match": {"o_orderpriority": "2-HIGH"}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"ok": "$o_orderkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$ok", "$l_orderkey"]}}},
                {"$sort": {"l_extendedprice": -1, "l_linenumber": 1}},
                {"$limit": 2},
                {"$addFields": {"cents": {"$toLong": {"$round": [
                    {"$multiply": ["$l_extendedprice", 100]}, 0]}}}},
                {"$project": {"cents": 1, "l_linenumber": 1,
                              "l_orderkey": 1}}],
            "as": "top"}},
        {"$unwind": {"path": "$top"}},
    ], collections={"lineitem": lineitem})
    return out.select(
        "o_orderkey",
        F.col("top.cents").alias("cents"),
        F.col("top.l_linenumber").cast("long").alias("ln"))


Q210_SQL = """
SELECT o.o_orderkey, l.cents, l.ln
FROM orders o JOIN (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CAST(l_linenumber AS BIGINT) AS ln,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC,
                                     l_linenumber ASC) AS rn
  FROM lineitem) l
  ON l.l_orderkey = o.o_orderkey AND l.rn <= 2
WHERE o.o_orderpriority = '2-HIGH'
"""


# --- q211: correlated $lookup, NON-terminal $group + top-k groups ----------------
def q211_mongo_lookup_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-terminal ``$group`` inside a correlated ``$lookup`` (r15 —
    the last refused $group position): per MACHINERY customer,
    aggregate orders by status, then ``$sort`` + ``$limit`` the GROUP
    OUTPUT docs — 'top-2 statuses by spend per customer'. The
    mid-group rewrite (sources/mongoql/lookup.py::_augment_partitions)
    groups ONCE over (join key, ``_id``) carrying the key as an
    internal ``__gk`` column, and the terminal suffix orders/slices
    the packed per-customer arrays — one aggregation + one pack +
    one broadcast join, no global sort, no per-document re-run.
    Totals as integer cents (q180 discipline); (total desc, _id asc)
    is tie-free per customer because _id IS the status."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "MACHINERY"}},
        {"$lookup": {
            "from": "orders",
            "let": {"k": "$c_custkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$k", "$o_custkey"]}}},
                {"$group": {"_id": "$o_orderstatus",
                            "total": {"$sum": {"$toLong": {"$round": [
                                {"$multiply": ["$o_totalprice", 100]},
                                0]}}},
                            "n": {"$sum": 1}}},
                {"$sort": {"total": -1, "_id": 1}},
                {"$limit": 2}],
            "as": "top"}},
        {"$unwind": {"path": "$top"}},
    ], collections={"orders": orders})
    return out.select(
        "c_custkey",
        F.col("top._id").alias("status"),
        F.col("top.total").alias("total"),
        F.col("top.n").cast("long").alias("n"))


Q211_SQL = """
SELECT c.c_custkey, g.status, g.total, g.n
FROM customer c JOIN (
  SELECT o_custkey, status, total, n,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY total DESC, status ASC) AS rn
  FROM (SELECT o_custkey, o_orderstatus AS status,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2)) g
  ON g.o_custkey = c.c_custkey AND g.rn <= 2
WHERE c.c_mktsegment = 'MACHINERY'
"""


# --- q212: correlated $lookup $bucketAuto (per-document equal-population) --------
def q212_mongo_lookup_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$bucketAuto`` inside a correlated ``$lookup`` (r15 — the last
    per-document stage refusal): each HOUSEHOLD customer's orders
    auto-bucketed into 4 ~equal-population totalprice buckets. Lowered
    with existing ops (sources/mongoql/lookup.py::_bucket_auto_as_stages):
    ONE ``$percentile`` window keyed by the join key gives every row
    its customer's exact quantile boundaries, a branch-free clamp
    assigns the bucket, and the terminal composite-``_id`` ``$group``
    packs per customer — no per-document re-run, no global sort, and
    the same exact-percentile contract the top-level ``$bucketAuto``
    gates (q176: bit-exact vs DuckDB quantile_cont). The oracle
    replays the identical algorithm in SQL (quantile_cont per key +
    list_filter clamp); boundaries rounded to 6 dp on both engines."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "HOUSEHOLD"}},
        {"$lookup": {
            "from": "orders",
            "let": {"k": "$c_custkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$k", "$o_custkey"]}}},
                {"$bucketAuto": {"groupBy": "$o_totalprice",
                                 "buckets": 4}}],
            "as": "b"}},
        {"$unwind": {"path": "$b"}},
    ], collections={"orders": orders})
    return out.select(
        "c_custkey",
        F.round(F.col("b._id.min"), 6).alias("lo"),
        F.round(F.col("b._id.max"), 6).alias("hi"),
        F.col("b.count").cast("long").alias("n"))


Q212_SQL = """
WITH m AS (
  SELECT c.c_custkey, CAST(o.o_totalprice AS DOUBLE) AS v
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'HOUSEHOLD'
), q AS (
  SELECT c_custkey,
         quantile_cont(v, [0.0, 0.25, 0.5, 0.75, 1.0]) AS bnd
  FROM m GROUP BY 1
), e AS (
  SELECT c_custkey, list_sort(list_distinct(bnd)) AS edges FROM q
), a AS (
  SELECT m.c_custkey, m.v, e.edges,
         GREATEST(LEAST(len(list_filter(e.edges, x -> m.v >= x)) - 1,
                        len(e.edges) - 2), 0) AS idx
  FROM m JOIN e ON e.c_custkey = m.c_custkey
)
SELECT c_custkey,
       round(edges[idx + 1], 6) AS lo,
       round(CASE WHEN len(edges) <= 1 THEN edges[idx + 1]
                  ELSE edges[idx + 2] END, 6) AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM a GROUP BY 1, 2, 3
"""


# --- q213: top-level $bucketAuto with granularity (preferred-number snap) ------
def q213_mongo_bucket_auto_gran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$bucketAuto`` with ``granularity: "R5"`` — percentile
    boundaries snap UP to the Renard series and the first bucket's min
    snaps DOWN (driver-side math over the collected scalars,
    ``stages._gran_round``; the percentile aggregate itself stays
    distributed, the driver sees <= buckets+1 scalars). The oracle
    replays the IDENTICAL snap in SQL: same candidate arithmetic
    (b * 10^(floor(log10(x)) + p), p in ±1) and the same 1e-9
    strictness tolerances — both engines call the same libm log10/pow,
    so the chosen series values are bit-identical; outputs rounded to
    6 dp anyway. At 100 TB: one sort-based percentile aggregate, then
    a branch-free running comparison — the same scaling shape as the
    granularity-less q176."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$bucketAuto": {"groupBy": "$o_totalprice", "buckets": 6,
                         "granularity": "R5"}}])
    return out.select(
        F.round(F.col("_id.min"), 6).alias("lo"),
        F.round(F.col("_id.max"), 6).alias("hi"),
        F.col("count").cast("long").alias("n"))


Q213_SQL = """
WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders),
agg AS (
  SELECT quantile_cont(x, [1.0/6, 2.0/6, 3.0/6, 4.0/6, 5.0/6]) AS bs,
         min(x) AS mn, max(x) AS mx
  FROM v),
pts AS (
  SELECT unnest(bs) AS x, 'up' AS dir, 'b' AS role FROM agg
  UNION ALL SELECT mn, 'down', 'lo' FROM agg
  UNION ALL SELECT mx, 'up', 'hi' FROM agg),
snapped AS (
  SELECT role,
    CASE WHEN dir = 'up'
         THEN list_min(list_filter(cands, c -> c > x * (1 + 1e-9)))
         ELSE coalesce(
            list_max(list_filter(cands, c -> c < x * (1 - 1e-9))),
            power(10.0, floor(log10(x)) - 2))
    END AS s
  FROM (SELECT role, dir, x,
          flatten(list_transform([-1.0, 0.0, 1.0], p ->
            list_transform([1.0, 1.6, 2.5, 4.0, 6.3], b ->
              b * power(10.0, floor(log10(x)) + p)))) AS cands
        FROM pts) t),
bnds AS (
  SELECT lo, hi,
         list_filter(rb0, b -> b > lo AND b < hi) AS rb,
         list_concat(list_concat(
             [lo], list_filter(rb0, b -> b > lo AND b < hi)), [hi])
           AS bounds
  FROM (SELECT
          (SELECT s FROM snapped WHERE role = 'lo') AS lo,
          (SELECT s FROM snapped WHERE role = 'hi') AS hi,
          (SELECT list_sort(list_distinct(list(s)))
           FROM snapped WHERE role = 'b') AS rb0)),
a AS (
  SELECT coalesce(len(list_filter(bn.rb, e -> v.x >= e)), 0) AS idx,
         bn.bounds
  FROM v, bnds bn)
SELECT round(bounds[idx + 1], 6) AS lo,
       round(bounds[idx + 2], 6) AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM a GROUP BY 1, 2
"""


# --- q214: correlated $lookup $bucketAuto with granularity (column snap) --------
def q214_mongo_lookup_bucket_gran(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """``$bucketAuto`` with ``granularity: "POWERSOF2"`` INSIDE a
    correlated ``$lookup`` (r16 — the refusal deleted): each MACHINERY
    customer's order totals bucketed to power-of-two bounds. The snap
    runs as a COLUMN expression over the per-key percentile boundary
    array (``expr._gran_snap_edges`` via the internal ``$__granSnap``
    op — no driver-side series table, no per-key collect), so the plan
    keeps q212's shape: ONE join-key-partitioned percentile window +
    clamp + pack. The oracle replays the snap per key in SQL
    (power(2, floor/ceil(log2 ± 1e-9) ± 1)); the 1e-9 tolerance
    swamps the <= 1-ulp log2 difference between the JVM and libm, so
    the chosen bounds agree; 6 dp rounding on both engines."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(cust, [
        {"$match": {"c_mktsegment": "MACHINERY"}},
        {"$lookup": {
            "from": "orders",
            "let": {"k": "$c_custkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$k", "$o_custkey"]}}},
                {"$bucketAuto": {"groupBy": "$o_totalprice",
                                 "buckets": 4,
                                 "granularity": "POWERSOF2"}}],
            "as": "b"}},
        {"$unwind": {"path": "$b"}},
    ], collections={"orders": orders})
    return out.select(
        "c_custkey",
        F.round(F.col("b._id.min"), 6).alias("lo"),
        F.round(F.col("b._id.max"), 6).alias("hi"),
        F.col("b.count").cast("long").alias("n"))


Q214_SQL = """
WITH m AS (
  SELECT c.c_custkey, CAST(o.o_totalprice AS DOUBLE) AS v
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'MACHINERY'
), q AS (
  SELECT c_custkey,
         quantile_cont(v, [0.0, 0.25, 0.5, 0.75, 1.0]) AS bnd
  FROM m GROUP BY 1
), e AS (
  SELECT c_custkey,
         power(2.0, ceil(log2(bnd[1]) - 1e-9) - 1) AS lo,
         power(2.0, floor(log2(bnd[5]) + 1e-9) + 1) AS hi,
         list_sort(list_distinct(list_transform(bnd[2:4], b ->
             power(2.0, floor(log2(b) + 1e-9) + 1)))) AS rb0
  FROM q
), e2 AS (
  SELECT c_custkey,
         list_concat(list_concat(
             [lo], list_filter(rb0, b -> b > lo AND b < hi)), [hi])
           AS edges
  FROM e
), a AS (
  SELECT m.c_custkey, m.v, e2.edges,
         GREATEST(LEAST(len(list_filter(e2.edges, x -> m.v >= x)) - 1,
                        len(e2.edges) - 2), 0) AS idx
  FROM m JOIN e2 USING (c_custkey)
)
SELECT c_custkey,
       round(edges[idx + 1], 6) AS lo,
       round(edges[idx + 2], 6) AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM a GROUP BY 1, 2, 3
"""


# --- q215: $setWindowFields calendar QUARTER/YEAR range units -------------------
def q215_mongo_quarter_year_window(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Trailing-1-quarter and trailing-1-year revenue per order
    priority — calendar range units beyond month (``unit: "quarter"``
    scales the months-since-epoch key by 3, ``"year"`` by 12; q183
    gates the month unit). Same shape: month-aligned sort values via
    ``$dateTrunc``+``$group``, then ONE window partition — the oracle
    uses DuckDB's native variable-width INTERVAL frames (Mongo's exact
    semantics), proving the scaled months-key lowering matches them on
    aligned data. DECIMAL sums for hash stability."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "price_d", F.col("o_totalprice").cast("decimal(18,2)"))
    out = apply_pipeline(orders, [
        {"$group": {"_id": {"pri": "$o_orderpriority",
                            "m": {"$dateTrunc": {"date": "$o_orderdate",
                                                 "unit": "month"}}},
                    "rev": {"$sum": "$price_d"}}},
        {"$addFields": {"pri": "$_id.pri", "m": "$_id.m"}},
        {"$setWindowFields": {
            "partitionBy": "$pri", "sortBy": {"m": 1},
            "output": {
                "revq": {"$sum": "$rev",
                         "window": {"range": [-1, 0],
                                    "unit": "quarter"}},
                "revy": {"$sum": "$rev",
                         "window": {"range": [-1, 0],
                                    "unit": "year"}}}}},
    ])
    return out.select(
        "pri", F.col("m").cast("date").alias("m"),
        F.round(F.col("rev").cast("double"), 2).alias("rev"),
        F.round(F.col("revq").cast("double"), 2).alias("revq"),
        F.round(F.col("revy").cast("double"), 2).alias("revy"))


Q215_SQL = """
WITH monthly AS (
  SELECT o_orderpriority AS pri,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1, 2)
SELECT pri, m,
       round(CAST(rev AS DOUBLE), 2) AS rev,
       round(CAST(sum(rev) OVER (
           PARTITION BY pri ORDER BY m
           RANGE BETWEEN INTERVAL 3 MONTH PRECEDING AND CURRENT ROW)
         AS DOUBLE), 2) AS revq,
       round(CAST(sum(rev) OVER (
           PARTITION BY pri ORDER BY m
           RANGE BETWEEN INTERVAL 12 MONTH PRECEDING AND CURRENT ROW)
         AS DOUBLE), 2) AS revy
FROM monthly
"""


# --- q217: partition-less $fill, DISTRIBUTED (locf + linear over raw rows) ------
def q217_mongo_fill_partitionless(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Whole-collection ``$fill`` over the RAW events table — a sensor
    back-fill: every 7th reading observed, the rest reconstructed by
    last-observation-carried-forward AND linear interpolation on the
    global ``event_id`` order. Exercises the r17 distributed lowering
    (``stages.py::_fill_partitionless``): range-bucket on the sort
    key's percentile boundaries (one agg, ≤ B-1 scalars), per-bucket
    ignore-nulls windows, cross-bucket boundary carry via a ≤ B-row
    summary + broadcast join — never the pre-r17 single-task window,
    so null runs straddle bucket boundaries by construction (run
    length 6 ≫ 0 at every SF). ``event_id`` is unique (tie-free sort,
    the determinism convention); the oracle replays the identical
    interpolation arithmetic on bit-identical doubles, rounded 6 dp
    per row (no sums — per-row outputs hash stably).

    Reference scope: gap handling in the reference is per-field
    defaulting only (`dags/includes/user_table.py:62-84`); series
    reconstruction is engine-declared scope."""
    ev = load_table(spark, "events", sf_dir)
    out = apply_pipeline(ev, [
        {"$addFields": {"obs": {"$cond": [
            {"$eq": [{"$mod": ["$event_id", 7]}, 0]},
            "$value", None]}}},
        {"$addFields": {"carried": "$obs", "interp": "$obs"}},
        {"$fill": {"sortBy": {"event_id": 1},
                   "output": {"carried": {"method": "locf"},
                              "interp": {"method": "linear"}}}},
    ])
    return out.select(
        "event_id",
        F.round(F.col("carried"), 6).alias("carried"),
        F.round(F.col("interp"), 6).alias("interp"))


Q217_SQL = """
WITH s AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN value END AS obs
  FROM events),
w AS (
  SELECT event_id, obs,
         last_value(obs IGNORE NULLS) OVER
           (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS carried,
         last_value(obs IGNORE NULLS) OVER
           (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING) AS pv,
         last_value(CASE WHEN obs IS NOT NULL
                         THEN CAST(event_id AS DOUBLE) END IGNORE NULLS)
           OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) AS pk,
         first_value(obs IGNORE NULLS) OVER
           (ORDER BY event_id ROWS BETWEEN 1 FOLLOWING
            AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN obs IS NOT NULL
                          THEN CAST(event_id AS DOUBLE) END IGNORE NULLS)
           OVER (ORDER BY event_id ROWS BETWEEN 1 FOLLOWING
                 AND UNBOUNDED FOLLOWING) AS nk
  FROM s)
SELECT event_id,
       round(carried, 6) AS carried,
       round(coalesce(obs,
             CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) *
                       (CAST(event_id AS DOUBLE) - pk) / (nk - pk)
             END), 6) AS interp
FROM w
"""


# --- q218: $lookup with ARRAY localField (any-element match, r17) ---------------
def q218_mongo_lookup_array_local(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """``$lookup`` on an ARRAY ``localField`` — Mongo's any-element
    match, lowered r17 (was a refusal): per-order distinct supplier
    region keys (``$addToSet`` + ``$filter`` leaves keys ≥ 3, so ~2/5
    of orders get MULTI-element arrays and a fraction get EMPTY ones),
    joined against nation on ``n_regionkey`` where every key matches
    FIVE nations (the dup-foreign-doc case). The lowering explodes
    (_id, element) pairs, equi-joins, re-packs per ``_id`` with
    collect_set + sort_array, and left-joins back — the outer frame
    never fans out and misses/empties come back ``[]``. Output reduces
    the pack with the r17 ``$sum``-over-``$map`` EXPRESSION form (no
    array columns leave the query). Empty packs: $size → 0, $sum → 0.

    Reference scope: the reference's only join is the surrogate-key
    existence probe (`dags/includes/utils.py:27-37`); any-element
    array joins are engine-declared scope."""
    li = load_table(spark, "lineitem", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    out = apply_pipeline(li, [
        {"$group": {"_id": "$l_orderkey",
                    "sks": {"$addToSet": {"$mod": ["$l_suppkey", 5]}}}},
        {"$addFields": {"rks": {"$filter": {
            "input": "$sks", "as": "k",
            "cond": {"$gte": ["$$k", 3]}}}}},
        {"$lookup": {"from": "nation", "localField": "rks",
                     "foreignField": "n_regionkey", "as": "ns"}},
        {"$project": {"_id": 1, "rk_n": {"$size": "$rks"},
                      "n_match": {"$size": "$ns"},
                      "key_sum": {"$sum": {"$map": {
                          "input": "$ns", "as": "s",
                          "in": "$$s.n_nationkey"}}}}},
    ], collections={"nation": nation})
    return out.select(
        F.col("_id").cast("long").alias("_id"),
        F.col("rk_n").cast("int").alias("rk_n"),
        F.col("n_match").cast("int").alias("n_match"),
        F.col("key_sum").cast("long").alias("key_sum"))


Q218_SQL = """
WITH g AS (
  SELECT l_orderkey AS _id,
         list_filter(list_distinct(list(l_suppkey % 5)),
                     k -> k >= 3) AS rks
  FROM lineitem GROUP BY 1),
m AS (
  SELECT DISTINCT g._id, n.n_nationkey
  FROM g, unnest(g.rks) AS u(k)
  JOIN nation n ON n.n_regionkey = u.k),
p AS (
  SELECT _id, count(*) AS n_match, sum(n_nationkey) AS key_sum
  FROM m GROUP BY 1)
SELECT g._id,
       CAST(len(g.rks) AS INT) AS rk_n,
       CAST(coalesce(p.n_match, 0) AS INT) AS n_match,
       CAST(coalesce(p.key_sum, 0) AS BIGINT) AS key_sum
FROM g LEFT JOIN p USING (_id)
"""


# --- q220: partition-less $setWindowFields, DISTRIBUTED prefix scan (r17) --------
def q220_mongo_global_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running ledger over ALL orders — partition-less
    ``$setWindowFields`` through the r17 distributed prefix-scan
    lowering (``windows.py::_swf_partitionless``): range-bucket on the
    leading sort key, in-bucket windows behind ONE data shuffle,
    cross-bucket carry over a ≤ B-row bucket summary. Two window
    stages: a tie-free (date, key) sort carries position and the
    running/global cents accumulators (exact long arithmetic — the
    carry reassociation is value-identical for integers); a coarse
    date-only sort exercises ``$rank``/``$denseRank`` over REAL ties
    (tie groups never straddle buckets — bucket id is a value
    function). Never the pre-r17 single-task window; the oracle is the
    plain SQL window equivalent.

    Reference scope: running totals/ranks are engine-declared scope
    (the reference's only ordering is the surrogate-key sort,
    `dags/includes/user_table.py:143`)."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    out = apply_pipeline(orders, [
        {"$setWindowFields": {
            "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
            "output": {
                "pos": {"$documentNumber": {}},
                "run_cents": {"$sum": "$cents",
                              "window": {"documents": ["unbounded",
                                                       "current"]}},
                "run_min": {"$min": "$cents",
                            "window": {"documents": ["unbounded",
                                                     "current"]}},
                "run_max": {"$max": "$cents",
                            "window": {"documents": ["unbounded",
                                                     "current"]}},
                "tot": {"$sum": "$cents"},
                "g_avg": {"$avg": "$cents"},
            }}},
        {"$setWindowFields": {
            "sortBy": {"o_orderdate": 1},
            "output": {"rk": {"$rank": {}},
                       "drk": {"$denseRank": {}}}}},
    ])
    return out.select(
        F.col("o_orderkey").cast("long").alias("_id"),
        F.col("pos").cast("long").alias("pos"),
        F.col("run_cents").cast("long").alias("run_cents"),
        F.col("run_min").cast("long").alias("run_min"),
        F.col("run_max").cast("long").alias("run_max"),
        F.col("rk").cast("long").alias("rk"),
        F.col("drk").cast("long").alias("drk"),
        F.col("tot").cast("long").alias("tot"),
        F.round(F.col("g_avg"), 6).alias("g_avg"))


# --- q221: partition-less $shift, DISTRIBUTED (global neighbours) ---------------
def q221_mongo_global_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-reading deltas over the GLOBAL event stream —
    partition-less ``$shift`` (lead/lag) through the r17 edge-stitching
    lowering: in-bucket lead/lag with each bucket's first/last |by|
    values carried through the ≤ B-row summary, so neighbours that
    straddle bucket boundaries stitch exactly (by −3 guarantees
    multi-row spans at every SF). ``default`` (the by −3 leg) applies
    only past the collection ends; null readings pass through. Sort key
    ``event_id`` is unique (tie-free, the determinism convention);
    per-row rounded-6dp outputs — no sums — hash stably."""
    ev = load_table(spark, "events", sf_dir)
    out = apply_pipeline(ev, [
        {"$setWindowFields": {
            "sortBy": {"event_id": 1},
            "output": {
                "prev_v": {"$shift": {"output": "$value", "by": -1}},
                "next_v": {"$shift": {"output": "$value", "by": 1}},
                "prev3_v": {"$shift": {"output": "$value", "by": -3,
                                       "default": 0.0}},
            }}},
        {"$addFields": {"delta": {"$subtract": ["$value", "$prev_v"]}}},
    ])
    return out.select(
        "event_id",
        F.round(F.col("prev_v"), 6).alias("prev_v"),
        F.round(F.col("next_v"), 6).alias("next_v"),
        F.round(F.col("prev3_v"), 6).alias("prev3_v"),
        F.round(F.col("delta"), 6).alias("delta"))


Q221_SQL = """
SELECT event_id,
       round(lag(value, 1) OVER w, 6) AS prev_v,
       round(lead(value, 1) OVER w, 6) AS next_v,
       round(lag(value, 3, 0.0) OVER w, 6) AS prev3_v,
       round(value - lag(value, 1) OVER w, 6) AS delta
FROM events
WINDOW w AS (ORDER BY event_id)
"""


Q220_SQL = """
WITH o AS (SELECT o_orderkey, o_orderdate,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderkey AS _id,
       CAST(row_number() OVER w2 AS BIGINT) AS pos,
       CAST(sum(cents) OVER w2 AS BIGINT) AS run_cents,
       CAST(min(cents) OVER w2 AS BIGINT) AS run_min,
       CAST(max(cents) OVER w2 AS BIGINT) AS run_max,
       CAST(rank() OVER (ORDER BY o_orderdate) AS BIGINT) AS rk,
       CAST(dense_rank() OVER (ORDER BY o_orderdate) AS BIGINT) AS drk,
       CAST(sum(cents) OVER () AS BIGINT) AS tot,
       round(avg(cents) OVER (), 6) AS g_avg
FROM o
WINDOW w2 AS (ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --- q222/q223: $vectorSearch — ENN and LSH-ANN through the translator (r17) ----
#: Literal query vector for the $vectorSearch gated queries: Mongo's
#: queryVector is part of the QUERY (never an expression), so a fixed
#: deterministic literal is the faithful shape. 6-dp sine values keep
#: the plan/SQL literals tidy; the UNIT copy is computed ONCE here in
#: Python float64 (the same arithmetic _vector_search itself performs)
#: and embedded verbatim on both engines — q-side normalization never
#: crosses an engine boundary.
_VS_DIM = 64
_VS_QV = [round(math.sin(1.7 * i), 6) for i in range(_VS_DIM)]
_VS_QNORM = math.sqrt(sum(float(x) * float(x) for x in _VS_QV))
_VS_QUNIT = [float(x) / _VS_QNORM for x in _VS_QV]


def _vs_darr(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"


def _vs_unit_sql(v: str) -> str:
    # V.unit's float procedure (normalize per element after one
    # sequential self-dot), the proven-parity form from plans/llmdata
    dv = f"{v}::DOUBLE[]"
    return f"list_transform({dv}, x -> x / sqrt(list_dot_product({dv}, {dv})))"


def q222_mongo_vector_search_exact(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """``$vectorSearch`` with ``exact: true`` (ENN) — an Atlas user's
    scored retrieval pipeline run verbatim through the translator: MQL
    pre-``filter``, full-scan cosine against the literal query vector,
    top-25 by the Atlas score convention ``(1+cos)/2``, the score
    surfaced downstream via ``{$meta: "vectorSearchScore"}`` inside
    ``$project`` (the r17 scratch-column plumbing:
    ``stages.py::_vector_search`` + ``expr.py`` VS_SCORE binding). The
    plan is scan → filter → TakeOrderedAndProject — no join, no global
    sort; ties at the boundary break on ``_id`` (the determinism
    convention) on both engines.

    Reference scope: the reference has no vector operations
    (SURVEY.md §2 similarity family is engine-declared scope); the
    stage surface follows MongoDB Atlas's published $vectorSearch
    contract."""
    e = (load_table(spark, "embeddings", sf_dir)
         .withColumnRenamed("vec_id", "_id"))
    out = apply_pipeline(e, [
        {"$vectorSearch": {"index": "emb_idx", "path": "embedding",
                           "queryVector": _VS_QV, "limit": 25,
                           "exact": True,
                           "filter": {"label": {"$gte": 2}}}},
        {"$project": {"_id": 1, "label": 1,
                      "score": {"$meta": "vectorSearchScore"}}},
    ])
    return out.select(
        F.col("_id").cast("long").alias("_id"),
        F.col("label").cast("int").alias("label"),
        F.round(F.col("score"), 6).alias("score"))


Q222_SQL = f"""
WITH scored AS (
  SELECT vec_id AS _id, label,
         list_dot_product({_vs_unit_sql('embedding')},
                          {_vs_darr(_VS_QUNIT)}) AS cos
  FROM embeddings
  WHERE label >= 2 AND embedding IS NOT NULL
    AND len(embedding) = {_VS_DIM}
)
SELECT CAST(_id AS BIGINT) AS _id, CAST(label AS INT) AS label,
       round((1.0 + cos) / 2.0, 6) AS score
FROM scored ORDER BY cos DESC, _id ASC LIMIT 25
"""


def _vs_ann_pred_sql(tables_used: int) -> str:
    """DuckDB predicate replaying the stage's ANN candidate test: the
    row's LSH bucket equals the query's bucket in ≥1 probed hash table.
    Sign literals and the query's driver-side buckets come from the
    SAME functions the stage uses (rademacher_signs /
    _vs_query_buckets), so the approximate candidate set is
    bit-identical across engines — the q52 hash-gating discipline."""
    signs = similarity.rademacher_signs(_VS_PLANES, _VS_TABLES, _VS_DIM)
    qb = _vs_query_buckets([float(x) for x in _VS_QV], signs[:tables_used])
    preds = []
    for t in range(tables_used):
        bits = " + ".join(
            "(CASE WHEN list_dot_product(embedding::DOUBLE[], "
            f"{_vs_darr(signs[t][j])}) > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(_VS_PLANES))
        preds.append(f"({bits}) = {qb[t]}")
    return "(" + "\n   OR ".join(preds) + ")"


def q223_mongo_vector_search_ann(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``$vectorSearch`` ANN (``exact`` omitted — Atlas's default): the
    deterministic LSH analogue of the managed index. ``numCandidates:
    100`` with ``limit: 25`` probes ceil(100/25) = 4 of the 8 hash
    tables; candidates are bucket-collisions with the DRIVER-computed
    query buckets (the query vector is a literal, so the whole
    candidate test is a map-side when-sum — NO join in the plan),
    exact cosine re-ranks, TakeOrdered keeps 25. Approximate yet
    hash-gated: the md5-derived planes replay in SQL, so recall < 1
    divergence is impossible BY CONSTRUCTION, not by luck (q52's
    discipline, now through the stage language).

    Reference scope: engine-declared (SURVEY.md §2 similarity
    family); surface per MongoDB Atlas's published contract."""
    e = (load_table(spark, "embeddings", sf_dir)
         .withColumnRenamed("vec_id", "_id"))
    out = apply_pipeline(e, [
        {"$vectorSearch": {"path": "embedding", "queryVector": _VS_QV,
                           "limit": 25, "numCandidates": 100}},
        {"$project": {"_id": 1,
                      "score": {"$meta": "vectorSearchScore"}}},
    ])
    return out.select(
        F.col("_id").cast("long").alias("_id"),
        F.round(F.col("score"), 6).alias("score"))


def _q223_sql() -> str:
    return f"""
WITH cand AS (
  SELECT vec_id AS _id, embedding
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {_VS_DIM}
    AND {_vs_ann_pred_sql(4)}
),
scored AS (
  SELECT _id,
         list_dot_product({_vs_unit_sql('embedding')},
                          {_vs_darr(_VS_QUNIT)}) AS cos
  FROM cand
)
SELECT CAST(_id AS BIGINT) AS _id,
       round((1.0 + cos) / 2.0, 6) AS score
FROM scored ORDER BY cos DESC, _id ASC LIMIT 25
"""


Q223_SQL = _q223_sql()


# --- q224: partition-less FINITE-frame $setWindowFields, DISTRIBUTED (r17) ------
def q224_mongo_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global MOVING windows over the whole event stream — the classic
    smoothing shape (centered 7-doc sum/avg, trailing 5-doc min,
    forward 4-doc max, ±10-doc band count), partition-less, through the
    r17 "mid" halo lowering (``windows.py::_swf_partitionless``): the
    in-bucket framed windows run behind ONE bucket shuffle, each
    bucket's first/last frame-width values ride the ≤ B-row summary,
    and edge rows take contiguous slices of the flattened neighbour
    streams — correct across multi-bucket spans, never the pre-r17
    single-task window. ``event_id`` is unique (tie-free sort, the
    determinism convention). Cents-integer values keep every framed
    sum exact on both engines (no float reassociation); the one
    division ($avg) happens once per row on identical exact integers.

    Reference scope: the reference has no window functions at all
    (its pandas stage is row-at-a-time, `dags/includes/user_table.py`);
    series smoothing is engine-declared scope."""
    ev = load_table(spark, "events", sf_dir)
    out = apply_pipeline(ev, [
        {"$addFields": {"mv": {"$toLong": {"$round": [
            {"$multiply": ["$value", 100]}, 0]}}}},
        {"$setWindowFields": {
            "sortBy": {"event_id": 1},
            "output": {
                "ctr_sum": {"$sum": "$mv",
                            "window": {"documents": [-3, 3]}},
                "ctr_avg": {"$avg": "$mv",
                            "window": {"documents": [-3, 3]}},
                "trail_min": {"$min": "$mv",
                              "window": {"documents": [-5, -1]}},
                "fwd_max": {"$max": "$mv",
                            "window": {"documents": [1, 4]}},
                "band_n": {"$count": {},
                           "window": {"documents": [-10, 10]}},
                "cum_ahead": {"$sum": "$mv",
                              "window": {"documents": ["unbounded", 3]}},
                "rest_max": {"$max": "$mv",
                             "window": {"documents": [-1, "unbounded"]}},
                "win_open": {"$first": "$mv",
                             "window": {"documents": [-3, 3]}},
                "win_close": {"$last": "$mv",
                              "window": {"documents": [-3, 3]}},
            }}},
    ])
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("ctr_sum").cast("long").alias("ctr_sum"),
        F.round(F.col("ctr_avg"), 6).alias("ctr_avg"),
        F.col("trail_min").cast("long").alias("trail_min"),
        F.col("fwd_max").cast("long").alias("fwd_max"),
        F.col("band_n").cast("long").alias("band_n"),
        F.col("cum_ahead").cast("long").alias("cum_ahead"),
        F.col("rest_max").cast("long").alias("rest_max"),
        F.col("win_open").cast("long").alias("win_open"),
        F.col("win_close").cast("long").alias("win_close"))


Q224_SQL = """
WITH s AS (
  SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS mv
  FROM events)
SELECT event_id,
       CAST(sum(mv) OVER w7 AS BIGINT) AS ctr_sum,
       round(CAST(sum(mv) OVER w7 AS DOUBLE) / count(mv) OVER w7, 6)
         AS ctr_avg,
       CAST(min(mv) OVER (ORDER BY event_id
              ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS BIGINT)
         AS trail_min,
       CAST(max(mv) OVER (ORDER BY event_id
              ROWS BETWEEN 1 FOLLOWING AND 4 FOLLOWING) AS BIGINT)
         AS fwd_max,
       CAST(count(*) OVER (ORDER BY event_id
              ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING) AS BIGINT)
         AS band_n,
       CAST(sum(mv) OVER (ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 3 FOLLOWING)
            AS BIGINT) AS cum_ahead,
       CAST(max(mv) OVER (ORDER BY event_id
              ROWS BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING)
            AS BIGINT) AS rest_max,
       CAST(first_value(mv) OVER w7 AS BIGINT) AS win_open,
       CAST(last_value(mv) OVER w7 AS BIGINT) AS win_close
FROM s
WINDOW w7 AS (ORDER BY event_id
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
"""


# --- q225: partition-less $setWindowFields on a STRING sort key (r17) -----------
def q225_mongo_string_key_window(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Global window functions sorted by a STRING leading key —
    distributed through the r17 6-byte-prefix image in
    ``windows.py::_range_bucket``. ``o_orderpriority`` has only five
    distinct values, so EVERY rank tie group collapses to one image
    value and the bucketing degenerates to ~5 effective buckets — the
    adversarial shape for the prefix image (merged groups must never
    straddle a bucket, and the rank/dense-rank carries must stay exact
    across them). ``o_orderkey`` tie-breaks the compound sort (the
    determinism convention). Outputs: global rank + dense rank over the
    priority ties, running document count, and a centered 5-doc moving
    cents sum (the "mid" halo path riding the same string buckets).

    Reference scope: the reference has no window functions
    (`dags/includes/user_table.py` is row-at-a-time pandas); global
    ranking is engine-declared scope."""
    orders = load_table(spark, "orders", sf_dir)
    out = apply_pipeline(orders, [
        {"$addFields": {"cents": {"$toLong": {"$round": [
            {"$multiply": ["$o_totalprice", 100]}, 0]}}}},
        # rank stage: ties on the bare string key (Mongo ranks over the
        # FULL sortBy, so the tie-heavy ranking needs its own stage)
        {"$setWindowFields": {
            "sortBy": {"o_orderpriority": 1},
            "output": {"rk": {"$rank": {}},
                       "drk": {"$denseRank": {}}}}},
        # scan stage: tie-free compound sort for the order-sensitive
        # outputs — two distributed string-key lowerings stacked
        {"$setWindowFields": {
            "sortBy": {"o_orderpriority": 1, "o_orderkey": 1},
            "output": {
                "pos": {"$count": {},
                        "window": {"documents": ["unbounded",
                                                 "current"]}},
                "ctr": {"$sum": "$cents",
                        "window": {"documents": [-2, 2]}},
            }}},
    ])
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("rk").cast("long").alias("rk"),
        F.col("drk").cast("long").alias("drk"),
        F.col("pos").cast("long").alias("pos"),
        F.col("ctr").cast("long").alias("ctr"))


Q225_SQL = """
WITH s AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders)
SELECT o_orderkey,
       CAST(rank() OVER (ORDER BY o_orderpriority) AS BIGINT) AS rk,
       CAST(dense_rank() OVER (ORDER BY o_orderpriority) AS BIGINT)
         AS drk,
       CAST(count(*) OVER (ORDER BY o_orderpriority, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS pos,
       CAST(sum(cents) OVER (ORDER BY o_orderpriority, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
         AS ctr
FROM s
"""


QUERIES = {
    "q148_mongo_expr_orders": q148_mongo_expr_orders,
    "q149_ks_drift": q149_ks_drift,
    "q150_gini_concentration": q150_gini_concentration,
    "q151_entropy_mix": q151_entropy_mix,
    "q152_gopher_rules": q152_gopher_rules,
    "q153_curriculum_shards": q153_curriculum_shards,
    "q154_span_scrub_stats": q154_span_scrub_stats,
    "q155_local_supplier_volume": q155_local_supplier_volume,
    "q156_brand_profit_by_nation_year": q156_brand_profit_by_nation_year,
    "q157_returned_top_customers": q157_returned_top_customers,
    "q158_weighted_median": q158_weighted_median,
    "q159_mode_priority": q159_mode_priority,
    "q164_min_cost_supplier": q164_min_cost_supplier,
    "q168_mongo_window_fields": q168_mongo_window_fields,
    "q169_mongo_bucket_lengths": q169_mongo_bucket_lengths,
    "q170_mongo_sort_by_count": q170_mongo_sort_by_count,
    "q171_mongo_merge_into": q171_mongo_merge_into,
    "q172_mongo_facet_summary": q172_mongo_facet_summary,
    "q173_mongo_trailing_window": q173_mongo_trailing_window,
    "q174_mongo_array_hofs": q174_mongo_array_hofs,
    "q175_mongo_densify_fill": q175_mongo_densify_fill,
    "q176_mongo_bucket_auto": q176_mongo_bucket_auto,
    "q177_mongo_graph_lookup": q177_mongo_graph_lookup,
    "q178_mongo_composite_group": q178_mongo_composite_group,
    "q179_mongo_linear_fill_rate": q179_mongo_linear_fill_rate,
    "q180_mongo_group_topn": q180_mongo_group_topn,
    "q181_mongo_lookup_let": q181_mongo_lookup_let,
    "q182_mongo_merge_update": q182_mongo_merge_update,
    "q183_mongo_calendar_window": q183_mongo_calendar_window,
    "q184_mongo_lookup_nonequi": q184_mongo_lookup_nonequi,
    "q185_mongo_integral_auc": q185_mongo_integral_auc,
    "q186_mongo_scalar_ops": q186_mongo_scalar_ops,
    "q187_mongo_match_operators": q187_mongo_match_operators,
    "q188_mongo_array_match": q188_mongo_array_match,
    "q189_mongo_sort_array": q189_mongo_sort_array,
    "q190_mongo_redact": q190_mongo_redact,
    "q191_mongo_top_root": q191_mongo_top_root,
    "q192_mongo_documents_union": q192_mongo_documents_union,
    "q193_mongo_merge_jdbc_pipeline": q193_mongo_merge_jdbc_pipeline,
    "q194_mongo_ema": q194_mongo_ema,
    "q195_mongo_lookup_latest": q195_mongo_lookup_latest,
    "q196_mongo_regex_find": q196_mongo_regex_find,
    "q197_mongo_date_math": q197_mongo_date_math,
    "q198_mongo_geonear": q198_mongo_geonear,
    "q199_mongo_lookup_page": q199_mongo_lookup_page,
    "q200_mongo_lookup_group": q200_mongo_lookup_group,
    "q201_mongo_week_family": q201_mongo_week_family,
    "q202_mongo_bitwise_type": q202_mongo_bitwise_type,
    "q203_mongo_timezone": q203_mongo_timezone,
    "q204_ejson_roundtrip": q204_ejson_roundtrip,
    "q205_mongo_lookup_bucket": q205_mongo_lookup_bucket,
    "q206_mongo_merge_objects_acc": q206_mongo_merge_objects_acc,
    "q207_mongo_lookup_sort_by_count": q207_mongo_lookup_sort_by_count,
    "q208_mongo_lookup_window": q208_mongo_lookup_window,
    "q209_mongo_lookup_sort_group": q209_mongo_lookup_sort_group,
    "q210_mongo_lookup_mid_topk": q210_mongo_lookup_mid_topk,
    "q211_mongo_lookup_group_topk": q211_mongo_lookup_group_topk,
    "q212_mongo_lookup_bucket_auto": q212_mongo_lookup_bucket_auto,
    "q213_mongo_bucket_auto_gran": q213_mongo_bucket_auto_gran,
    "q214_mongo_lookup_bucket_gran": q214_mongo_lookup_bucket_gran,
    "q215_mongo_quarter_year_window": q215_mongo_quarter_year_window,
    "q217_mongo_fill_partitionless": q217_mongo_fill_partitionless,
    "q218_mongo_lookup_array_local": q218_mongo_lookup_array_local,
    "q220_mongo_global_window": q220_mongo_global_window,
    "q221_mongo_global_shift": q221_mongo_global_shift,
    "q222_mongo_vector_search_exact": q222_mongo_vector_search_exact,
    "q223_mongo_vector_search_ann": q223_mongo_vector_search_ann,
    "q224_mongo_moving_window": q224_mongo_moving_window,
    "q225_mongo_string_key_window": q225_mongo_string_key_window,
    "q165_shipping_priority": q165_shipping_priority,
    "q166_forecast_revenue": q166_forecast_revenue,
    "q167_late_shipment_priority": q167_late_shipment_priority,
}

ORACLES = {
    "q148_mongo_expr_orders": Q148_SQL,
    "q149_ks_drift": Q149_SQL,
    "q150_gini_concentration": Q150_SQL,
    "q151_entropy_mix": Q151_SQL,
    "q152_gopher_rules": Q152_SQL,
    "q153_curriculum_shards": Q153_SQL,
    "q154_span_scrub_stats": Q154_SQL,
    "q155_local_supplier_volume": Q155_SQL,
    "q156_brand_profit_by_nation_year": Q156_SQL,
    "q157_returned_top_customers": Q157_SQL,
    "q158_weighted_median": Q158_SQL,
    "q159_mode_priority": Q159_SQL,
    "q164_min_cost_supplier": Q164_SQL,
    "q168_mongo_window_fields": Q168_SQL,
    "q169_mongo_bucket_lengths": Q169_SQL,
    "q170_mongo_sort_by_count": Q170_SQL,
    "q171_mongo_merge_into": Q171_SQL,
    "q172_mongo_facet_summary": Q172_SQL,
    "q173_mongo_trailing_window": Q173_SQL,
    "q174_mongo_array_hofs": Q174_SQL,
    "q175_mongo_densify_fill": Q175_SQL,
    "q176_mongo_bucket_auto": Q176_SQL,
    "q177_mongo_graph_lookup": Q177_SQL,
    "q178_mongo_composite_group": Q178_SQL,
    "q179_mongo_linear_fill_rate": Q179_SQL,
    "q180_mongo_group_topn": Q180_SQL,
    "q181_mongo_lookup_let": Q181_SQL,
    "q182_mongo_merge_update": Q182_SQL,
    "q183_mongo_calendar_window": Q183_SQL,
    "q184_mongo_lookup_nonequi": Q184_SQL,
    "q185_mongo_integral_auc": Q185_SQL,
    "q186_mongo_scalar_ops": Q186_SQL,
    "q187_mongo_match_operators": Q187_SQL,
    "q188_mongo_array_match": Q188_SQL,
    "q189_mongo_sort_array": Q189_SQL,
    "q190_mongo_redact": Q190_SQL,
    "q191_mongo_top_root": Q191_SQL,
    "q192_mongo_documents_union": Q192_SQL,
    "q193_mongo_merge_jdbc_pipeline": Q193_SQL,
    "q194_mongo_ema": Q194_SQL,
    "q195_mongo_lookup_latest": Q195_SQL,
    "q196_mongo_regex_find": Q196_SQL,
    "q197_mongo_date_math": Q197_SQL,
    "q198_mongo_geonear": Q198_SQL,
    "q199_mongo_lookup_page": Q199_SQL,
    "q200_mongo_lookup_group": Q200_SQL,
    "q201_mongo_week_family": Q201_SQL,
    "q202_mongo_bitwise_type": Q202_SQL,
    "q203_mongo_timezone": Q203_SQL,
    "q204_ejson_roundtrip": Q204_SQL,
    "q205_mongo_lookup_bucket": Q205_SQL,
    "q206_mongo_merge_objects_acc": Q206_SQL,
    "q207_mongo_lookup_sort_by_count": Q207_SQL,
    "q208_mongo_lookup_window": Q208_SQL,
    "q209_mongo_lookup_sort_group": Q209_SQL,
    "q210_mongo_lookup_mid_topk": Q210_SQL,
    "q211_mongo_lookup_group_topk": Q211_SQL,
    "q212_mongo_lookup_bucket_auto": Q212_SQL,
    "q213_mongo_bucket_auto_gran": Q213_SQL,
    "q214_mongo_lookup_bucket_gran": Q214_SQL,
    "q215_mongo_quarter_year_window": Q215_SQL,
    "q217_mongo_fill_partitionless": Q217_SQL,
    "q218_mongo_lookup_array_local": Q218_SQL,
    "q220_mongo_global_window": Q220_SQL,
    "q221_mongo_global_shift": Q221_SQL,
    "q222_mongo_vector_search_exact": Q222_SQL,
    "q223_mongo_vector_search_ann": Q223_SQL,
    "q224_mongo_moving_window": Q224_SQL,
    "q225_mongo_string_key_window": Q225_SQL,
    "q165_shipping_priority": Q165_SQL,
    "q166_forecast_revenue": Q166_SQL,
    "q167_late_shipment_priority": Q167_SQL,
}
