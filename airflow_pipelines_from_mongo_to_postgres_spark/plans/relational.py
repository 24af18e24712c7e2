"""Core relational operator surface (SURVEY.md §2.7) over the driver's
TPC-H-ish fixtures: scan/project/filter, joins (broadcast / sort-merge /
semi / anti), hash aggregation, rollup/cube, windows, set ops, top-k,
scalar-function family, explode, JSON extraction.

Every query is declared with the DataFrame API so Catalyst plans it
(predicate pushdown + column pruning reach the parquet scan; small dims are
broadcast; partial aggregation runs map-side). Double-typed aggregates are
rounded on BOTH sides so the value-hash comparison is order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table, spread


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --- q01: TPC-H Q1-style pricing summary (scan → filter → hash agg) --------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product sums (disc_price, charge) go through DECIMAL(18,6): the
    per-row product DOUBLE is bit-identical across engines (IEEE multiply
    of the same inputs in the same expression order), casting it to 6-dp
    decimal recovers the exact ≤6-dp value, and decimal addition is
    summation-order-independent — so round(·,4) can never flip on
    partial-agg order. The decimal stays INTERNAL: the rounded exact
    decimal is cast to DOUBLE in the final projection on both engines
    (the same exact decimal converts to the same nearest double), because
    DecimalType output columns are driver-red (r3 evidence). Averages use
    the repo rule: exact decimal sum ÷ count in double, then round — so
    the numerator is order-independent and both engines divide identical
    operands. Plain 2-dp column sums keep the double path (their sums sit
    ≥50× the FP error away from any 4-dp boundary).

    spread(): the fixture parquets are single-row-group files, so the
    scan — and with it the whole partial aggregation — is ONE task; the
    decimal partial agg serialized on one core was most of the query
    (r17 measurement: 1.58 s → 1.13 s with the round-robin widen). At
    scale the guard makes it a no-op (guide §2.5, input skew)."""
    li = spread(_t(spark, sf_dir, "lineitem"))
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              * (1 + F.col("l_tax"))).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                    .cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(F.col("l_discount").cast("decimal(18,4)"))
                    .cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- q02: filter + projection (P1/P7: pushdown reaches the scan) -----------
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


Q02_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-03-01'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND o_orderpriority = '1-URGENT'
"""


# --- q03: multi-way join (customer ⋈ nation ⋈ region ⋈ orders) + agg -------
def q03_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    o = _t(spark, sf_dir, "orders")
    # nation/region are tiny: broadcast explicitly so the big fact side
    # never shuffles for them.
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("order_cnt"),
            F.countDistinct("o_custkey").alias("customer_cnt"),
        )
    )


Q03_SQL = """
SELECT r_name AS region_name,
       round(sum(o_totalprice), 4) AS revenue,
       count(*) AS order_cnt,
       count(DISTINCT o_custkey) AS customer_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- q04: broadcast join fact ⋈ dim + agg by brand --------------------------
def q04_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("total_qty"),
            # product sum via decimal(18,6): order-independent (see q01);
            # final cast to double keeps DecimalType out of the output schema
            F.round(F.sum((F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
                    4).cast("double").alias("revenue"),
        )
    )


Q04_SQL = """
SELECT p_brand,
       round(sum(l_quantity), 4) AS total_qty,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- q05: left-semi join (EXISTS) -------------------------------------------
def q05_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q05_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


# --- q06: left-anti join (NOT EXISTS) ---------------------------------------
def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


Q06_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- q07: window ranking — top-3 orders per customer ------------------------
def q07_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q07_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


# --- q08: window running aggregate ------------------------------------------
def q08_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
    )


Q08_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
FROM orders
"""


# --- q09: lag/lead analytics -------------------------------------------------
def q09_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    prev_date = F.lag("o_orderdate").over(w)
    to_epoch = lambda c: c.cast("timestamp").cast("long")  # NTZ needs 2-step cast
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 4).alias("price_delta"),
        (to_epoch(F.col("o_orderdate")) - to_epoch(prev_date)).alias("gap_seconds"),
    )


Q09_SQL = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice - lag(o_totalprice) OVER w, 4) AS price_delta,
       date_diff('second', lag(o_orderdate) OVER w, o_orderdate) AS gap_seconds
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# --- q10: distinct / dropDuplicates ------------------------------------------
def q10_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderpriority")
        .dropDuplicates()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("distinct_customers"))
    )


Q10_SQL = """
SELECT o_orderpriority, count(*) AS distinct_customers
FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
GROUP BY o_orderpriority
"""


# --- q11: rollup --------------------------------------------------------------
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


Q11_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- q12: cube ----------------------------------------------------------------
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


Q12_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 4) AS sum_price, count(*) AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- q13: set operations -------------------------------------------------------
def q13_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    both = urgent.intersect(big)          # INTERSECT (distinct)
    either = urgent.union(big).distinct()  # UNION
    only_urgent = urgent.subtract(big)  # EXCEPT DISTINCT
    return (
        both.withColumn("bucket", F.lit("urgent_and_big"))
        .unionByName(either.withColumn("bucket", F.lit("urgent_or_big")))
        .unionByName(only_urgent.withColumn("bucket", F.lit("urgent_not_big")))
        .join(open_.distinct().withColumnRenamed("o_custkey", "ok"),
              F.col("o_custkey") == F.col("ok"), "left_semi")
        .select(F.col("o_custkey").alias("custkey"), "bucket")
    )


Q13_SQL = """
WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000),
     open_ AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     tagged AS (
       SELECT o_custkey, 'urgent_and_big' AS bucket FROM (SELECT * FROM urgent INTERSECT SELECT * FROM big)
       UNION ALL
       SELECT o_custkey, 'urgent_or_big' FROM (SELECT * FROM urgent UNION SELECT * FROM big)
       UNION ALL
       SELECT o_custkey, 'urgent_not_big' FROM (SELECT * FROM urgent EXCEPT SELECT * FROM big)
     )
SELECT t.o_custkey AS custkey, t.bucket
FROM tagged t WHERE EXISTS (SELECT 1 FROM open_ o WHERE o.o_custkey = t.o_custkey)
"""


# --- q14: scalar function family (string/date/conditional) --------------------
def q14_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("segment_upper"),
        F.concat(F.lit("cust:"), F.col("c_name")).alias("tagged_name"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.round(F.coalesce(F.col("c_acctbal"), F.lit(0.0)), 2).alias("balance"),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
    )


Q14_SQL = """
SELECT c_custkey,
       lower(c_name) AS name_lower,
       upper(c_mktsegment) AS segment_upper,
       concat('cust:', c_name) AS tagged_name,
       substr(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len,
       round(coalesce(c_acctbal, 0.0), 2) AS balance,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier
FROM customer
"""


# --- q15: date functions + conditional aggregation -----------------------------
def q15_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("urgent_orders"),
            F.round(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)), 4).alias("finished_value"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
    )


Q15_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       count(*) AS orders,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 4) AS finished_value,
       round(min(o_totalprice), 4) AS min_price,
       round(max(o_totalprice), 4) AS max_price
FROM orders
GROUP BY 1, 2
"""


# --- q16: global top-k (sort + limit) and max-key (O1/O2) ----------------------
def q16_top_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


Q16_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
"""


def q17_max_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O2: SELECT id ORDER BY id DESC LIMIT 1 (ref utils.py:13-20) ≡ max().
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.max("o_orderkey").alias("max_id"),
        F.count(F.lit(1)).alias("row_cnt"),
    )


Q17_SQL = "SELECT max(o_orderkey) AS max_id, count(*) AS row_cnt FROM orders"


# --- q18: JSON extraction (events.props) ---------------------------------------
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("events"),
        )
    )


Q18_SQL = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       count(*) AS events
FROM events
GROUP BY event_type
"""


# --- q19: count distinct (exact) ------------------------------------------------
def q19_ndv_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("ndv_part"),
        F.countDistinct("l_suppkey").alias("ndv_supp"),
        F.countDistinct("l_orderkey").alias("ndv_order"),
    )


Q19_SQL = """
SELECT count(DISTINCT l_partkey) AS ndv_part,
       count(DISTINCT l_suppkey) AS ndv_supp,
       count(DISTINCT l_orderkey) AS ndv_order
FROM lineitem
"""


# --- q47: GROUPING SETS (the third grouping variant next to q11/q12) ------------
def q47_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
             F.count(F.lit(1)).alias("cnt"))
    )


Q47_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# --- q48: exact percentiles (continuous interpolation, Spark = quantile_cont) ----
def q48_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50_price"),
            F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95_price"),
            F.round(F.percentile("l_quantity", 0.5), 4).alias("p50_qty"),
        )
    )


Q48_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
       round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty
FROM lineitem GROUP BY l_returnflag
"""


# --- q87: remaining window-function surface (ntile / percent_rank / nth / RANGE) --
def q87_window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window shapes q07-q09 don't cover, in one plan: equi-depth
    quartiles (ntile), relative rank (percent_rank — an exact integer
    ratio), positional lookup (nth_value under the standard running
    frame), and a RANGE value-based frame (peers within 5000 of the
    current price BELOW it). All windows share one (priority, price,
    orderkey) sort; the unique orderkey tiebreak keeps every result
    deterministic on both engines. Output bounded by the price filter
    AFTER the windows (standard semantics: windows see the whole
    partition)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    wrange = Window.partitionBy("o_orderpriority") \
        .orderBy(F.col("o_totalprice").asc()) \
        .rangeBetween(-5000, 0)
    return (
        o.select(
            "o_orderkey", "o_orderpriority", "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.first_value(F.col("o_orderkey")).over(w).alias("top_order"),
            F.nth_value(F.col("o_orderkey"), 2).over(w).alias("second_order"),
            F.count(F.lit(1)).over(wrange).alias("peers_within_5k_below"),
        )
        .filter(F.col("o_totalprice") > 450000)
    )


Q87_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       first_value(o_orderkey) OVER w AS top_order,
       nth_value(o_orderkey, 2) OVER w AS second_order,
       count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC
                      RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
         AS peers_within_5k_below
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
QUALIFY o_totalprice > 450000
"""


# --- q88: array higher-order-function family --------------------------------------
def q88_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array HOF surface over grouped data: ordered list aggregation
    (sort_array(collect_list(struct)) — Spark's deterministic stand-in
    for ordered list()), element extraction via transform, filter,
    aggregate-fold, slice + join. All-integer payloads keep every result
    hash-exact. One groupBy shuffle; the mod-filter bounds output and is
    pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct(
            F.col("l_linenumber").alias("ln"),
            F.col("l_quantity").cast("long").alias("q")))),
        lambda x: x["q"],
    )
    return (
        li.filter(F.col("l_orderkey") % 97 == 0)
        .groupBy("l_orderkey")
        .agg(arr.alias("qtys"))
        .select(
            "l_orderkey",
            F.size("qtys").alias("n_items"),
            F.array_max("qtys").alias("max_qty"),
            F.size(F.filter("qtys", lambda q: q > 25)).alias("n_big"),
            F.aggregate("qtys", F.lit(0).cast("long"),
                        lambda acc, q: acc + q).alias("qty_sum"),
            F.concat_ws(",", F.transform(F.slice("qtys", 1, 3),
                                         lambda q: q.cast("string")))
            .alias("first3"),
        )
    )


Q88_SQL = """
SELECT l_orderkey,
       CAST(len(qtys) AS INT) AS n_items,
       list_max(qtys) AS max_qty,
       CAST(len(list_filter(qtys, q -> q > 25)) AS INT) AS n_big,
       CAST(list_sum(qtys) AS BIGINT) AS qty_sum,
       array_to_string(list_transform(qtys[1:3], q -> CAST(q AS VARCHAR)), ',') AS first3
FROM (
  SELECT l_orderkey,
         -- (linenumber, quantity) tiebreak: the fixture has duplicate
         -- (orderkey, linenumber) pairs, and Spark's struct sort breaks
         -- those ties on the quantity payload
         list(CAST(l_quantity AS BIGINT)
              ORDER BY l_linenumber, l_quantity) AS qtys
  FROM lineitem
  WHERE l_orderkey % 97 = 0
  GROUP BY l_orderkey
)
"""


# --- q49: salted skew join (orders ⋈ customer scattered over salt buckets) -------
def q49_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.skew import (
        salted_join,
    )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(o, c, "o_custkey", "c_custkey", salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("order_cnt"),
             F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )


Q49_SQL = """
SELECT c_mktsegment, count(*) AS order_cnt,
       round(sum(o_totalprice), 4) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- q102: national market share (TPC-H Q8 shape, 7-table join) ---------------------
def q102_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven-table star join (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈
    customer ⋈ nation×2 ⋈ region) computing one supplier-nation's share
    of PROMO-part revenue sold to EUROPE customers, per order year — the
    TPC-H Q8 shape, here to exercise Catalyst's join planning on the
    deepest join tree in the registry. Declared broadcasts only on the
    guaranteed-tiny dims (nation twice, region, the type-filtered part);
    supplier/customer joins are left to AQE, which broadcasts them at
    small SF and shuffle-joins them at 100 TB where they are fact-sized.
    Filters (p_type, r_name) sit on the dimension scans so pruning
    happens before any join. Share = exact decimal numerator/denominator
    cast to double (q01/q04 idiom), so the division is the only float op
    and runs on identical operands in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO") \
        .select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                           "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation")
    n_cust = nat.select(F.col("n_nationkey").alias("cn_key"),
                        F.col("n_regionkey").alias("cn_rkey"))
    n_supp = nat.select(F.col("n_nationkey").alias("sn_key"),
                        F.col("n_name").alias("supp_nation"))
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE") \
        .select("r_regionkey")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == r.r_regionkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_5", vol)
                .otherwise(zero))
    den = F.sum(vol)
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(num.cast("double") / den.cast("double"), 6)
            .alias("mkt_share"),
            F.round(den, 4).cast("double").alias("total_volume"),
        )
    )


Q102_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
             6) AS mkt_share,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1
"""


# --- q113: latest-shipper audit (TPC-H Q21's exists/not-exists plan shape) --
def q113_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were a LATEST shipper on multi-supplier orders —
    TPC-H Q21 semantics (the fixtures carry no commit/receipt dates, so
    "kept waiting" becomes "shipped last"): EXISTS another supplier on
    the order AND NOT EXISTS another supplier shipping strictly later.

    Plan shape (r17 optimization, guide §2.3/§2.4 — the classic Q21
    decorrelation): the literal EXISTS/NOT-EXISTS lowering was a
    left_semi + left_anti against two more copies of the fact table —
    three fact scans and, at scale, three full-fact shuffles. A
    supplier survives iff its max shipdate on the order equals the
    order's overall max (no strictly-later rival) and the order has ≥2
    suppliers, so ONE map-side-reducible aggregate to (order, supplier,
    max ship) + a per-order window computes the identical row set: the
    only full-fact shuffle is the partial-aggregated groupBy, and the
    window shuffles the already-collapsed per-supplier rows. Measured
    2.50 s → 1.44 s median at sf0.1, value-identical (the oracle keeps
    the EXISTS formulation, so equivalence is hash-gated tri-scale).
    Top 25 by count with the name tiebreak, TakeOrdered — no global
    sort materializes."""
    l = _t(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    per_sup = l.groupBy("l_orderkey", "l_suppkey") \
        .agg(F.max("l_shipdate").alias("mymax"))
    w = Window.partitionBy("l_orderkey")
    waiting = (
        per_sup
        .withColumn("nsupp", F.count(F.lit(1)).over(w))
        .withColumn("allmax", F.max("mymax").over(w))
        .filter((F.col("nsupp") >= 2) & (F.col("mymax") == F.col("allmax")))
        .select("l_orderkey", "l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(s),
                     waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(25)
    )


Q113_SQL = """
WITH waiting AS (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  WHERE EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate)
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM waiting w JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY 1, 2
ORDER BY numwait DESC, s_name ASC
LIMIT 25
"""


# --- q118: idle high-balance customers (TPC-H Q22's plan shape) --------------
def q118_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 re-keyed to the fixture schema (no phone column →
    nation grouping): customers whose balance exceeds the average
    POSITIVE balance and who have never ordered. Three distinct plan
    ingredients in one query: an uncorrelated scalar subquery (1-row
    broadcast cross join, no shuffle), a left_anti join against the
    orders fact (the NOT EXISTS), and a small group-agg. BOTH money
    aggregates go through DECIMAL(18,4): the threshold average
    especially — a raw double AVG is partial-sum-order-dependent at the
    ulp level, and a customer within one ulp of the boundary would flip
    the strict '>' membership between engines (the repo's decimal-sum
    canon, tests/test_canon.py)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
         / F.count(F.lit(1))).alias("__avg"))
    rich = (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("__avg")))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    n = _t(spark, sf_dir, "nation")
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
             .alias("totacctbal"))
    )


Q118_SQL = """
SELECT n.n_name, count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
                                 AS DOUBLE) / count(*)
                     FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


# --- q131: promo revenue share (TPC-H Q14's conditional-ratio shape) ---------
def q131_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: one scan, two conditional aggregates, one ratio — promo
    revenue as a percentage of total revenue per ship-month. The CASE
    never forks the plan (both sums share the scan and the hash-agg);
    the ratio divides two exact decimal sums cast to double, so both
    engines divide identical operands."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(F.sum(F.when(F.col("p_type").startswith("PROMO"), rev)
                   .otherwise(F.lit(0).cast("decimal(18,6)")))
             .alias("_promo"),
             F.sum(rev).alias("_total"))
        .select("month",
                F.round(F.lit(100.0) * F.col("_promo").cast("double")
                        / F.col("_total").cast("double"), 6)
                .alias("promo_pct"),
                F.round(F.col("_total"), 4).cast("double").alias("revenue"))
    )


Q131_SQL = """
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
       round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_pct,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# --- q132: bilateral shipping volume (TPC-H Q7's OR-pair join shape) ---------
def q132_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: supplier nation × customer nation trade volume for one
    nation PAIR in both directions — two independent dim chains hang
    off the fact (supplier side and order→customer side), the tiny
    nation dim broadcasts TWICE under different aliases, and the
    disjunctive pair predicate filters after both chains resolve.
    Yearly grain; decimal revenue."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1")
            & (F.col("cust_nation") == "NATION_2")) \
        | ((F.col("supp_nation") == "NATION_2")
           & (F.col("cust_nation") == "NATION_1"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(rev), 4).cast("double").alias("volume"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q132_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))), 4) AS DOUBLE) AS volume,
       count(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# --- q141: priority counts over EXISTS orders (TPC-H Q4's plan shape) --------
def q141_priority_order_check(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Q4: count orders per priority where ANY lineitem satisfies a
    predicate (bulk line, quantity > 45 — the fixtures carry no
    commit/receipt dates). The EXISTS becomes a left_semi join against
    the PRE-FILTERED fact projection: the predicate prunes lineitem
    before the join, the semi join never duplicates orders (no distinct
    needed), and the count groups the tiny priority key. One fact
    shuffle on l_orderkey; AQE co-locates."""
    o = _t(spark, sf_dir, "orders")
    bulk = _t(spark, sf_dir, "lineitem") \
        .filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.join(bulk, o.o_orderkey == bulk.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q141_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY 1
"""


# --- q139: whole-schema referential-integrity report -------------------------
def q139_referential_integrity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Orphan counts for every FK edge of the star schema in ONE query —
    the integrity report an ingest pipeline runs after each load (q23
    checks one edge; this audits them all). Each edge is a left_anti
    join counted; dimension sides broadcast; the fact sides never
    shuffle. One row per edge, including clean ones (count 0) so a
    silently-skipped edge is indistinguishable from a broken one —
    never vacuous."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")

    edges = [
        ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey",
         False),
        ("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey", True),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey",
         True),
        ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey", True),
        ("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey",
         True),
        ("supplier.s_nationkey->nation", s, "s_nationkey", n, "n_nationkey",
         True),
        ("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey",
         True),
    ]
    parts = []
    for name, child, fk, parent, pk, bcast in edges:
        par = parent.select(pk)
        if bcast:
            par = F.broadcast(par)
        parts.append(
            child.join(par, child[fk] == par[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(F.lit(name).alias("fk_edge"), "orphans"))
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


Q139_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS fk_edge, count(*) AS orphans
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem.l_partkey->part', count(*) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem.l_suppkey->supplier', count(*) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders.o_custkey->customer', count(*) FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer.c_nationkey->nation', count(*) FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'supplier.s_nationkey->nation', count(*) FROM supplier s
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
UNION ALL
SELECT 'nation.n_regionkey->region', count(*) FROM nation n
WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
"""


# --- q135: customer order-count distribution (TPC-H Q13's plan shape) --------
def q135_order_count_distribution(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Q13: how many customers placed exactly k orders — INCLUDING
    k = 0, which is the whole point of the shape: the LEFT outer join
    keeps order-less customers, count(o_orderkey) (not count(*)) turns
    their null matches into 0, and a second aggregation folds customers
    into the distribution. Two shuffles (custkey, then the tiny count
    key); the excluded-comment predicate becomes a priority filter on
    the order side (the fixtures carry no o_comment)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders") \
        .filter(F.col("o_orderpriority") != "5-LOW") \
        .select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


Q135_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
             WHERE o_orderpriority <> '5-LOW') o
    ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
GROUP BY 1
"""


# --- q130: disjunctive bracket-predicate join (TPC-H Q19's plan shape) -------
def q130_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue from lineitems matching any of three (brand, size,
    quantity) BRACKETS — the OR-of-ANDs predicate shape. The join stays
    a plain equi hash join on the part key; the disjunction is a
    post-join filter Catalyst can also partially push (the common
    ``p_size BETWEEN 1 AND 40`` hull and per-side IN lists reach the
    scans as PushedFilters). Revenue through the q01 decimal-product
    canon; one row out per bracket so the filter's routing is visible,
    not just its total."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    brackets = [
        ("b1", (F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 15)),
        ("b2", (F.col("p_brand") == "Brand#2")
         & F.col("p_size").between(5, 20)
         & F.col("l_quantity").between(10, 30)),
        ("b3", (F.col("p_brand") == "Brand#3")
         & F.col("p_size").between(15, 40)
         & F.col("l_quantity").between(25, 50)),
    ]
    tag = F.coalesce(*[F.when(c, F.lit(n)) for n, c in brackets])
    return (
        j.withColumn("bracket", tag)
        .filter(F.col("bracket").isNotNull())
        .groupBy("bracket")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.round(F.sum((F.col("l_extendedprice")
                            * (1 - F.col("l_discount")))
                           .cast("decimal(18,6)")), 4).cast("double")
             .alias("revenue"))
    )


Q130_SQL = """
SELECT CASE
         WHEN p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
              AND l.l_quantity BETWEEN 1 AND 15 THEN 'b1'
         WHEN p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
              AND l.l_quantity BETWEEN 10 AND 30 THEN 'b2'
         WHEN p.p_brand = 'Brand#3' AND p.p_size BETWEEN 15 AND 40
              AND l.l_quantity BETWEEN 25 AND 50 THEN 'b3'
       END AS bracket,
       count(*) AS n_items,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 15 AND 40
       AND l.l_quantity BETWEEN 25 AND 50)
GROUP BY 1
"""


# --- q120: top-revenue supplier over a quarter (TPC-H Q15's plan shape) ------
def q120_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: revenue per supplier over one quarter, return the supplier(s)
    AT the global max — the create-view + scalar-max shape. The max
    arrives as a 1-row broadcast (no second scan shuffle: the revenue
    agg is computed once and feeds both the max and the filter; AQE
    reuses the exchange). Equality is tested on the EXACT decimal
    revenue, never the rounded double — a max tie must not appear or
    vanish on a 4-dp rounding edge."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
                  # explicit: the supplier join infers this on the stream
                  # side only; stating it on the shared base keeps both
                  # subtrees canonically EQUAL so the exchange is reused
                  & F.col("l_suppkey").isNotNull())
        .groupBy("l_suppkey")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast("decimal(18,6)")).alias("_rev"))
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name",
                F.round(F.col("_rev"), 4).cast("double").alias("total_revenue"))
    )


Q120_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS _rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
       CAST(round(r._rev, 4) AS DOUBLE) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r._rev = (SELECT max(_rev) FROM rev)
"""


# --- q121: large-volume customers (TPC-H Q18's plan shape) -------------------
def q121_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 300, with customer
    attribution. The HAVING agg reduces the fact to a handful of
    orderkeys BEFORE any dimension join — written agg-first so AQE
    broadcasts the tiny qualified side into orders and customer instead
    of shuffling the big tables toward a predicate that kills 99.9% of
    rows. Quantity sums as DECIMAL (integral values, exact) so the >300
    boundary cannot flip on partial-agg order."""
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_q"))
           .filter(F.col("_q") > 300))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice",
                F.col("_q").cast("double").alias("sum_qty"))
    )


Q121_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(b._q AS DOUBLE) AS sum_qty
FROM (SELECT l_orderkey,
             sum(CAST(l_quantity AS DECIMAL(18,4))) AS _q
      FROM lineitem GROUP BY 1 HAVING _q > 300) b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# --- q122: supplier variety per part line (TPC-H Q16's plan shape) -----------
def q122_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct suppliers per (brand, type), EXCLUDING a blocklist
    of suppliers (negative balance stands in for the comment-pattern
    complainers — the fixture has no s_comment). Plan ingredients:
    fact → distinct pair reduction first (the countDistinct's heavy
    lifting happens on (partkey, suppkey), far smaller than lineitem),
    a broadcast ANTI join for the blocklist, and part joined AFTER the
    reduction — at 100 TB part is lineitem/5 in keys, so joining it
    against the distinct pairs, not raw lineitem, is the difference
    between a dim-sized and a fact-sized shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = _t(spark, sf_dir, "supplier") \
        .filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = _t(spark, sf_dir, "part")
    return (
        pairs.join(F.broadcast(bad),
                   pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q122_SQL = """
SELECT p.p_brand, p.p_type, count(DISTINCT x.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) x
JOIN part p ON x.l_partkey = p.p_partkey
WHERE x.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


# --- q123: important nation/part value shares (TPC-H Q11's plan shape) -------
def q123_nation_part_value_share(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Q11: (nation, part) shipped-value groups worth more than a
    FRACTION of the global total — the group-vs-global-scalar shape.
    One agg produces the groups; the global total is their re-sum
    broadcast back as one row (second pass over the small GROUPED data,
    never the fact). Values sum as DECIMAL(18,6) products so group and
    total are exact — both engines then derive the 0.0001·total
    boundary from identical operands, and a group cannot flip sides on
    partial-sum order."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum((F.col("l_extendedprice") * F.col("l_quantity"))
                   .cast("decimal(18,6)")).alias("_val"))
    )
    total = v.agg(F.sum("_val").alias("_tot"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("_val").cast("double")
                > F.lit(0.0001) * F.col("_tot").cast("double"))
        .select("n_name", "l_partkey",
                F.round(F.col("_val"), 4).cast("double").alias("value"))
    )


Q123_SQL = """
WITH v AS (
  SELECT n.n_name, l.l_partkey,
         sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(18,6)))
           AS _val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, l_partkey, CAST(round(_val, 4) AS DOUBLE) AS value
FROM v
WHERE CAST(_val AS DOUBLE) > 0.0001 * (SELECT CAST(sum(_val) AS DOUBLE)
                                       FROM v)
"""


# --- q124: dominant part suppliers (TPC-H Q20's share shape) -----------------
def q124_dominant_part_suppliers(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Q20 re-keyed to the fixture (no partsupp availability → shipped
    share): suppliers who shipped more than 10% of a part's total
    quantity. ONE scan of the fact: the per-part total re-sums the
    already-reduced per-(part, supplier) table (|parts x suppliers| rows)
    instead of re-aggregating raw lineitem — exactly how the oracle
    derives pt FROM ps. Decimal sums are associative, so the two-level
    rollup is value-identical and the 10% boundary derives from
    identical operands on both engines. The supplier dim broadcasts
    for names."""
    li = _t(spark, sf_dir, "lineitem")
    # Explicit isnotnull on the shared base keeps both subtrees (ps and
    # the pt rollup over it) canonically equal so AQE materializes the
    # per-(part,supplier) aggregation ONCE (ReusedExchange) — without it
    # the downstream joins infer different null filters per branch and
    # the fact is scanned twice (the q120 lesson).
    li = li.filter(F.col("l_partkey").isNotNull()
                   & F.col("l_suppkey").isNotNull())
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_q")))
    pt = ps.groupBy("l_partkey").agg(F.sum("_q").alias("_t"))
    s = _t(spark, sf_dir, "supplier")
    return (
        ps.join(pt, "l_partkey")
        .filter(F.col("_q").cast("double")
                > F.lit(0.10) * F.col("_t").cast("double"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "l_partkey",
                F.col("_q").cast("double").alias("part_qty"),
                F.round(F.col("_q").cast("double")
                        / F.col("_t").cast("double"), 6).alias("part_share"))
    )


Q124_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,4))) AS _q
  FROM lineitem GROUP BY 1, 2
), pt AS (
  SELECT l_partkey, sum(_q) AS _t FROM ps GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, ps.l_partkey,
       CAST(ps._q AS DOUBLE) AS part_qty,
       round(CAST(ps._q AS DOUBLE) / CAST(pt._t AS DOUBLE), 6) AS part_share
FROM ps
JOIN pt ON ps.l_partkey = pt.l_partkey
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
WHERE CAST(ps._q AS DOUBLE) > 0.10 * CAST(pt._t AS DOUBLE)
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_revenue_by_region": q03_revenue_by_region,
    "q04_brand_volume": q04_brand_volume,
    "q05_customers_with_big_orders": q05_customers_with_big_orders,
    "q06_customers_without_orders": q06_customers_without_orders,
    "q07_top_orders_per_customer": q07_top_orders_per_customer,
    "q08_running_customer_spend": q08_running_customer_spend,
    "q09_order_gap": q09_order_gap,
    "q10_distinct_pairs": q10_distinct_pairs,
    "q11_rollup": q11_rollup,
    "q12_cube": q12_cube,
    "q13_set_ops": q13_set_ops,
    "q14_scalar_functions": q14_scalar_functions,
    "q15_monthly_order_stats": q15_monthly_order_stats,
    "q16_top_lineitems": q16_top_lineitems,
    "q17_max_key": q17_max_key,
    "q18_json_extract": q18_json_extract,
    "q19_ndv_exact": q19_ndv_exact,
    "q47_grouping_sets": q47_grouping_sets,
    "q48_percentiles": q48_percentiles,
    "q49_salted_join": q49_salted_join,
    "q102_market_share": q102_market_share,
    "q113_latest_shipper": q113_latest_shipper,
    "q118_idle_rich_customers": q118_idle_rich_customers,
    "q120_top_revenue_supplier": q120_top_revenue_supplier,
    "q121_large_volume_customers": q121_large_volume_customers,
    "q122_part_supplier_variety": q122_part_supplier_variety,
    "q123_nation_part_value_share": q123_nation_part_value_share,
    "q124_dominant_part_suppliers": q124_dominant_part_suppliers,
    "q130_bracket_revenue": q130_bracket_revenue,
    "q131_promo_revenue_share": q131_promo_revenue_share,
    "q132_nation_volume": q132_nation_volume,
    "q135_order_count_distribution": q135_order_count_distribution,
    "q139_referential_integrity": q139_referential_integrity,
    "q141_priority_order_check": q141_priority_order_check,
    "q87_window_breadth": q87_window_breadth,
    "q88_array_functions": q88_array_functions,
}

ORACLES = {
    "q01_pricing_summary": Q01_SQL,
    "q02_filter_project": Q02_SQL,
    "q03_revenue_by_region": Q03_SQL,
    "q04_brand_volume": Q04_SQL,
    "q05_customers_with_big_orders": Q05_SQL,
    "q06_customers_without_orders": Q06_SQL,
    "q07_top_orders_per_customer": Q07_SQL,
    "q08_running_customer_spend": Q08_SQL,
    "q09_order_gap": Q09_SQL,
    "q10_distinct_pairs": Q10_SQL,
    "q11_rollup": Q11_SQL,
    "q12_cube": Q12_SQL,
    "q13_set_ops": Q13_SQL,
    "q14_scalar_functions": Q14_SQL,
    "q15_monthly_order_stats": Q15_SQL,
    "q16_top_lineitems": Q16_SQL,
    "q17_max_key": Q17_SQL,
    "q18_json_extract": Q18_SQL,
    "q19_ndv_exact": Q19_SQL,
    "q47_grouping_sets": Q47_SQL,
    "q48_percentiles": Q48_SQL,
    "q49_salted_join": Q49_SQL,
    "q102_market_share": Q102_SQL,
    "q113_latest_shipper": Q113_SQL,
    "q118_idle_rich_customers": Q118_SQL,
    "q120_top_revenue_supplier": Q120_SQL,
    "q121_large_volume_customers": Q121_SQL,
    "q122_part_supplier_variety": Q122_SQL,
    "q123_nation_part_value_share": Q123_SQL,
    "q124_dominant_part_suppliers": Q124_SQL,
    "q130_bracket_revenue": Q130_SQL,
    "q131_promo_revenue_share": Q131_SQL,
    "q132_nation_volume": Q132_SQL,
    "q135_order_count_distribution": Q135_SQL,
    "q139_referential_integrity": Q139_SQL,
    "q141_priority_order_check": Q141_SQL,
    "q87_window_breadth": Q87_SQL,
    "q88_array_functions": Q88_SQL,
}
