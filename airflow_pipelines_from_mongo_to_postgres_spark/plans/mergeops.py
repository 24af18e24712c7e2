"""Merge / keygen semantics (SURVEY.md §2.5–§2.6) exercised over the driver
fixtures so the DuckDB oracle can verify them.

The scenario mirrors the reference's daily-update path (ref
dags/mongo_to_postgres_updation.py + dags/includes/utils.py): a warehouse
"target" state plus an incoming "updates" batch, both derived
deterministically from the ``orders`` / ``customer`` tables:

* target  = orders with ``o_orderkey % 3 != 0``      (yesterday's warehouse)
* updates = orders with ``o_orderdate >= 1999-01-01``, with mutated mutable
  columns (status → 'U', totalprice × 1.1)           (today's S3 drop)

M1–M10 semantics: on key match only the mutable subset refreshes; frozen
columns keep first-insert values (ref user_table.py:106-110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators.keygen import assign_surrogate_keys
from airflow_pipelines_from_mongo_to_postgres_spark.operators.merge import (
    insert_if_absent,
    merge_upsert,
)
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table

_CUTOFF = "1999-01-01"


def _target(spark, sf_dir) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.filter(F.col("o_orderkey") % 3 != 0)


def _updates(spark, sf_dir) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.filter(F.col("o_orderdate") >= F.lit(_CUTOFF).cast("timestamp"))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 4))
    )


# --- q20: upsert with partial column update (M1–M10) ------------------------
def q20_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = merge_upsert(
        _target(spark, sf_dir), _updates(spark, sf_dir),
        key="o_orderkey", mutable=["o_orderstatus", "o_totalprice"],
    )
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority",
    )


Q20_SQL = f"""
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
     updates AS (
       SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
              round(o_totalprice * 1.1, 4) AS o_totalprice,
              o_orderdate, o_orderpriority
       FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
     )
SELECT coalesce(t.o_orderkey, u.o_orderkey) AS o_orderkey,
       CASE WHEN u.o_orderkey IS NULL THEN t.o_custkey ELSE coalesce(t.o_custkey, u.o_custkey) END AS o_custkey,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
       round(CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END, 4) AS o_totalprice,
       CASE WHEN u.o_orderkey IS NULL THEN t.o_orderdate ELSE coalesce(t.o_orderdate, u.o_orderdate) END AS o_orderdate,
       CASE WHEN u.o_orderkey IS NULL THEN t.o_orderpriority ELSE coalesce(t.o_orderpriority, u.o_orderpriority) END AS o_orderpriority
FROM target t FULL JOIN updates u ON t.o_orderkey = u.o_orderkey
"""


# --- q21: insert-if-absent (M11–M13, ON CONFLICT DO NOTHING) -----------------
def q21_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = insert_if_absent(_target(spark, sf_dir), _updates(spark, sf_dir),
                           key="o_orderkey")
    # The 'U' group sums 4-dp prices (round(×1.1, 4)), whose exact sum CAN
    # sit on a 2-dp half-boundary — decimal sum, then double, then round.
    return out.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double"), 2).alias("total_value"),
    )


Q21_SQL = f"""
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
     updates AS (
       SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
              round(o_totalprice * 1.1, 4) AS o_totalprice,
              o_orderdate, o_orderpriority
       FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
     ),
     merged AS (
       SELECT * FROM target
       UNION ALL
       SELECT u.* FROM updates u
       WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = u.o_orderkey)
     )
SELECT o_orderstatus, count(*) AS cnt,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
FROM merged GROUP BY o_orderstatus
"""


# --- q22: surrogate-key assignment (J1+J2) -----------------------------------
def q22_surrogate_keygen(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    # Existing warehouse: first 60% of customers with serial ids in c_custkey
    # order (simulates the serial PRIMARY KEY, ref migration DDL). The 60%
    # threshold k rides along as a broadcast 1-row aggregate — no separate
    # driver-side count() job per invocation (the whole scenario stays one
    # lazy plan). The global row_number window is the scenario FIXTURE
    # (serial ids), not the operator; keygen itself windows only the misses.
    kdf = c.agg(F.floor(F.count(F.lit(1)) * 0.6).alias("k"))
    w = Window.orderBy("c_custkey")
    existing = (
        c.join(F.broadcast(kdf)).filter(F.col("c_custkey") <= F.col("k"))
        .select(F.row_number().over(w).cast("long").alias("id"),
                F.col("c_custkey").cast("string").alias("_id"))
    )
    # Incoming batch: overlaps the tail of existing + brand-new keys.
    incoming = (
        c.join(F.broadcast(kdf)).filter(F.col("c_custkey") > F.col("k") * 0.8)
        .select(F.col("c_custkey").cast("string").alias("_id"),
                "c_name", "c_acctbal")
    )
    out = assign_surrogate_keys(existing, incoming, natural_key="_id",
                                surrogate="id")
    return out.select("id", "_id", "c_name")


def _q22_sql(sf_dir: str) -> str:
    # Oracle needs the same k; recompute from the table itself.
    return """
WITH params AS (SELECT CAST(floor(count(*) * 0.6) AS BIGINT) AS k FROM customer),
     existing AS (
       SELECT row_number() OVER (ORDER BY c_custkey) AS id,
              CAST(c_custkey AS VARCHAR) AS _id
       FROM customer, params WHERE c_custkey <= k
     ),
     incoming AS (
       SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal
       FROM customer, params WHERE c_custkey > k * 0.8
     ),
     mx AS (SELECT coalesce(max(id), 0) AS m FROM existing),
     joined AS (
       SELECT i._id, i.c_name, e.id AS existing_id FROM incoming i
       LEFT JOIN existing e ON i._id = e._id
     )
SELECT CASE WHEN existing_id IS NOT NULL THEN existing_id
            ELSE m + row_number() OVER (PARTITION BY (existing_id IS NULL) ORDER BY _id) END AS id,
       _id, c_name
FROM joined, mx
"""


Q22_SQL = _q22_sql("")


# --- q23: referential-integrity validation (J3 as semi/anti audit) -----------
def q23_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the reference declares FKs and relies on load order; Spark has no
    FK enforcement, so the engine validates with an anti join (orphan scan)
    — here counting lineitems whose order/part/supplier parents exist."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    p = load_table(spark, "part", sf_dir)
    ok_orders = li.join(o.select("o_orderkey"),
                        li.l_orderkey == F.col("o_orderkey"), "left_semi")
    orphan_parts = li.join(p.select("p_partkey"),
                           li.l_partkey == F.col("p_partkey"), "left_anti")
    return ok_orders.agg(F.count(F.lit(1)).alias("lineitems_with_parent_order")) \
        .join(orphan_parts.agg(F.count(F.lit(1)).alias("lineitems_orphan_part")))


Q23_SQL = """
SELECT (SELECT count(*) FROM lineitem
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS lineitems_with_parent_order,
       (SELECT count(*) FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)) AS lineitems_orphan_part
"""


# --- q24: idempotency — applying the same batch twice ≡ once ------------------
def q24_merge_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _target(spark, sf_dir)
    u = _updates(spark, sf_dir)
    once = merge_upsert(t, u, key="o_orderkey",
                        mutable=["o_orderstatus", "o_totalprice"])
    twice = merge_upsert(once, u, key="o_orderkey",
                         mutable=["o_orderstatus", "o_totalprice"])
    # Row-level symmetric difference must be empty; emit the count so the
    # oracle can assert 0 (plus total row count as a sanity anchor).
    diff = once.exceptAll(twice).unionAll(twice.exceptAll(once))
    return once.agg(F.count(F.lit(1)).alias("merged_rows")).join(
        diff.agg(F.count(F.lit(1)).alias("idempotency_violations")))


Q24_SQL = f"""
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
     updates AS (SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}')
SELECT (SELECT count(DISTINCT o_orderkey) FROM (
          SELECT o_orderkey FROM target UNION ALL SELECT o_orderkey FROM updates
        )) AS merged_rows,
       CAST(0 AS BIGINT) AS idempotency_violations
"""


# --- q76: snapshot diff (CDC delta between two table states) -----------------
def q76_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots of a keyed table: one
    full-outer join emits insert / update / delete rows (unchanged rows
    drop out). This is the delta the reference's daily DAG derives
    implicitly by re-upserting everything (ref user_table.py:142-167);
    computing it explicitly is what lets a 100 TB pipeline ship only the
    changed rows downstream. One shuffle on the key; change detection is
    a row-local comparison.

    Snapshots are derived deterministically from ``orders``: snapshot A
    drops keys ≡0 (mod 101) (so they surface as inserts in B), snapshot B
    bumps the price of keys ≡0 (mod 97) (updates) and drops keys ≡0
    (mod 103) (deletes)."""
    o = load_table(spark, "orders", sf_dir)
    snap_a = o.filter(F.col("o_orderkey") % 101 != 0) \
        .select("o_orderkey", "o_totalprice")
    snap_b = o.filter(F.col("o_orderkey") % 103 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0,
               F.round(F.col("o_totalprice") * 1.1, 4))
        .otherwise(F.col("o_totalprice")).alias("o_totalprice"))
    a = snap_a.select(F.col("o_orderkey").alias("key"),
                      F.col("o_totalprice").alias("old_price"))
    b = snap_b.select(F.col("o_orderkey").alias("key"),
                      F.col("o_totalprice").alias("new_price"))
    joined = a.join(b, "key", "full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("old_price").isNull(), F.lit("insert"))
            .when(F.col("new_price").isNull(), F.lit("delete"))
            .when(F.col("old_price") != F.col("new_price"), F.lit("update"))
            .otherwise(F.lit("unchanged")))
        .filter(F.col("change_type") != "unchanged")
        .select("key", "change_type", "old_price", "new_price")
    )


Q76_SQL = """
WITH a AS (
  SELECT o_orderkey AS key, o_totalprice AS old_price
  FROM orders WHERE o_orderkey % 101 <> 0
),
b AS (
  SELECT o_orderkey AS key,
         CASE WHEN o_orderkey % 97 = 0 THEN round(o_totalprice * 1.1, 4)
              ELSE o_totalprice END AS new_price
  FROM orders WHERE o_orderkey % 103 <> 0
)
SELECT key,
       CASE WHEN old_price IS NULL THEN 'insert'
            WHEN new_price IS NULL THEN 'delete'
            WHEN old_price <> new_price THEN 'update'
            ELSE 'unchanged' END AS change_type,
       old_price, new_price
FROM a FULL JOIN b USING (key)
WHERE CASE WHEN old_price IS NULL THEN 'insert'
           WHEN new_price IS NULL THEN 'delete'
           WHEN old_price <> new_price THEN 'update'
           ELSE 'unchanged' END <> 'unchanged'
"""


# --- q144: declarative expectations audit in one scan -----------------------
def q144_expectations_audit(spark, sf_dir: str):
    """Post-load quality gate over ``lineitem`` as declarative checks
    (functions/expectations.py): every row-level + uniqueness check
    compiles into ONE aggregate scan, the FK edge into one broadcast
    anti-join. The discount range is set TIGHTER than the data
    (0–0.05 vs TPC-H's 0–0.1) so the report provably counts real
    violations — never vacuously green."""
    from airflow_pipelines_from_mongo_to_postgres_spark.functions import (
        expectations as X,
    )

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return X.run_expectations(li, [
        X.not_null("l_orderkey"),
        X.not_null("l_shipdate"),
        X.in_range("l_discount", 0.0, 0.05),
        X.in_range("l_quantity", 1.0, 50.0),
        X.in_set("l_returnflag", ["A", "N", "R"]),
        X.matches("l_linestatus", "^[FO]$"),
        X.unique(["l_orderkey", "l_linenumber"]),
        X.fk(["l_orderkey"], orders, ["o_orderkey"],
             name="fk(l_orderkey->orders)"),
    ])


Q144_SQL = """
WITH base AS (SELECT count(*) AS n FROM lineitem),
rep AS (
  SELECT 'fk(l_orderkey->orders)' AS chk,
         (SELECT count(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
           AS violations,
         (SELECT n FROM base) AS rows_checked
  UNION ALL
  SELECT 'in_range(l_discount,0.0,0.05)',
         (SELECT count(*) FROM lineitem
           WHERE l_discount < 0.0 OR l_discount > 0.05),
         (SELECT n FROM base)
  UNION ALL
  SELECT 'in_range(l_quantity,1.0,50.0)',
         (SELECT count(*) FROM lineitem
           WHERE l_quantity < 1.0 OR l_quantity > 50.0),
         (SELECT n FROM base)
  UNION ALL
  SELECT 'in_set(l_returnflag)',
         (SELECT count(*) FROM lineitem
           WHERE l_returnflag IS NOT NULL
             AND l_returnflag NOT IN ('A','N','R')),
         (SELECT n FROM base)
  UNION ALL
  SELECT 'matches(l_linestatus)',
         (SELECT count(*) FROM lineitem
           WHERE l_linestatus IS NOT NULL
             AND NOT regexp_matches(l_linestatus, '^[FO]$')),
         (SELECT n FROM base)
  UNION ALL
  SELECT 'not_null(l_orderkey)',
         (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
         (SELECT n FROM base)
  UNION ALL
  SELECT 'not_null(l_shipdate)',
         (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL),
         (SELECT n FROM base)
  UNION ALL
  SELECT 'unique(l_orderkey,l_linenumber)',
         (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber))
            FROM lineitem)
           ,
         (SELECT n FROM base)
)
SELECT chk AS "check", CAST(violations AS BIGINT) AS violations,
       CAST(rows_checked AS BIGINT) AS rows_checked,
       violations = 0 AS passed
FROM rep ORDER BY 1
"""


QUERIES = {
    "q20_merge_upsert": q20_merge_upsert,
    "q21_insert_if_absent": q21_insert_if_absent,
    "q22_surrogate_keygen": q22_surrogate_keygen,
    "q23_fk_orphans": q23_fk_orphans,
    "q24_merge_idempotent": q24_merge_idempotent,
    "q76_snapshot_diff": q76_snapshot_diff,
    "q144_expectations_audit": q144_expectations_audit,
}

ORACLES = {
    "q144_expectations_audit": Q144_SQL,
    "q20_merge_upsert": Q20_SQL,
    "q21_insert_if_absent": Q21_SQL,
    "q22_surrogate_keygen": Q22_SQL,
    "q23_fk_orphans": Q23_SQL,
    "q24_merge_idempotent": Q24_SQL,
    "q76_snapshot_diff": Q76_SQL,
}
