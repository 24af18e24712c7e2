"""Temporal custom-operator plans over the ``events`` fixture: as-of join,
range (interval) join, hypertable-style time rollup, and sketch NDV.

The reference has no temporal analytics (its only time handling is date
columns + a daily schedule, SURVEY.md §2.8); these are the engine's
scale-path extensions. Oracles: DuckDB's native ASOF JOIN independently
checks our union+window as-of implementation — two genuinely different
algorithms, one answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators import temporal
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table


# --- q42: as-of join — last click at-or-before each purchase, per user --------
def q42_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", F.col("value").alias("click_value"))
    return temporal.asof_join(purchases, clicks, keys=["user_id"],
                              left_ts="ts", right_ts="ts",
                              right_cols=["click_value"])


Q42_SQL = """
SELECT p.event_id, p.user_id, p.ts, c.value AS click_value, c.ts AS asof_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --- q43: range join — activity in the 5 minutes after each error, per user ---
def q43_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    joined = temporal.range_join(errors, e, keys=["user_id"],
                                 left_start="start_ts", left_end="end_ts",
                                 right_ts="ts", how="left")
    # value sums as DECIMAL (exact, order-independent) then casts double —
    # round(sum(double)) is the cross-engine hash-flake class every other
    # events.value aggregate already migrated off (streamsql.py header).
    return joined.groupBy("event_id", "user_id").agg(
        F.count("r_event_id").alias("events_after"),
        F.round(F.coalesce(
            F.sum(F.col("r_value").cast("decimal(18,4)")).cast("double"),
            F.lit(0.0)), 4).alias("value_after"),
    )


Q43_SQL = """
SELECT x.event_id, x.user_id, count(e.event_id) AS events_after,
       round(coalesce(CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE), 0), 4) AS value_after
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') x
LEFT JOIN events e
  ON e.user_id = x.user_id AND e.ts > x.ts
  AND e.ts <= x.ts + INTERVAL 5 MINUTE
GROUP BY 1, 2
"""


# --- q44: hypertable-style hierarchical time rollup ----------------------------
def q44_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """day → hour hierarchical rollup (continuous-aggregate shape): one scan
    produces hourly, daily, and grand totals; partial aggregation happens
    map-side, so the shuffle carries one row per (group, grain)."""
    e = load_table(spark, "events", sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    return (
        e.rollup("day", "hour")
        .agg(
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("hour").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("events"),
            # decimal sum: exact and summation-order-independent, so the
            # hash can't flip on engine/parallelism differences; cast to
            # DOUBLE at the end — DecimalType output columns are driver-red
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            .alias("total_value"),
        )
    )


Q44_SQL = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         date_trunc('hour', ts) AS hour, value
  FROM events
)
SELECT day, hour,
       CAST(grouping(day) AS INT) AS g_day,
       CAST(grouping(hour) AS INT) AS g_hour,
       count(*) AS events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM b
GROUP BY ROLLUP (day, hour)
"""


# --- q45: sketch NDV (HyperLogLog++) with a CHECKABLE claim -------------------
def q45_approx_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct = HLL++ partial sketches merged across
    partitions — constant memory per group vs the exact count's
    per-group hash set. The raw estimate is engine-specific (DuckDB's
    sketch differs), so the GATED output is the checkable claim instead:
    the exact NDV plus a boolean asserting the HLL++ estimate landed
    within 5% of it (Spark's HLL++ is deterministic for fixed data/rsd,
    so the boolean is stable). The oracle computes exact NDV and TRUE."""
    e = load_table(spark, "events", sf_dir)
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
        F.countDistinct("user_id").alias("ndv_exact"),
        F.count(F.lit(1)).alias("events"),
    )
    return agg.select(
        "event_type",
        "ndv_exact",
        (F.abs(F.col("_approx") - F.col("ndv_exact"))
         <= F.col("ndv_exact") * F.lit(0.05)).alias("approx_within_5pct"),
        "events",
    )


Q45_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS ndv_exact,
       TRUE AS approx_within_5pct,
       count(*) AS events
FROM events
GROUP BY 1
"""


# --- q105: FORWARD as-of join with tolerance -----------------------------------
def q105_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First click at-or-after each purchase, but only within 10 minutes —
    the forward/tolerance variant of q42 (attribution windows, "next
    action after the event" lookups). Same single-shuffle union+window
    plan as backward as-of: direction only flips the sort order, and the
    tolerance is a post-fill comparison, not a join-shape change. The
    oracle is DuckDB's native ASOF with the reversed inequality plus the
    same tolerance CASE."""
    e = load_table(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", F.col("value").alias("click_value"))
    return temporal.asof_join(purchases, clicks, keys=["user_id"],
                              left_ts="ts", right_ts="ts",
                              right_cols=["click_value"],
                              direction="forward", tolerance="10 minutes")


Q105_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN c.ts <= p.ts + INTERVAL 10 MINUTE THEN c.value END AS click_value,
       CASE WHEN c.ts <= p.ts + INTERVAL 10 MINUTE THEN c.ts END AS asof_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts <= c.ts
"""


QUERIES = {
    "q42_asof_join": q42_asof_join,
    "q43_range_join": q43_range_join,
    "q44_time_rollup": q44_time_rollup,
    "q45_approx_ndv": q45_approx_ndv,
    "q105_asof_forward": q105_asof_forward,
}

ORACLES = {
    "q42_asof_join": Q42_SQL,
    "q43_range_join": Q43_SQL,
    "q44_time_rollup": Q44_SQL,
    "q45_approx_ndv": Q45_SQL,
    "q105_asof_forward": Q105_SQL,
}
