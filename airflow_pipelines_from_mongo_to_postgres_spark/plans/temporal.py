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


# --- q114: ordered conversion funnel (view → click → purchase) ----------------
def q114_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: first view, first click AFTER that view, first
    purchase AFTER that click — the product-analytics pattern ('did the
    user progress IN ORDER', not 'did these events co-occur'). Three
    conditional min-aggregations chained by strictly-later joins, all
    keyed on user_id: one partitioning serves every stage, AQE
    broadcast-joins the shrinking step tables at low SF and
    shuffle-joins them at 100 TB."""
    e = load_table(spark, "events", sf_dir)

    def first_after(etype: str, prev: DataFrame, prev_col: str,
                    out_col: str) -> DataFrame:
        step = e.filter(F.col("event_type") == etype) \
            .select("user_id", "ts")
        return (step.join(prev, "user_id")
                .filter(F.col("ts") > F.col(prev_col))
                .groupBy("user_id",
                         *[c for c in prev.columns if c != "user_id"])
                .agg(F.min("ts").alias(out_col)))

    v = e.filter(F.col("event_type") == "view") \
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c, "t_click", "t_purchase")
    full = (v.join(c.select("user_id", "t_click"), "user_id", "left")
            .join(p.select("user_id", "t_purchase"), "user_id", "left"))
    return full.select(
        "user_id", "t_view", "t_click", "t_purchase",
        (F.lit(1) + F.col("t_click").isNotNull().cast("int")
         + F.col("t_purchase").isNotNull().cast("int")).alias("funnel_depth"),
    )


Q114_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, v.t_view, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY 1, 2
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY 1
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       1 + CAST(c.t_click IS NOT NULL AS INT)
         + CAST(p.t_purchase IS NOT NULL AS INT) AS funnel_depth
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
"""


# --- q115: approximate-percentile sketch with a CHECKABLE claim ---------------
def q115_quantile_claim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q45 pattern applied to quantiles: the raw KLL/GK sketch output
    is engine-specific, so the GATED columns are the exact interpolated
    percentiles plus booleans asserting the sketch landed within 5%
    relative error of each (deterministic for fixed data/accuracy). At
    100 TB the sketch is the only viable path (exact percentile sorts
    every group); this query pins how far it strays."""
    e = load_table(spark, "events", sf_dir)
    agg = e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
        F.round(F.percentile("value", 0.9), 6).alias("p90_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("_a50"),
        F.percentile_approx("value", 0.9, 10000).alias("_a90"),
    )
    tol = lambda a, x: (F.abs(F.col(a) - F.col(x))  # noqa: E731
                        <= F.abs(F.col(x)) * 0.05 + 1e-9)
    return agg.select(
        "event_type", "p50_exact", "p90_exact",
        tol("_a50", "p50_exact").alias("p50_within_5pct"),
        tol("_a90", "p90_exact").alias("p90_within_5pct"),
    )


Q115_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50_exact,
       round(quantile_cont(value, 0.9), 6) AS p90_exact,
       TRUE AS p50_within_5pct,
       TRUE AS p90_within_5pct
FROM events GROUP BY 1
"""


# --- q116: time-weighted average (TWAP / TimescaleDB time_weight shape) -------
def q116_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value with LOCF (step) weighting:
    each observation holds until the next one, so its weight is the gap
    to the successor — the irregular-sampling average that a plain AVG
    gets wrong. One window (lead) and one aggregation, both on user_id:
    a single shuffle. Exactness: value is cast to DECIMAL(18,4) and the
    microsecond gap to DECIMAL(20,0); their product and sum are exact,
    so the final double division is order-independent (the decimal-sum
    canon, tests/test_canon.py)."""
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ (nanos-as-long parquet); unix_micros
    # requires TIMESTAMP — the session is pinned to UTC so the cast is a
    # pure relabel and the gap arithmetic is unaffected
    us = (F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
          - F.unix_micros(F.col("ts").cast("timestamp"))).cast("decimal(20,0)")
    weighted = e.select(
        "user_id",
        (F.col("value").cast("decimal(18,4)") * us).alias("wv"),
        us.alias("dur"),
    ).filter(F.col("dur").isNotNull())
    return (
        weighted.groupBy("user_id")
        .agg(F.sum("wv").alias("_swv"), F.sum("dur").alias("_sd"))
        .select(
            "user_id",
            F.round(F.col("_swv").cast("double")
                    / F.col("_sd").cast("double"), 6).alias("twap"),
            F.col("_sd").cast("long").alias("observed_us"),
        )
    )


Q116_SQL = """
WITH gaps AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,4)) AS v,
         CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) - ts)
              AS DECIMAL(20,0)) AS dur
  FROM events
)
SELECT user_id,
       round(CAST(sum(v * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE), 6)
         AS twap,
       CAST(sum(dur) AS BIGINT) AS observed_us
FROM gaps WHERE dur IS NOT NULL
GROUP BY 1
"""


# --- q117: OHLC candlesticks (hourly open/high/low/close) ---------------------
def q117_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The market-data compaction primitive: per hour, the first (open)
    and last (close) value by (ts, event_id) plus min/max. first/last
    are conditional aggregates over row-number endpoints — two windows
    sharing ONE (hour, ts, event_id) sort, then one hash-agg; no
    self-join. Raw values pass through untouched (no float arithmetic),
    so the hash gate needs no rounding idiom."""
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir) \
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
    asc = Window.partitionBy("hour").orderBy(F.asc("ts"), F.asc("event_id"))
    desc = Window.partitionBy("hour").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    return (
        e.withColumn("_ra", F.row_number().over(asc))
        .withColumn("_rd", F.row_number().over(desc))
        .groupBy("hour")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q117_SQL = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, ts, event_id, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS ra,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT hour,
       max(CASE WHEN ra = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rd = 1 THEN value END) AS close,
       count(*) AS n_events
FROM h GROUP BY 1
"""


# --- q119: KEYLESS interval join — global activity burst after each error ----
def q119_error_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each error event opens a GLOBAL 2-minute window (no user key):
    count and value-sum every event of any user inside it. With no equi
    key, Catalyst's native plan for the band predicate is
    BroadcastNestedLoop — O(|errors|·|events|); ``range_join_bucketed``
    restores a hash join by bucketizing time into 2-minute cells
    (explode fan-out ≤ 2 cells per error). Plan gated nested-loop-free
    in tests/test_plans.py. Value sums as DECIMAL (exact,
    order-independent) then casts double — the established
    cross-engine hash-stability rule for events.value aggregates."""
    e = load_table(spark, "events", sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 MINUTES")).alias("end_ts"),
    )
    joined = temporal.range_join_bucketed(
        errors, e.select("event_id", "ts", "value"),
        left_start="start_ts", left_end="end_ts", right_ts="ts",
        bucket="2 minutes")
    return joined.groupBy("event_id").agg(
        F.count("r_event_id").alias("events_in_burst"),
        F.round(F.sum(F.col("r_value").cast("decimal(18,4)"))
                .cast("double"), 4).alias("burst_value"),
    )


Q119_SQL = """
SELECT x.event_id, count(e.event_id) AS events_in_burst,
       round(CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS burst_value
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') x
JOIN events e
  ON e.ts > x.ts AND e.ts <= x.ts + INTERVAL 2 MINUTE
GROUP BY 1
"""


QUERIES = {
    "q42_asof_join": q42_asof_join,
    "q43_range_join": q43_range_join,
    "q44_time_rollup": q44_time_rollup,
    "q45_approx_ndv": q45_approx_ndv,
    "q105_asof_forward": q105_asof_forward,
    "q114_funnel": q114_funnel,
    "q115_quantile_claim": q115_quantile_claim,
    "q116_twap": q116_twap,
    "q117_ohlc": q117_ohlc,
    "q119_error_burst_windows": q119_error_burst_windows,
}

ORACLES = {
    "q42_asof_join": Q42_SQL,
    "q43_range_join": Q43_SQL,
    "q44_time_rollup": Q44_SQL,
    "q45_approx_ndv": Q45_SQL,
    "q105_asof_forward": Q105_SQL,
    "q114_funnel": Q114_SQL,
    "q115_quantile_claim": Q115_SQL,
    "q116_twap": Q116_SQL,
    "q117_ohlc": Q117_SQL,
    "q119_error_burst_windows": Q119_SQL,
}
