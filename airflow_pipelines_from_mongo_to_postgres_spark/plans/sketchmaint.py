"""Sketch-rollup plans: persisted mergeable partials instead of rescans.

The pattern under test (operators/sketches.py): build per-day partial
sketch tables once, answer every later rollup by UNIONING sketches —
the aggregate-maintenance move that replaces the reference's
re-read-everything-daily schedule (ref ``dags/includes/user_table.py``)
with work proportional to |partials|, not |lake|.

Gating follows q45's convention for approximate operators: the raw
estimates are engine-specific, so the ORACLE-CHECKED output is exact
values plus deterministic boolean claims (Spark's sketches are
deterministic for fixed data, so the booleans are stable):
- q142: HLL rollup-of-daily-partials == rollup-of-WEEKLY-partials
  (granularity invariance: the union state is a function of the coupon
  SET, not of how the partials sliced it — the property that makes the
  partial table's batch boundaries irrelevant). NOTE the direct
  whole-data sketch is NOT claimed equal: DataSketches' direct HLL_4
  sketch and the union's HLL_8 gadget use different estimator paths and
  disagree by a fraction of a percent (observed at sf0.1), so the
  direct path only backs the within-5%-of-exact claims. Theta rollup
  within 5% as well.
- q143: KLL merged-partial quantiles land within ±3.5% TRUE rank of the
  target (k=200 → ~1.65% rank error at 99% confidence; merge is not
  bit-identical to a direct sketch, so the claim is rank accuracy, the
  guarantee KLL actually makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators import sketches as sk
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table


# --- q142: HLL/theta NDV — daily partials rolled up per event_type ----------
def q142_sketch_ndv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily (event_type, day) HLL + theta partials over ``events``,
    rolled up to event_type; granularity-invariance claim checked by
    rolling up an independently-built WEEKLY partial table, accuracy
    claims against exact NDV. One scan builds the partials; every
    rollup after that touches only the partial table."""
    e = load_table(spark, "events", sf_dir) \
        .select("event_type", F.to_date("ts").alias("day"),
                F.weekofyear("ts").alias("week"), "user_id")

    hll_daily = sk.hll_partials(e, ["event_type", "day"], "user_id", lgk=12)
    hll_roll = sk.hll_rollup(hll_daily, ["event_type"], out_col="ndv_roll")
    hll_weekly = sk.hll_partials(e, ["event_type", "week"], "user_id", lgk=12)
    week_roll = sk.hll_rollup(hll_weekly, ["event_type"], out_col="ndv_wk")
    theta_daily = sk.theta_partials(e, ["event_type", "day"], "user_id")
    theta_roll = sk.theta_rollup(theta_daily, ["event_type"],
                                 sketch_col="theta_sketch",
                                 out_col="ndv_theta")

    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("ndv_exact"),
        F.countDistinct("day").alias("days"))

    out = exact.join(hll_roll, "event_type") \
               .join(week_roll, "event_type") \
               .join(theta_roll, "event_type")
    tol = F.col("ndv_exact") * F.lit(0.05)
    return out.select(
        "event_type", "ndv_exact", "days",
        (F.col("ndv_roll") == F.col("ndv_wk")).alias("granularity_invariant"),
        (F.abs(F.col("ndv_roll") - F.col("ndv_exact")) <= tol)
        .alias("hll_within_5pct"),
        (F.abs(F.col("ndv_theta") - F.col("ndv_exact")) <= tol)
        .alias("theta_within_5pct"),
    )


Q142_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS ndv_exact,
       count(DISTINCT CAST(ts AS DATE)) AS days,
       TRUE AS granularity_invariant,
       TRUE AS hll_within_5pct,
       TRUE AS theta_within_5pct
FROM events
GROUP BY 1
"""


# --- q143: KLL quantiles — monthly partials merged per returnflag -----------
def q143_sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly (l_returnflag, month) KLL partials of l_extendedprice
    merged per returnflag; p50/p95 estimates validated by their TRUE
    rank (one broadcast join of the 3-row estimate table back onto the
    fact — the check costs one extra scan, the production rollup none)."""
    li = load_table(spark, "lineitem", sf_dir) \
        .select("l_returnflag",
                F.date_trunc("month", "l_shipdate").alias("month"),
                "l_extendedprice")

    parts = sk.kll_partials(li, ["l_returnflag", "month"],
                            "l_extendedprice", k=200)
    merged = sk.kll_merged(parts, ["l_returnflag"])
    est = sk.kll_quantiles(merged, [0.5, 0.95])

    ranks = li.join(F.broadcast(est), "l_returnflag").groupBy(
        "l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.when(F.col("l_extendedprice") <= F.col("p50"), 1)
               .otherwise(0)) / F.count(F.lit(1))).alias("__r50"),
        (F.sum(F.when(F.col("l_extendedprice") <= F.col("p95"), 1)
               .otherwise(0)) / F.count(F.lit(1))).alias("__r95"))
    return ranks.select(
        "l_returnflag", "n_rows",
        (F.abs(F.col("__r50") - 0.5) <= F.lit(0.035)).alias("p50_rank_ok"),
        (F.abs(F.col("__r95") - 0.95) <= F.lit(0.035)).alias("p95_rank_ok"),
    ).orderBy("l_returnflag")


Q143_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       TRUE AS p50_rank_ok,
       TRUE AS p95_rank_ok
FROM lineitem
GROUP BY 1
ORDER BY 1
"""


# --- q147: audience overlap via theta set algebra ---------------------------
def q147_distinct_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-period distinct-user overlap per event_type: how many users
    were active in BOTH halves of the month, and how many only in the
    second — answered from per-period theta sketches via
    theta_intersection / theta_difference (operators/sketches.py). At
    100 TB the sketches are the precomputed per-segment artifact; any
    pairwise overlap is sketch algebra, never a rescan. Gated like q45:
    exact counts (one distinct + joins) plus deterministic booleans
    asserting the sketch estimates agree within 5% (our segment NDVs sit
    below theta's 2^12 sampling threshold, where theta is exact — the
    claim still holds headroom for bigger fixtures)."""
    e = load_table(spark, "events", sf_dir) \
        .select("event_type", F.dayofmonth("ts").alias("dom"), "user_id")
    h1 = e.filter(F.col("dom") <= 15)
    h2 = e.filter(F.col("dom") > 15)

    t1 = sk.theta_partials(h1, ["event_type"], "user_id")
    t2 = sk.theta_partials(h2, ["event_type"], "user_id")
    est = sk.theta_set_estimates(t1, t2, ["event_type"])

    d1 = h1.select("event_type", "user_id").distinct()
    d2 = h2.select("event_type", "user_id").distinct()
    # LEFT join from d1 marks membership in h2; a group where every h1
    # user re-appears in h2 still yields a row with only_h1_exact = 0
    # (an inner join of separate both/only aggregates would DROP it —
    # the sf0.001 shape, where the month's halves share all users)
    exact = d1.join(d2.withColumn("__in2", F.lit(1)),
                    ["event_type", "user_id"], "left") \
        .groupBy("event_type").agg(
            F.sum(F.coalesce(F.col("__in2"), F.lit(0))).alias("both_exact"),
            F.sum(F.when(F.col("__in2").isNull(), 1).otherwise(0))
            .alias("only_h1_exact"))

    out = exact.join(est, "event_type")
    return out.select(
        "event_type", "both_exact", "only_h1_exact",
        (F.abs(F.col("inter_est") - F.col("both_exact"))
         <= F.greatest(F.col("both_exact") * F.lit(0.05), F.lit(1.0)))
        .alias("inter_within_5pct"),
        (F.abs(F.col("a_not_b_est") - F.col("only_h1_exact"))
         <= F.greatest(F.col("only_h1_exact") * F.lit(0.05), F.lit(1.0)))
        .alias("diff_within_5pct"),
    ).orderBy("event_type")


Q147_SQL = """
WITH h1 AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE CAST(extract(day FROM ts) AS BIGINT) <= 15
),
h2 AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE CAST(extract(day FROM ts) AS BIGINT) > 15
)
SELECT h1.event_type,
       CAST(count(h2.user_id) AS BIGINT) AS both_exact,
       CAST(count(*) - count(h2.user_id) AS BIGINT) AS only_h1_exact,
       TRUE AS inter_within_5pct,
       TRUE AS diff_within_5pct
FROM h1 LEFT JOIN h2
  ON h1.event_type = h2.event_type AND h1.user_id = h2.user_id
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "q142_sketch_ndv_rollup": q142_sketch_ndv_rollup,
    "q143_sketch_quantile_rollup": q143_sketch_quantile_rollup,
    "q147_distinct_overlap_theta": q147_distinct_overlap_theta,
}

ORACLES = {
    "q142_sketch_ndv_rollup": Q142_SQL,
    "q143_sketch_quantile_rollup": Q143_SQL,
    "q147_distinct_overlap_theta": Q147_SQL,
}
