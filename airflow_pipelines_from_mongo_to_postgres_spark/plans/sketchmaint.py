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


QUERIES = {
    "q142_sketch_ndv_rollup": q142_sketch_ndv_rollup,
    "q143_sketch_quantile_rollup": q143_sketch_quantile_rollup,
}

ORACLES = {
    "q142_sketch_ndv_rollup": Q142_SQL,
    "q143_sketch_quantile_rollup": Q143_SQL,
}
