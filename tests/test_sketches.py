"""Mergeable sketch partials (operators/sketches.py): persistence
round-trip, merge associativity, and incremental maintenance parity —
the properties that make per-day sketch tables a valid substitute for
rescanning the lake."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_pipelines_from_mongo_to_postgres_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_type", F.to_date("ts").alias("day"), "user_id")


def test_hll_rollup_of_persisted_partials_granularity_invariant(
        spark, events, tmp_path):
    """Write daily partials to parquet, read back, roll up — the estimate
    must EXACTLY equal a rollup built from WEEKLY partials of the same
    data: the union state is a function of the coupon set, not of the
    partial boundaries. (The DIRECT whole-data sketch is deliberately
    not claimed equal — DataSketches' HLL_4 direct sketch and the
    union's HLL_8 gadget estimate through different paths and differ by
    a fraction of a percent at larger NDV.)"""
    daily = sk.hll_partials(events, ["event_type", "day"], "user_id", lgk=12)
    path = str(tmp_path / "hll_daily")
    daily.write.parquet(path)

    rolled = sk.hll_rollup(spark.read.parquet(path), ["event_type"],
                           out_col="ndv_roll")
    weekly = sk.hll_rollup(
        sk.hll_partials(
            events.withColumn("week", F.weekofyear("day")),
            ["event_type", "week"], "user_id", lgk=12),
        ["event_type"], out_col="ndv_wk")
    joined = {r["event_type"]: (r["ndv_roll"], r["ndv_wk"])
              for r in rolled.join(weekly, "event_type").collect()}
    assert joined and all(a == b for a, b in joined.values())


def test_hll_incremental_append_matches_full_recompute(spark, events):
    """The maintenance loop: standing partials + a new day's partial,
    unioned, equals the full recompute — no rescan of history."""
    old = events.filter(F.col("day") < F.lit("2024-01-15"))
    new = events.filter(F.col("day") >= F.lit("2024-01-15"))
    assert old.count() > 0 and new.count() > 0, "fixture must straddle the split"

    standing = sk.hll_partials(old, ["event_type", "day"], "user_id")
    delta = sk.hll_partials(new, ["event_type", "day"], "user_id")
    incr = sk.hll_rollup(standing.unionByName(delta), ["event_type"],
                         out_col="ndv")
    full = sk.hll_rollup(
        sk.hll_partials(events, ["event_type", "day"], "user_id"),
        ["event_type"], out_col="ndv")
    got = {r["event_type"]: r["ndv"] for r in incr.collect()}
    want = {r["event_type"]: r["ndv"] for r in full.collect()}
    assert got == want


def test_theta_rollup_accuracy(spark, events):
    roll = sk.theta_rollup(
        sk.theta_partials(events, ["event_type", "day"], "user_id"),
        ["event_type"])
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("ndv"))
    for r in roll.join(exact, "event_type").collect():
        assert abs(r["ndv_est"] - r["ndv"]) <= max(1.0, 0.05 * r["ndv"])


def test_kll_merged_quantiles_rank_accuracy(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_returnflag",
                F.date_trunc("month", "l_shipdate").alias("month"),
                "l_extendedprice")
    parts = sk.kll_partials(li, ["l_returnflag", "month"],
                            "l_extendedprice", k=200)
    est = sk.kll_quantiles(sk.kll_merged(parts, ["l_returnflag"]),
                           [0.5, 0.95])
    checks = li.join(F.broadcast(est), "l_returnflag").groupBy(
        "l_returnflag").agg(
        (F.sum(F.when(F.col("l_extendedprice") <= F.col("p50"), 1)
               .otherwise(0)) / F.count(F.lit(1))).alias("r50"),
        (F.sum(F.when(F.col("l_extendedprice") <= F.col("p95"), 1)
               .otherwise(0)) / F.count(F.lit(1))).alias("r95")).collect()
    assert checks
    for r in checks:
        assert abs(r["r50"] - 0.5) <= 0.035, r
        assert abs(r["r95"] - 0.95) <= 0.035, r


def test_kll_merged_single_partial_group(spark):
    """A rollup group with exactly ONE partial must survive the fold
    (slice of an empty tail + element_at(1) seed)."""
    df = spark.range(0, 100).select(
        F.lit("only").alias("g"), F.lit("m1").alias("sub"),
        F.col("id").cast("double").alias("x"))
    parts = sk.kll_partials(df, ["g", "sub"], "x", k=200)
    out = sk.kll_quantiles(sk.kll_merged(parts, ["g"]), [0.5]).collect()
    assert len(out) == 1 and 40.0 <= out[0]["p50"] <= 60.0


def test_sketch_plan_is_python_free(spark, events):
    """The partial+rollup plan must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython / mapInPandas nodes anywhere."""
    plan = sk.hll_rollup(
        sk.hll_partials(events, ["event_type", "day"], "user_id"),
        ["event_type"])._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_streaming_ndv_sketch_ledger_matches_batch(spark, tmp_path):
    """Two drop-folder files drained via AvailableNow build an HLL
    partial ledger in a snapshot table; the rollup over the ledger
    equals a one-shot batch recompute over all the data — the streaming
    twin of the q142 maintenance pattern."""
    import pyspark.sql.functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.sources import snapshots as S
    from airflow_pipelines_from_mongo_to_postgres_spark.streaming.incremental import (
        run_incremental_ndv_sketches,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    d1 = spark.range(0, 500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 117).alias("u"))
    d2 = spark.range(500, 1200).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 411).alias("u"))
    d1.write.parquet(str(drop / "f1"))
    d2.write.parquet(str(drop / "f2"))

    table = str(tmp_path / "ndv_ledger")
    run_incremental_ndv_sketches(
        spark, f"{drop}/*", "g string, u long", table, ["g"], "u",
        checkpoint_dir=str(tmp_path / "ckpt"))

    rolled = sk.hll_rollup(S.read_snapshot(spark, table), ["g"],
                           out_col="ndv")
    full = sk.hll_rollup(
        sk.hll_partials(d1.unionByName(d2), ["g"], "u"), ["g"],
        out_col="ndv")
    got = {r["g"]: r["ndv"] for r in rolled.collect()}
    want = {r["g"]: r["ndv"] for r in full.collect()}
    assert got == want and len(got) == 3

    # a SECOND stream (fresh checkpoint -> restarts at epoch 0) feeding
    # the SAME ledger must not collide with the first stream's epoch-0
    # txn: the txn id is namespaced by stream/checkpoint, so its batches
    # land instead of silently no-opping
    drop2 = tmp_path / "drop2"
    drop2.mkdir()
    d3 = spark.range(5000, 5100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("u"))
    d3.write.parquet(str(drop2 / "f3"))
    run_incremental_ndv_sketches(
        spark, f"{drop2}/*", "g string, u long", table, ["g"], "u",
        checkpoint_dir=str(tmp_path / "ckpt2"))
    rolled2 = sk.hll_rollup(S.read_snapshot(spark, table), ["g"],
                            out_col="ndv")
    full2 = sk.hll_rollup(
        sk.hll_partials(d1.unionByName(d2).unionByName(d3), ["g"], "u"),
        ["g"], out_col="ndv")
    got2 = {r["g"]: r["ndv"] for r in rolled2.collect()}
    want2 = {r["g"]: r["ndv"] for r in full2.collect()}
    assert got2 == want2
    assert any(got2[k] != got[k] for k in got2)   # second stream landed


def test_theta_set_estimates_exact_below_threshold(spark):
    """Below theta's sampling threshold the sketches are exact, so
    intersection/difference estimates equal the true counts — including
    the fully-disjoint and fully-contained edges."""
    a = spark.range(0, 300).select(F.lit("g").alias("k"), F.col("id").alias("v"))
    b = spark.range(200, 500).select(F.lit("g").alias("k"), F.col("id").alias("v"))
    ta = sk.theta_partials(a, ["k"], "v")
    tb = sk.theta_partials(b, ["k"], "v")
    r = sk.theta_set_estimates(ta, tb, ["k"]).collect()[0]
    assert round(r["inter_est"]) == 100       # [200,300)
    assert round(r["a_not_b_est"]) == 200     # [0,200)

    disj = sk.theta_partials(
        spark.range(1000, 1100).select(F.lit("g").alias("k"),
                                       F.col("id").alias("v")), ["k"], "v")
    r2 = sk.theta_set_estimates(ta, disj, ["k"]).collect()[0]
    assert round(r2["inter_est"]) == 0
    assert round(r2["a_not_b_est"]) == 300
