"""Declarative expectations runner (functions/expectations.py): planted
violations are counted exactly, NULL keys stay countable in uniqueness,
and the compiled battery keeps the single-scan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import (
    expectations as X,
)


def _report(df, checks):
    return {r["check"]: (r["violations"], r["rows_checked"], r["passed"])
            for r in X.run_expectations(df, checks).collect()}


def test_planted_violations_counted_exactly(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (3, 99.0, "A"), (3, 5.0, None)],
        "id long, v double, tag string")
    rep = _report(df, [
        X.not_null("v"),
        X.in_range("v", 0.0, 50.0),
        X.in_set("tag", ["A", "B"]),
        X.unique(["id"]),
    ])
    assert rep["not_null(v)"] == (1, 4, False)
    # NULL v does not violate the range check (not_null owns that finding)
    assert rep["in_range(v,0.0,50.0)"] == (1, 4, False)
    # NULL tag passes membership
    assert rep["in_set(tag)"] == (0, 4, True)
    assert rep["unique(id)"] == (1, 4, False)


def test_unique_counts_null_keys(spark):
    """Two rows with a NULL key are DUPLICATES of each other — the
    struct wrapper keeps them in the distinct count (a bare multi-column
    count-distinct would drop them and under-report)."""
    df = spark.createDataFrame(
        [(None, 1), (None, 1), (1, 1)], "k1 int, k2 int")
    rep = _report(df, [X.unique(["k1", "k2"])])
    assert rep["unique(k1,k2)"] == (1, 3, False)


def test_fk_orphans_and_custom(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    dim = spark.createDataFrame([(1,), (2,)], "dk long")
    rep = _report(fact, [
        X.fk(["k"], dim, ["dk"]),
        X.custom("k_positive", F.col("k") > 0),
    ])
    assert rep["fk(k)"] == (1, 3, False)
    assert rep["custom(k_positive)"] == (0, 3, True)


def test_matches_and_clean_checks_still_reported(spark):
    df = spark.createDataFrame([("F",), ("O",), ("x",)], "s string")
    rep = _report(df, [X.matches("s", "^[FO]$"), X.not_null("s")])
    assert rep["matches(s)"] == (1, 3, False)
    assert rep["not_null(s)"] == (0, 3, True)   # clean check present


def test_battery_compiles_to_one_scan(spark):
    """All row-level + unique checks must land in ONE aggregate over the
    source: exactly one scan of the input in the physical plan."""
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("m"))
    out = X.run_expectations(df, [
        X.not_null("id"), X.in_range("m", 0, 5), X.unique(["id"]),
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_fk_broadcast_is_size_gated(spark):
    """An FK dimension over the broadcast threshold must NOT be force-
    broadcast (a 10^9-key dimension would OOM the driver): the planned
    anti-join degrades to a shuffled join. Under the threshold the hint
    stays. AQE may still upgrade the big case at RUNTIME from observed
    sizes — so we assert on the pre-execution (spark) plan."""
    fact = spark.createDataFrame([(1,), (2,), (999_999,)], "k long")
    dim = spark.range(0, 50_000).select(F.col("id").alias("dk"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = X.run_expectations(fact, [X.fk(["k"], dim, ["dk"])],
                                 broadcast_threshold=1)
        big_plan = big._jdf.queryExecution().sparkPlan().toString()
        small = X.run_expectations(fact, [X.fk(["k"], dim, ["dk"])],
                                   broadcast_threshold=1 << 30)
        small_plan = small._jdf.queryExecution().sparkPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    anti_bcast = [ln for ln in big_plan.splitlines()
                  if "LeftAnti" in ln and "Broadcast" in ln]
    assert not anti_bcast, big_plan
    assert any("LeftAnti" in ln and "Broadcast" in ln
               for ln in small_plan.splitlines()), small_plan
    # correctness identical on both paths
    rows = {r["check"]: r["violations"] for r in big.collect()}
    assert rows["fk(k)"] == 1
