"""Unit + plan tests for the analytics breadth module (q65–q72): TF-IDF,
word frequency, sessionization, pivot/unpivot, aggregate-join filter,
histogram, and time-spine gap-fill. Oracle-differential value checks run
in tools/check_oracle.py; these tests pin behavior on tiny literal frames
and gate the physical-plan properties the module's docstrings claim."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.plans import analytics


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_sessionize_splits_on_gap(spark, sf_dir):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(offset_min):
        return t0 + dt.timedelta(minutes=offset_min)

    rows = [
        # user 1: two sessions (gap of 45 min between minute 10 and 55)
        (1, 1, m(0), 1.0), (2, 1, m(10), 2.0), (3, 1, m(55), 4.0),
        # user 2: one session, exactly-30-min gap does NOT split (> not >=)
        (4, 2, m(0), 1.0), (5, 2, m(30), 1.0),
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    # replicate q67's logic on the literal frame (q67 itself reads sf_dir)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    boundary = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    sess = (
        e.withColumn("session_seq", F.sum(boundary).over(run))
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r["user_id"], r["session_seq"]): r["n_events"] for r in sess.collect()}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 2}


def test_sessionize_single_window_sort(spark, sf_dir):
    # lag and running-sum share one (user_id, ts, event_id) sort: the plan
    # must shuffle/sort once, not once per window function.
    plan = _formatted_plan(analytics.q67_sessionize(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") <= 2, plan


def test_word_frequency_no_global_presort_window(spark, sf_dir):
    # The rank window must run after TakeOrdered (bounded 50 rows), not as
    # a global Window over the full vocabulary.
    plan = _formatted_plan(analytics.q66_word_frequency(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_below_avg_quantity_broadcasts_part(spark, sf_dir):
    plan = _formatted_plan(analytics.q70_below_avg_quantity(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_unpivot_shape(spark, sf_dir):
    out = analytics.q69_unpivot_metrics(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == ["l_returnflag", "metric", "value"]
    rows = out.collect()
    flags = {r["l_returnflag"] for r in rows}
    assert len(rows) == 3 * len(flags)


def test_gap_fill_is_dense_and_filled(spark, sf_dir):
    out = analytics.q72_gap_fill_locf(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r["hr"])
        # dense hourly spine: count == span in hours + 1
        span = int((rows[-1]["hr"] - rows[0]["hr"]).total_seconds() // 3600)
        assert len(rows) == span + 1
        # LOCF: first row observed, then no null filled values
        assert rows[0]["avg_value"] is not None
        assert all(r["filled_value"] is not None for r in rows)


def test_pivot_row_per_priority(spark, sf_dir):
    rows = analytics.q68_pivot_status(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["cnt_f"] + r["cnt_o"] + r["cnt_p"] > 0


def test_stats_profile_matches_builtin_moments(spark, sf_dir):
    """The exact-decimal closed-form moments must agree with Spark's
    built-in stddev_samp/corr to float tolerance (the builtins are
    order-dependent so they can't BE the gated implementation, but they
    define the statistics)."""
    out = {r.event_type: r for r in
           analytics.q98_stats_profile(spark, sf_dir).collect()}
    assert out

    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table
    e = load_table(spark, "events", sf_dir)
    h = (F.floor(F.unix_timestamp("ts") / 3600) % 24).cast("double")
    ref = {r.event_type: r for r in (
        e.groupBy("event_type").agg(
            F.stddev_samp("value").alias("sd"),
            F.corr(F.col("value"), h).alias("cr"),
            F.avg("value").alias("mean"),
        ).collect())}
    for et, r in out.items():
        assert abs(r.stddev_value - ref[et].sd) < 1e-6
        assert abs(r.mean_value - ref[et].mean) < 1e-6
        if r.corr_value_hour is not None:
            assert abs(r.corr_value_hour - ref[et].cr) < 1e-6
            assert -1.0 <= r.corr_value_hour <= 1.0
        assert r.min_value <= r.mean_value <= r.max_value


def test_fuzzy_linkage_blocking_is_sound(spark, sf_dir):
    """Every linked pair shares its blocking key (type noun + size), is
    pk-ordered, and sits inside the declared distance band — and the
    physical plan joins on the blocking equality (hash join), not a
    cartesian filter."""
    df = analytics.q99_fuzzy_linkage(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.pk1 < r.pk2
        assert 1 <= r.edit_distance <= 3
        assert r.name1.split(" ")[1] == r.name2.split(" ")[1]
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_market_share_bounds_and_broadcast_dims(spark, sf_dir):
    """Shares are valid fractions, volumes positive, and the tiny dims
    (nation/region/filtered part) reach the plan as broadcast joins."""
    from airflow_pipelines_from_mongo_to_postgres_spark.plans import relational

    df = relational.q102_market_share(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.total_volume > 0
        assert 1995 <= r.o_year <= 2001
    plan = _formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4  # part, region, nation x2


def test_column_profile_invariants(spark, sf_dir):
    """Profiler facts: one row per profiled column, distinct <= rows,
    the primary key profiles as unique, and null counts are sane."""
    rows = {r.column_name: r for r in
            analytics.q103_column_profile(spark, sf_dir).collect()}
    assert set(rows) == set(analytics._PROFILE_COLS)
    n = rows["o_orderkey"].n_rows
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_null <= n
        assert 1 <= r.n_distinct <= n
    assert rows["o_orderkey"].n_distinct == n  # PK uniqueness shows up here
    assert rows["o_orderstatus"].n_distinct < 10  # enum cardinality
