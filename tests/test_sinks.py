"""Sink SQL builders (the set-based replacement for per-row upserts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import (
    create_table_ddl,
    upsert_statement,
    write_csv,
    write_parquet,
)


def test_upsert_statement_partial_update():
    s = upsert_statement("public.users", ["_id", "roles", "deleted"],
                         key="_id", mutable=["roles", "deleted"])
    assert "INSERT INTO public.users (_id, roles, deleted)" in s
    assert "FROM public.users_staging" in s
    assert "ON CONFLICT (_id) DO UPDATE SET roles = EXCLUDED.roles, deleted = EXCLUDED.deleted" in s


def test_upsert_statement_do_nothing():
    s = upsert_statement("loanoffers", ["_id", "period"], "_id", mutable=[])
    assert s.endswith("ON CONFLICT (_id) DO NOTHING")


def test_create_table_ddl_from_schema(spark):
    df = spark.createDataFrame([(1, "x", True, 1.5)],
                               "id long, _id string, deleted boolean, amount double")
    ddl = create_table_ddl("public.users", df)
    assert "id serial PRIMARY KEY" in ddl
    assert "_id varchar UNIQUE" in ddl
    assert "deleted boolean" in ddl and "amount double precision" in ddl


def test_file_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    write_parquet(df, str(tmp_path / "p"))
    assert spark.read.parquet(str(tmp_path / "p")).count() == 2
    write_csv(df, str(tmp_path / "c"))
    got = spark.read.option("header", True).csv(str(tmp_path / "c"))
    assert got.count() == 2 and set(got.columns) == {"k", "v"}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Tables co-bucketed on the join key sort-merge-join without a single
    shuffle — the write-once-shuffle-never pattern for fact⋈fact at scale."""
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import (
        write_bucketed,
    )

    left = spark.range(0, 1000).withColumnRenamed("id", "k") \
        .withColumn("lv", F.col("k") * 2)
    right = spark.range(0, 1000).withColumnRenamed("id", "k") \
        .withColumn("rv", F.col("k") + 7)
    write_bucketed(left, "bk_left", 4, ["k"], sort_cols=["k"],
                   path=str(tmp_path / "bk_left"))
    write_bucketed(right, "bk_right", 4, ["k"], sort_cols=["k"],
                   path=str(tmp_path / "bk_right"))
    try:
        a = spark.table("bk_left").hint("merge")
        b = spark.table("bk_right")
        joined = a.join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets align; no shuffle either side
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_drop_schema_ddl_matches_reference_contract():
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import drop_schema_ddl

    drop, create = drop_schema_ddl("public")
    assert drop == "DROP SCHEMA IF EXISTS public CASCADE"
    assert create == "CREATE SCHEMA public"
    drop, create = drop_schema_ddl("analytics")
    assert "analytics" in drop and "analytics" in create
