"""Sink SQL builders (the set-based replacement for per-row upserts)."""

from __future__ import annotations

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
