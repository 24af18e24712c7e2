"""End-to-end pipeline: migration day-1 → daily delta day-2 (SURVEY.md §3.1
then §3.2), parquet warehouse, FIXTURES.md cross-cutting requirements."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.plans.entities import ENTITIES, topo_order
from airflow_pipelines_from_mongo_to_postgres_spark.plans.pipeline import (
    Warehouse,
    daily_update,
    migrate,
)
from tests.datagen import day2_delta, gen_rows


def test_topo_order_parents_first():
    order = topo_order()
    assert set(order) == set(ENTITIES)
    assert order.index("users") < order.index("organizations")
    assert order.index("organizations") < order.index("trades")
    assert order.index("loandeals") < order.index("loanapplications")
    assert order.index("loanapplications") < order.index("mlscore")


@pytest.fixture()
def sources(spark):
    return {
        name: spark.createDataFrame(gen_rows(ENTITIES[name].schema, 30, seed=i),
                                    ENTITIES[name].schema)
        for i, name in enumerate(["users", "organizations", "trades", "loanoffers"])
    }


def test_migrate_then_daily_update(spark, tmp_path, sources):
    wh = Warehouse(spark, str(tmp_path))
    loaded = migrate(spark, wh, sources)
    assert set(loaded.loaded) == set(sources) and loaded.ok

    users = wh.read("users")
    n1 = users.count()
    assert users.columns[0] == "id"
    ids = [r.id for r in users.select("id").collect()]
    assert sorted(ids) == list(range(1, n1 + 1))  # serial ids from 1

    # day-2: half mutated + 10 new users
    day1 = gen_rows(ENTITIES["users"].schema, 30, seed=0)
    delta_rows = day2_delta(ENTITIES["users"].schema, day1,
                            ENTITIES["users"].mutable, n_new=10)
    delta = spark.createDataFrame(delta_rows, ENTITIES["users"].schema)
    daily_update(spark, wh, {"users": delta})

    after = wh.read("users")
    n2 = after.count()
    assert n2 == n1 + 10  # existing ids updated in place, new appended
    ids2 = [r.id for r in after.select("id").collect()]
    assert sorted(ids2) == list(range(1, n2 + 1))  # keys continue from max


def test_frozen_columns_survive_day2(spark, tmp_path):
    spec = ENTITIES["organizations"]  # mutable = (deleted,) only
    day1 = gen_rows(spec.schema, 20, seed=5)
    wh = Warehouse(spark, str(tmp_path))
    migrate(spark, wh, {"organizations":
                        spark.createDataFrame(day1, spec.schema)})
    before = {r._id: r.business_name
              for r in wh.read("organizations").collect()}

    mutated = []
    for row in day1:
        m = dict(row)
        m["businessName"] = "HACKED"
        m["deleted"] = True
        mutated.append(m)
    daily_update(spark, wh, {"organizations":
                             spark.createDataFrame(mutated, spec.schema)})
    after = wh.read("organizations")
    got = {r._id: (r.business_name, r.deleted) for r in after.collect()}
    for _id, (bn, dl) in got.items():
        assert bn == before[_id]  # frozen column kept first-insert value
        assert dl is True         # mutable column refreshed


def test_insert_only_entity_ignores_conflicts(spark, tmp_path):
    spec = ENTITIES["loanoffers"]
    day1 = gen_rows(spec.schema, 15, seed=8)
    wh = Warehouse(spark, str(tmp_path))
    migrate(spark, wh, {"loanoffers": spark.createDataFrame(day1, spec.schema)})
    before = {r._id: r.financedAmount for r in wh.read("loanoffers").collect()}

    mutated = [dict(r, financedAmount=-1.0) for r in day1[:5]]
    mutated += gen_rows(spec.schema, 5, seed=99)
    daily_update(spark, wh, {"loanoffers":
                             spark.createDataFrame(mutated, spec.schema)})
    after = {r._id: r.financedAmount for r in wh.read("loanoffers").collect()}
    assert len(after) == 20
    for _id, v in before.items():
        assert after[_id] == v  # DO NOTHING: conflicting updates dropped


def test_poisoned_entity_does_not_abort_siblings(spark, tmp_path, sources):
    """Failure isolation (engine form of ref retries=5 policy): one bad
    source is reported failed; every sibling still loads."""
    bad = dict(sources)
    # organizations source missing every column the spec projects → the
    # conform select raises at plan time for that entity only
    bad["organizations"] = spark.createDataFrame([("x",)], ["wrong_col"])
    wh = Warehouse(spark, str(tmp_path))
    report = migrate(spark, wh, bad, on_error="continue")
    assert report.failed == ["organizations"]
    assert set(report.loaded) == {"users", "trades", "loanoffers"}
    assert not report.ok
    for t in report.tables:
        if t.status == "failed":
            assert t.error and t.attempts == 1
    # siblings really are on disk
    assert wh.exists("users") and not wh.exists("organizations")


def test_retries_exhaust_then_report(spark, tmp_path, sources):
    bad = {"organizations": spark.createDataFrame([("x",)], ["wrong_col"])}
    wh = Warehouse(spark, str(tmp_path))
    report = migrate(spark, wh, bad, on_error="continue", retries=2)
    assert report.tables[0].attempts == 3  # 1 + 2 retries

    with pytest.raises(Exception):
        migrate(spark, wh, bad, on_error="raise")

    with pytest.raises(ValueError):
        migrate(spark, wh, bad, on_error="never-heard-of-it")


def test_null_key_rows_quarantined_not_merged(spark, tmp_path):
    """M14 surfaced in the report: null natural keys can never satisfy the
    UNIQUE/ON CONFLICT contract — they land in {entity}__quarantine."""
    spec = ENTITIES["organizations"]
    rows = gen_rows(spec.schema, 10, seed=3)
    poisoned = [dict(r, _id=None) for r in rows[:3]] + rows[3:]
    wh = Warehouse(spark, str(tmp_path))
    report = migrate(spark, wh, {"organizations":
                                 spark.createDataFrame(poisoned, spec.schema)})
    assert report.tables[0].quarantined == 3
    assert wh.read("organizations").count() == 7
    quarantined = wh.read("organizations__quarantine")
    assert quarantined.count() == 3
    assert {r._id for r in quarantined.collect()} == {None}


def test_unknown_source_fails_in_isolation(spark, tmp_path):
    """An unknown source key must be recorded as its OWN table failure
    with on_error='continue' — never abort the siblings before the
    isolation loop even starts."""
    from airflow_pipelines_from_mongo_to_postgres_spark.plans.entities import topo_order

    order = topo_order(["users", "no_such_entity"])
    assert order[-1] == "no_such_entity" and "users" in order
