"""Deterministic sampling (functions/sampling.py): reproducibility,
append stability, nesting, and split partition laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import sampling


def _ids(spark, n):
    return spark.range(n).withColumnRenamed("id", "k")


def test_sample_reproducible_and_partition_invariant(spark):
    df = _ids(spark, 2000)
    a = {r.k for r in sampling.deterministic_sample(df, "k", 0.3).collect()}
    b = {r.k for r in sampling.deterministic_sample(
        df.repartition(17), "k", 0.3).collect()}
    assert a == b and a
    # roughly the right size (md5 variate is uniform)
    assert 0.25 < len(a) / 2000 < 0.35


def test_sample_append_stable_and_nested(spark):
    old = _ids(spark, 1000)
    grown = _ids(spark, 1500)
    s_old = {r.k for r in sampling.deterministic_sample(old, "k", 0.3).collect()}
    s_grown = {r.k for r in sampling.deterministic_sample(grown, "k", 0.3).collect()}
    assert {k for k in s_grown if k < 1000} == s_old  # old rows keep their fate
    # unsalted smaller fraction nests inside larger one
    s_small = {r.k for r in sampling.deterministic_sample(old, "k", 0.1).collect()}
    assert s_small <= s_old
    # salted sample is a different (independent) selection
    s_salt = {r.k for r in sampling.deterministic_sample(
        old, "k", 0.3, salt="v2").collect()}
    assert s_salt != s_old


def test_split_disjoint_exhaustive_weighted(spark):
    df = _ids(spark, 3000)
    out = sampling.train_val_test_split(df, "k", (0.8, 0.1, 0.1))
    counts = {r.split: r.cnt for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 3000
    assert counts["train"] > counts["val"] + counts["test"]
    assert 0.06 < counts["val"] / 3000 < 0.14
