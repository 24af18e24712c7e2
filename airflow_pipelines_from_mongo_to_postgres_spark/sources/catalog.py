"""Catalog of the driver-provided parquet fixtures (TESTDATA.md).

Replaces the reference's source layer (MongoDB collection scan S1 + CSV
staging S2/S5, SURVEY.md §2.1) with direct columnar parquet scans: Catalyst
pushes column pruning and predicates into the scan (``PushedFilters`` /
``ReadSchema`` in .explain), so — unlike the reference, which materializes
whole collections in worker memory (user_table.py:25) — only the needed
bytes are read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """One lazy DataFrame per fixture table — no eager materialization.

    Self-contained w.r.t. session config: the driver may hand us a vanilla
    SparkSession, so the two confs correctness depends on are set here at
    runtime (both are SQLConf-level, runtime-settable).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Keep InferFiltersFromGenerate off even on a vanilla session: it clones
    # the generator's whole expression tree into a pushed-down filter, which
    # re-tokenizes documents inside every element_at (18x on winnowing /
    # shingle explodes — see session.py for the full story).
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), rejected by default readers.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): read as nanos-long (legacy conf
    # in session.py) and truncate to micros — same behavior as engines whose
    # native timestamp is microseconds.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the scan is narrower than the session's
    parallelism. Small fixture files arrive as a single split, serializing
    CPU-bound stages (shingling, md5 hashing) on one core; at 100 TB a scan
    has thousands of splits and this is a no-op — the guard means we never
    pay an extra shuffle where the input is already wide."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so plans can use spark.sql(...) alongside the
    DataFrame API (same Catalyst plan either way)."""
    for n in names:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)
