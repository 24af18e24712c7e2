"""Catalog of the driver-provided parquet fixtures (TESTDATA.md).

Replaces the reference's source layer (MongoDB collection scan S1 + CSV
staging S2/S5, SURVEY.md §2.1) with direct columnar parquet scans: Catalyst
pushes column pruning and predicates into the scan (``PushedFilters`` /
``ReadSchema`` in .explain), so — unlike the reference, which materializes
whole collections in worker memory (user_table.py:25) — only the needed
bytes are read.
"""

from __future__ import annotations

import math
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


def _parse_bytes(s: str) -> int:
    """'128m' / '134217728' / '4MB' → bytes (SparkConf byte-string forms)."""
    s = s.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    for suf, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("t", 1 << 40)):
        if s.endswith(suf):
            mult, s = m, s[:-1]
            break
    return int(float(s) * mult)


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Split-count estimate from the scan's FILE METADATA alone (r18,
    VERDICT r17 #7): the old probe (``df.rdd.getNumPartitions()``) ran a
    full physical-planning pass + RDD conversion per plan CONSTRUCTION —
    ~10-50 ms of driver work even at scale, where the whole spread() call
    is a no-op. This derives the same narrow/wide decision from the leaf
    files' sizes with Spark's own packing arithmetic (each file charged
    size + openCostInBytes, packed into maxPartitionBytes bins). Returns
    ``None`` when there is nothing stat-able locally (non-file sources,
    object stores, in-memory test frames) — callers treat None as
    'already wide', the correct assumption for a 100 TB lake scan."""
    try:
        files = df.inputFiles()
    except Exception:  # non-SQL sources / analysis quirks: assume wide
        return None
    if not files:
        return None
    conf = df.sparkSession.conf
    max_pb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes",
                                   "128m"))
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes",
                                      "4m"))
    total = 0
    for uri in files:
        if uri.startswith("file:"):
            path = "/" + uri[5:].lstrip("/")
        elif "://" in uri:
            return None  # remote store: never narrow at scale
        else:
            path = uri
        try:
            total += os.path.getsize(path) + open_cost
        except OSError:
            return None
    return max(1, math.ceil(total / max(max_pb, 1)))


def scan_is_narrow(df: DataFrame, target: int | None = None) -> bool:
    """True iff the scan behind ``df`` is (estimated) narrower than the
    session parallelism — the shared scale guard for spread() and for
    local-only plan hints (q99's pinned broadcast build side)."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    splits = _estimated_scan_splits(df)
    return splits is not None and splits < target


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the scan is narrower than the session's
    parallelism. Small fixture files arrive as a single split, serializing
    CPU-bound stages (shingling, md5 hashing) on one core; at 100 TB a scan
    has thousands of splits and this is a no-op — the guard means we never
    pay an extra shuffle where the input is already wide. The narrowness
    probe is file-metadata-only (no RDD materialization at plan
    construction — see _estimated_scan_splits)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if scan_is_narrow(df, target):
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
