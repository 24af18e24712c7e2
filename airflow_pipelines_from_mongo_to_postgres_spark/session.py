"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster (AQE, skew-join handling, partition coalescing are
cluster-relevant, not local-only).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local harness (local[32], 128 GiB box). On a real
# cluster, shuffle.partitions should scale with cluster cores (AQE coalesces
# the excess at runtime, so erring high is safe).
_DEFAULT_CONF = {
    # Adaptive query execution: runtime re-planning, partition coalescing,
    # skew-join splitting — essential at 100 TB where static stats lie.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast small dimensions (region/nation/supplier class tables).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for any pandas_udf / toPandas path (vectorized transfer).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + pushdown are on by default; keep
    # explicit so a config drift is visible in .explain/Spark UI.
    "spark.sql.parquet.filterPushdown": "true",
    # Timestamps without timezone semantics match the parquet fixtures.
    "spark.sql.session.timeZone": "UTC",
    # InferFiltersFromGenerate synthesizes `size(e)>0 AND isnotnull(e)` below
    # every explode; predicate pushdown then substitutes the generator's FULL
    # expression tree into that filter (no CSE with the projection that still
    # computes it). For array-building pipelines (shingles, winnowing) the
    # duplicated tree re-tokenizes the document inside every element_at —
    # measured 18x on q41 (64s -> 3.5s at sf0.01). The rule only saves work
    # when arrays are often empty AND cheap to size-check; ours never are.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    "spark.sql.shuffle.partitions": "32",
    # events.parquet stores TIMESTAMP(NANOS) which Spark rejects by default;
    # read as long and convert in the catalog (sources/catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Keep partition sizes bounded so one task's working set fits in memory
    # even at large SF (default 128m; explicit for visibility).
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "airflow-pipelines-spark", cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, else all cores. Re-entrant: if a
    session already exists, Spark returns it (configs on the existing session
    are left untouched — callers needing custom conf should own the session).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
