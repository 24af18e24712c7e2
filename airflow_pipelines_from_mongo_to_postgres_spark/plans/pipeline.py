"""Pipeline runner — replaces the reference's five Airflow DAGs with a
topologically-ordered, partition-parallel load (SURVEY.md §3, §7d).

Full migration (ref mongo_to_postgres_migration.py): nested source →
conform → warehouse. Daily update (ref mongo_to_postgres_updation.py):
incremental batch → surrogate-key reconciliation → merge-upsert →
warehouse. The warehouse is a parquet directory per table (tests); the
JDBC/Postgres sink (sinks/jdbc.py) swaps in transparently for real targets.

No CSV staging between stages (ref user_table.py:90,97) — the lazy
DataFrame is the inter-stage IR; Spark checkpoints only at the sink.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators.keygen import assign_surrogate_keys
from airflow_pipelines_from_mongo_to_postgres_spark.operators.merge import (
    insert_if_absent,
    merge_upsert,
)
from airflow_pipelines_from_mongo_to_postgres_spark.plans.entities import ENTITIES, topo_order


class Warehouse:
    """Parquet-directory warehouse with the reference's table contract:
    surrogate ``id`` + unique natural key, one directory per table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)

    def path(self, table: str) -> str:
        return str(self.root / table)

    def exists(self, table: str) -> bool:
        return (self.root / table).exists()

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write(self, table: str, df: DataFrame) -> None:
        """Write-stage-swap: materialize to a staging dir, then atomically
        replace the table dir. Required because an incremental merge READS
        the table it replaces (Spark cannot overwrite a path it is
        scanning), and it gives readers a consistent view mid-rewrite."""
        import shutil

        stage = self.root / f".{table}.staging"
        final = self.root / table
        df.write.mode("overwrite").parquet(str(stage))
        if final.exists():
            shutil.rmtree(final)
        stage.rename(final)


def migrate(spark: SparkSession, warehouse: Warehouse,
            sources: dict[str, DataFrame],
            entities: list[str] | None = None) -> list[str]:
    """Initial full load: conform each nested source and write it with
    fresh surrogate ids, parents before children (J3)."""
    loaded = []
    for name in topo_order(entities or list(sources)):
        if name not in sources:
            continue
        spec = ENTITIES[name]
        flat = spec.conform(sources[name])
        no_existing = flat.select(
            F.lit(None).cast("long").alias("id"),
            F.col(spec.merge_key)).limit(0)
        keyed = assign_surrogate_keys(no_existing, flat,
                                      natural_key=spec.merge_key, surrogate="id")
        warehouse.write(name, keyed.select("id", *flat.columns))
        loaded.append(name)
    return loaded


def daily_update(spark: SparkSession, warehouse: Warehouse,
                 batches: dict[str, DataFrame],
                 entities: list[str] | None = None) -> list[str]:
    """Incremental upsert path (ref DAG 3.2): sort batch by natural key
    (O1), reconcile surrogate keys (J1+J2), merge with the per-entity
    mutable-column policy (M1–M13)."""
    updated = []
    for name in topo_order(entities or list(batches)):
        if name not in batches:
            continue
        spec = ENTITIES[name]
        flat = spec.conform(batches[name]).orderBy(spec.merge_key)  # O1
        target = warehouse.read(name)
        keyed = assign_surrogate_keys(
            target.select("id", F.col(spec.merge_key)),
            flat, natural_key=spec.merge_key, surrogate="id",
        ).select("id", *flat.columns)
        if spec.insert_only:
            merged = insert_if_absent(target, keyed, key=spec.merge_key)
        else:
            merged = merge_upsert(target, keyed, key=spec.merge_key,
                                  mutable=list(spec.mutable))
        warehouse.write(name, merged)
        updated.append(name)
    return updated
