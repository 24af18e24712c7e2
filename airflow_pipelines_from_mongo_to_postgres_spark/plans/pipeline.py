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

import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators.keygen import assign_surrogate_keys
from airflow_pipelines_from_mongo_to_postgres_spark.operators.merge import (
    insert_if_absent,
    merge_upsert,
    quarantine_split,
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


@dataclass
class TableRun:
    """Outcome of one entity's load attempt(s)."""
    entity: str
    status: str               # "loaded" | "failed"
    attempts: int = 1
    quarantined: int = 0      # M14 rows diverted to {entity}__quarantine
    error: str | None = None


@dataclass
class RunReport:
    """Per-table outcomes of a pipeline run (the engine-idiomatic form of
    the reference's DAG-level retries=5 / retry_delay=5min policy, ref
    mongo_to_postgres_migration.py:21-27 — plus the failure isolation the
    reference lacks: one poisoned collection no longer aborts siblings)."""
    tables: list[TableRun] = field(default_factory=list)

    @property
    def loaded(self) -> list[str]:
        return [t.entity for t in self.tables if t.status == "loaded"]

    @property
    def failed(self) -> list[str]:
        return [t.entity for t in self.tables if t.status == "failed"]

    @property
    def ok(self) -> bool:
        return not self.failed


def _run_entities(names, step, on_error: str, retries: int,
                  retry_delay_s: float) -> RunReport:
    """Shared per-table loop: ``step(name) -> quarantined_count``; each
    table gets ``1 + retries`` attempts; with ``on_error='continue'`` a
    table that exhausts its attempts is recorded and its siblings still
    run (children of a failed parent still attempt — the q23 FK-orphan
    audit is the cross-table integrity check, not load ordering)."""
    if on_error not in ("raise", "continue"):
        raise ValueError(f"on_error must be 'raise' or 'continue': {on_error}")
    report = RunReport()
    for name in names:
        attempts = 0
        while True:
            attempts += 1
            try:
                q = step(name)
                report.tables.append(TableRun(name, "loaded", attempts, q))
                break
            except Exception as e:  # noqa: BLE001 — isolation boundary
                if attempts <= retries:
                    if retry_delay_s:
                        time.sleep(retry_delay_s)
                    continue
                if on_error == "raise":
                    raise
                report.tables.append(TableRun(
                    name, "failed", attempts,
                    error=f"{type(e).__name__}: {e}"))
                break
    return report


def _quarantine(warehouse: Warehouse, name: str, spec, flat: DataFrame
                ) -> tuple[DataFrame, int]:
    """M14 at the runner level: rows with a null natural key can never
    merge (the key is the UNIQUE/ON CONFLICT column) — divert them to
    ``{name}__quarantine`` instead of poisoning the join."""
    clean, bad = quarantine_split(flat, F.col(spec.merge_key).isNotNull())
    n_bad = bad.count()
    if n_bad:
        warehouse.write(f"{name}__quarantine", bad)
    return clean, n_bad


def migrate(spark: SparkSession, warehouse: Warehouse,
            sources: dict[str, DataFrame],
            entities: list[str] | None = None,
            on_error: str = "raise", retries: int = 0,
            retry_delay_s: float = 0.0) -> RunReport:
    """Initial full load: conform each nested source and write it with
    fresh surrogate ids, parents before children (J3)."""
    def step(name: str) -> int:
        spec = ENTITIES[name]
        flat, n_bad = _quarantine(warehouse, name, spec,
                                  spec.conform(sources[name]))
        no_existing = flat.select(
            F.lit(None).cast("long").alias("id"),
            F.col(spec.merge_key)).limit(0)
        keyed = assign_surrogate_keys(no_existing, flat,
                                      natural_key=spec.merge_key, surrogate="id")
        warehouse.write(name, keyed.select("id", *flat.columns))
        return n_bad

    names = [n for n in topo_order(entities or list(sources)) if n in sources]
    return _run_entities(names, step, on_error, retries, retry_delay_s)


def daily_update(spark: SparkSession, warehouse: Warehouse,
                 batches: dict[str, DataFrame],
                 entities: list[str] | None = None,
                 on_error: str = "raise", retries: int = 0,
                 retry_delay_s: float = 0.0) -> RunReport:
    """Incremental upsert path (ref DAG 3.2): sort batch by natural key
    (O1), reconcile surrogate keys (J1+J2), merge with the per-entity
    mutable-column policy (M1–M13)."""
    def step(name: str) -> int:
        spec = ENTITIES[name]
        flat, n_bad = _quarantine(
            warehouse, name, spec,
            spec.conform(batches[name]).orderBy(spec.merge_key))  # O1
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
        return n_bad

    names = [n for n in topo_order(entities or list(batches)) if n in batches]
    return _run_entities(names, step, on_error, retries, retry_delay_s)
