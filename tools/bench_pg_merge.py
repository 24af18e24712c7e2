#!/usr/bin/env python
"""Measured S6-sink throughput: the staged ``INSERT ... ON CONFLICT``
merge against a LIVE PostgreSQL 15, side by side with the dataflow
``merge_upsert``, on the same sf0.1 merge scenario.

Purpose (VERDICT r5 item #8): BASELINE.md bounds the reference's
row-loop loader analytically (~100–1,000 rows/s); this tool replaces
"bounded" with a MEASURED figure for the statement our sink actually
emits, executed by a real server. Standalone because it needs the
postgres binaries (same availability gate as tests/test_postgres_live.py)
— the per-round driver bench (bench.py) must not depend on a database
server being installable.

Scenario: target = all sf0.1 orders rows (150k); batch = every 3rd row
with refreshed o_orderstatus/o_totalprice (updates) plus 10% brand-new
keys — the q20 merge shape. Reported:

- ``copy_s`` / ``copy_rows_s``: staging load via COPY (the Spark→JDBC
  batch-writer stand-in; transport here is a unix-socket \\copy).
- ``merge_s`` / ``merge_rows_s``: the ONE set-based statement from
  ``upsert_statement`` — the number to stand beside the reference's
  per-row loop bound.
- ``dataflow_s`` / ``dataflow_rows_s``: ``merge_upsert`` in Spark,
  materialized to parquet (the lake-side path that avoids the RDBMS
  entirely).

Usage: python tools/bench_pg_merge.py [sf_dir]   (prints one JSON line)
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

PG_BIN = Path("/usr/lib/postgresql/15/bin")


def _as_nobody(*cmd):
    return ["setpriv", "--reuid=nobody", "--regid=nogroup",
            "--clear-groups", *map(str, cmd)]


def _sql(sock: str, *statements: str) -> str:
    out = subprocess.run(
        ["psql", "-h", sock, "-U", "nobody", "-d", "postgres",
         "-v", "ON_ERROR_STOP=1", "-At",
         *[x for s in statements for x in ("-c", s)]],
        check=True, capture_output=True, text=True, cwd="/tmp")
    return out.stdout


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not (PG_BIN / "initdb").exists() or shutil.which("psql") is None:
        print(json.dumps({"error": "no postgres binaries on this host"}))
        return

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.merge import merge_upsert
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import upsert_statement

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false").getOrCreate())

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    target = load_table(spark, "orders", sf_dir).select(*cols)
    max_key = target.agg(F.max("o_orderkey")).first()[0]
    updates = (target.filter(F.col("o_orderkey") % 3 == 0)
               .withColumn("o_orderstatus", F.lit("X"))
               .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
    inserts = (target.filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("o_orderkey", F.col("o_orderkey") + max_key + 1))
    batch = updates.unionByName(inserts)
    n_target, n_batch = target.count(), batch.count()

    work = Path(tempfile.mkdtemp(prefix="pgbench-", dir="/tmp"))
    sock = work / "sock"
    sock.mkdir()
    for p in (work, sock):
        p.chmod(0o777)
    csv_dir = work / "csv"
    mutable = ["o_orderstatus", "o_totalprice"]

    try:
        # CSVs for COPY (one file via coalesce: COPY is single-threaded
        # at the server anyway, and \copy reads one stream)
        target.coalesce(1).write.option("header", False).csv(
            str(csv_dir / "target"))
        batch.coalesce(1).write.option("header", False).csv(
            str(csv_dir / "batch"))
        tcsv = next((csv_dir / "target").glob("part-*.csv"))
        bcsv = next((csv_dir / "batch").glob("part-*.csv"))
        for f in (tcsv, bcsv):
            f.chmod(0o644)

        subprocess.run(_as_nobody(PG_BIN / "initdb", "-D", work / "data",
                                  "-A", "trust"),
                       check=True, capture_output=True, cwd="/tmp")
        subprocess.run(_as_nobody(PG_BIN / "pg_ctl", "-D", work / "data",
                                  "-o", f"-c listen_addresses='' -k {sock}",
                                  "-l", work / "log", "start"),
                       check=True, capture_output=True, cwd="/tmp")

        ddl = ("o_orderkey bigint, o_orderstatus varchar,"
               " o_totalprice double precision, o_orderdate date")
        _sql(str(sock),
             f"CREATE TABLE orders ({ddl}, UNIQUE (o_orderkey))",
             f"CREATE TABLE orders_staging ({ddl})",
             f"\\copy orders FROM '{tcsv}' WITH (FORMAT csv)")

        t0 = time.perf_counter()
        _sql(str(sock),
             f"\\copy orders_staging FROM '{bcsv}' WITH (FORMAT csv)")
        copy_s = time.perf_counter() - t0

        stmt = upsert_statement("orders", cols, key="o_orderkey",
                                mutable=mutable)
        t0 = time.perf_counter()
        _sql(str(sock), stmt)
        merge_s = time.perf_counter() - t0

        n_after = int(_sql(str(sock), "SELECT count(*) FROM orders").strip())

        t0 = time.perf_counter()
        merged = merge_upsert(target, batch, "o_orderkey", mutable)
        merged.write.mode("overwrite").parquet(str(work / "out"))
        dataflow_s = time.perf_counter() - t0
        n_dataflow = spark.read.parquet(str(work / "out")).count()
        assert n_dataflow == n_after, (n_dataflow, n_after)

        print(json.dumps({
            "metric": "pg_merge_bench", "sf_dir": sf_dir,
            "target_rows": n_target, "batch_rows": n_batch,
            "result_rows": n_after,
            "copy_s": round(copy_s, 3),
            "copy_rows_s": round(n_batch / copy_s),
            "merge_s": round(merge_s, 3),
            "merge_rows_s": round(n_batch / merge_s),
            "dataflow_s": round(dataflow_s, 3),
            "dataflow_rows_s": round(n_batch / dataflow_s),
        }))
    finally:
        subprocess.run(_as_nobody(PG_BIN / "pg_ctl", "-D", work / "data",
                                  "stop", "-m", "fast"),
                       check=False, capture_output=True, cwd="/tmp")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
