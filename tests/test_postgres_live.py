"""LIVE Postgres execution of the ``postgres`` merge dialect.

The staged-merge round trip in tests/test_connectors.py runs against
embedded Derby's ANSI ``MERGE INTO``; the ``INSERT ... ON CONFLICT``
string that reproduces the reference's statement
(ref dags/includes/user_table.py:106-110) was previously only
string-asserted. This module executes it against a real PostgreSQL
server (a throwaway cluster on a unix socket, no TCP) and checks the
post-merge table state equals the dataflow ``merge_upsert`` result on
the same inputs — closing the reference-parity gap where the one
statement a real deployment runs was the one statement never executed.

No JDBC jar or Python DBAPI driver for Postgres exists in this
container, so the round trip drives the server through ``psql``. The
STATEMENT under test is produced by ``sources/sinks.py`` unchanged;
only the transport differs from production.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import pytest

PG_BIN = Path("/usr/lib/postgresql/15/bin")

pg_available = pytest.mark.skipif(
    not (PG_BIN / "initdb").exists() or shutil.which("psql") is None
    or shutil.which("setpriv") is None,
    reason="no postgres server binaries on this host")


def _as_nobody(*cmd: str) -> list[str]:
    # postgres refuses to run as root; drop to nobody for server processes
    return ["setpriv", "--reuid=nobody", "--regid=nogroup",
            "--clear-groups", *map(str, cmd)]


@pytest.fixture()
def pg_sock():
    """Throwaway single-test Postgres cluster; yields the socket dir.

    Lives directly under /tmp (not pytest's tmp_path: its ancestor dirs
    are 0700 root-owned, and the server runs as ``nobody``)."""
    import tempfile

    work = Path(tempfile.mkdtemp(prefix="pglive-", dir="/tmp"))
    sock = work / "sock"
    sock.mkdir()
    for p in (work, sock):
        p.chmod(0o777)
    subprocess.run(
        _as_nobody(PG_BIN / "initdb", "-D", work / "data", "-A", "trust"),
        check=True, capture_output=True, cwd="/tmp")
    subprocess.run(
        _as_nobody(PG_BIN / "pg_ctl", "-D", work / "data",
                   "-o", f"-c listen_addresses='' -k {sock}",
                   "-l", work / "log", "start"),
        check=True, capture_output=True, cwd="/tmp")
    try:
        yield str(sock)
    finally:
        subprocess.run(
            _as_nobody(PG_BIN / "pg_ctl", "-D", work / "data",
                       "stop", "-m", "fast"),
            check=False, capture_output=True, cwd="/tmp")
        shutil.rmtree(work, ignore_errors=True)


def _sql(sock: str, *statements: str) -> str:
    out = subprocess.run(
        ["psql", "-h", sock, "-U", "nobody", "-d", "postgres",
         "-v", "ON_ERROR_STOP=1", "-At",
         *[x for s in statements for x in ("-c", s)]],
        check=True, capture_output=True, text=True, cwd="/tmp")
    return out.stdout


@pg_available
def test_on_conflict_merge_matches_dataflow(spark, pg_sock):
    """M1-style partial-column upsert: the generated ON CONFLICT statement,
    executed by a real Postgres, must leave the target in exactly the
    state the dataflow merge operator computes — mutable columns updated,
    frozen columns kept, misses inserted."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.merge import (
        merge_upsert,
    )
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import (
        upsert_statement,
    )

    target = spark.createDataFrame(
        [(1, "old", 10.0), (3, "keep", 30.0)],
        "_id bigint, status string, amount double")
    batch = spark.createDataFrame(
        [(1, "done", 99.0), (2, "new", 2.0)],
        "_id bigint, status string, amount double")

    stmt = upsert_statement("orders", ["_id", "status", "amount"],
                            key="_id", mutable=["status"])
    assert "ON CONFLICT (_id) DO UPDATE SET status = EXCLUDED.status" in stmt

    _sql(pg_sock,
         "CREATE TABLE orders (_id bigint UNIQUE, status varchar,"
         " amount double precision)",
         "CREATE TABLE orders_staging (_id bigint, status varchar,"
         " amount double precision)",
         "INSERT INTO orders VALUES (1,'old',10.0), (3,'keep',30.0)",
         "INSERT INTO orders_staging VALUES (1,'done',99.0), (2,'new',2.0)",
         stmt)
    got = sorted(
        (int(i), s, float(a))
        for i, s, a in (ln.split("|") for ln in
                        _sql(pg_sock, "SELECT _id, status, amount"
                                      " FROM orders").splitlines()))

    want = sorted(map(tuple,
                      merge_upsert(target, batch, "_id", ["status"]).collect()))
    assert got == want
    # mutable updated, frozen amount kept, miss inserted, untouched row kept
    assert got == [(1, "done", 10.0), (2, "new", 2.0), (3, "keep", 30.0)]


@pg_available
def test_on_conflict_do_nothing_and_ansi_merge(spark, pg_sock):
    """M11–M13 insert-if-absent via DO NOTHING, and the ``ansi`` MERGE
    dialect (Postgres 15+ supports standard MERGE) — both executed live,
    asserting the two dialects agree with each other and with the
    dataflow ``insert_if_absent``."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.merge import (
        insert_if_absent,
    )
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import (
        merge_statement,
    )

    target = spark.createDataFrame([(1, "a")], "_id bigint, v string")
    batch = spark.createDataFrame([(1, "CHANGED"), (2, "b")],
                                  "_id bigint, v string")

    setup = [
        "CREATE TABLE t_pg (_id bigint UNIQUE, v varchar)",
        "CREATE TABLE t_ansi (_id bigint UNIQUE, v varchar)",
        "CREATE TABLE stg (_id bigint, v varchar)",
        "INSERT INTO t_pg VALUES (1,'a')",
        "INSERT INTO t_ansi VALUES (1,'a')",
        "INSERT INTO stg VALUES (1,'CHANGED'), (2,'b')",
    ]
    pg_stmt = merge_statement("t_pg", ["_id", "v"], "_id", mutable=[],
                              staging="stg", dialect="postgres")
    ansi_stmt = merge_statement("t_ansi", ["_id", "v"], "_id", mutable=[],
                                staging="stg", dialect="ansi")
    _sql(pg_sock, *setup, pg_stmt, ansi_stmt)

    read = lambda t: sorted(  # noqa: E731
        (int(i), v) for i, v in
        (ln.split("|") for ln in
         _sql(pg_sock, f"SELECT _id, v FROM {t}").splitlines()))
    want = sorted(map(tuple, insert_if_absent(target, batch, "_id").collect()))
    assert read("t_pg") == want == [(1, "a"), (2, "b")]
    assert read("t_ansi") == want
