"""Minimal manifest-based snapshot table: atomic commits, snapshot
isolation, and time travel over plain parquet — the table-format layer
(what Delta/Iceberg provide) built from two primitives every
hadoop-compatible store has: append-only data files with unique names,
and an atomic single-file rename.

Why this exists next to the ``lake_*`` family (sources/sinks.py): the
hive-partitioned lake mutates DIRECTORIES, so its dynamic overwrite
needs the ``_pending``/``_COMMITTED`` staging protocol to survive
crashes, and a reader racing a writer can see a half-replaced
partition. Here data files are IMMUTABLE and a commit is one manifest
rename: readers resolve a manifest once and see a consistent file set
forever (snapshot isolation); a crashed writer leaves only orphan data
files that ``vacuum`` reclaims — no recovery step, nothing a reader can
ever observe half-done.

Layout::

    <table>/data/part-...parquet       immutable, uniquely named
    <table>/_manifests/v00000001.json  {"version", "files", "parent", "note"}
    <table>/_manifests/HEAD            text: current version number

At 100 TB the manifest lists file names, not data — commits are O(files
changed) driver work; reads plan from the manifest's explicit file list
so NO directory listing of the data tree ever happens (the classic
object-store listing bottleneck). The reference has no table layer at
all (it truncates/reloads Postgres tables, ref ``utils.py``/DDL in
``dags/includes``); this is the engine-side replacement.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


def _jvm_fs(spark, p: str):
    sc = spark.sparkContext
    jp = sc._jvm.org.apache.hadoop.fs.Path(p)
    return jp.getFileSystem(sc._jsc.hadoopConfiguration()), sc._jvm


def _read_text(spark, p: str) -> str | None:
    fs, jvm = _jvm_fs(spark, p)
    jp = jvm.org.apache.hadoop.fs.Path(p)
    if not fs.exists(jp):
        return None
    stream = fs.open(jp)
    try:
        # one JVM call for the whole file (a byte-at-a-time .read() loop
        # would be one py4j round trip per byte)
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def _write_text_atomic(spark, p: str, text: str) -> None:
    """Write via temp file + rename — the single atomic primitive the
    whole commit protocol rests on (atomic on HDFS/local; on S3 use a
    conditional PUT or a commit service, same one-object contract)."""
    fs, jvm = _jvm_fs(spark, p)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{p}.tmp-{uuid.uuid4().hex}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    dst = jvm.org.apache.hadoop.fs.Path(p)
    fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"atomic rename failed for {p}")


def _manifest_path(table: str, version: int) -> str:
    return f"{table}/_manifests/v{version:08d}.json"


def current_version(spark: SparkSession, table: str) -> int:
    """HEAD, self-healing forward: a writer that crashed between its
    manifest create and the HEAD update leaves HEAD one behind — probe
    for newer manifests so the next reader/writer adopts (and re-pins)
    the true head instead of conflicting forever."""
    head = _read_text(spark, f"{table}/_manifests/HEAD")
    v = int(head.strip()) if head else 0
    fs, jvm = _jvm_fs(spark, table)
    while fs.exists(jvm.org.apache.hadoop.fs.Path(
            _manifest_path(table, v + 1))):
        v += 1
    return v


def read_manifest(spark: SparkSession, table: str,
                  version: int | None = None) -> dict:
    v = current_version(spark, table) if version is None else version
    if v == 0:
        return {"version": 0, "files": [], "parent": None, "note": "empty"}
    text = _read_text(spark, _manifest_path(table, v))
    if text is None:
        raise FileNotFoundError(f"no snapshot v{v} at {table}")
    return json.loads(text)


def _write_data_files(df: DataFrame, table: str) -> list:
    """Materialize ``df`` as new immutable files under ``data/`` and
    return their table-relative names. Each commit writes to its own
    unique subdirectory (Spark's writer owns naming inside it), so
    concurrent/crashed writers can never collide; files are referenced
    individually by manifests, the directory is just a namespace."""
    sub = f"data/c-{uuid.uuid4().hex}"
    df.write.mode("error").parquet(f"{table}/{sub}")
    fs, jvm = _jvm_fs(df.sparkSession, f"{table}/{sub}")
    names = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(f"{table}/{sub}")):
        n = st.getPath().getName()
        if n.endswith(".parquet"):
            names.append(f"{sub}/{n}")
    return sorted(names)


class CommitConflict(Exception):
    """Another writer committed between this writer's snapshot read and
    its commit attempt. Retry: re-read, re-derive, re-commit."""


def _commit(spark: SparkSession, table: str, files: list,
            note: str, expected_parent: int | None = None,
            txn: str | None = None) -> int:
    """Optimistic concurrency: the manifest file for version v is
    created with create(overwrite=False) — on a store with atomic
    create-if-absent, two writers racing to the same parent see exactly
    one winner; the loser gets CommitConflict and retries against the
    new head. ``expected_parent`` additionally pins the snapshot the
    writer DERIVED its files from (a lost-update guard for
    read-modify-write commits like replace_where; append-only commits
    can leave it None)."""
    parent = current_version(spark, table)
    if expected_parent is not None and parent != expected_parent:
        raise CommitConflict(
            f"{table}: head moved to v{parent} (derived from "
            f"v{expected_parent}) — re-read and retry")
    v = parent + 1
    manifest = {"version": v, "files": files,
                "parent": parent or None, "note": note}
    if txn is not None:
        manifest["txn"] = txn
    fs, jvm = _jvm_fs(spark, table)
    mp = jvm.org.apache.hadoop.fs.Path(_manifest_path(table, v))
    try:
        out = fs.create(mp, False)          # fail-if-exists: the OCC gate
    except Exception as exc:
        raise CommitConflict(
            f"{table}: v{v} already committed by another writer") from exc
    try:
        out.write(bytearray(json.dumps(manifest, indent=1).encode("utf-8")))
    finally:
        out.close()
    _write_text_atomic(spark, f"{table}/_manifests/HEAD", str(v))
    return v


def snap_append(spark: SparkSession, table: str, df: DataFrame,
                note: str = "append") -> int:
    """Append commit: new files + every file of the parent snapshot."""
    new = _write_data_files(df, table)
    prev = read_manifest(spark, table)["files"]
    return _commit(spark, table, prev + new, note)


def snap_overwrite(spark: SparkSession, table: str, df: DataFrame,
                   note: str = "overwrite") -> int:
    """Full-table overwrite commit: the manifest simply stops listing
    the old files — they stay on disk for time travel until vacuum."""
    new = _write_data_files(df, table)
    return _commit(spark, table, new, note)


def snap_replace_where(spark: SparkSession, table: str, df: DataFrame,
                       predicate: str,
                       note: str = "replace_where") -> int:
    """Partition-overwrite equivalent without directories: rows of the
    current snapshot NOT matching ``predicate`` are carried into new
    files alongside ``df`` (which must match it); old files drop out of
    the manifest. Rewrite cost is the non-matching remainder of only
    the files that CONTAIN matching rows — kept whole-file here for
    brevity; the keep-untouched-files refinement is ``files`` pruning
    on min/max stats, same read path."""
    base = current_version(spark, table)
    if base == 0:
        # empty table: nothing to carry — the commit is just the new
        # slice (Delta's replaceWhere bootstraps the same way)
        new = _write_data_files(df, table)
        return _commit(spark, table, new, note, expected_parent=0)
    cur = read_snapshot(spark, table, version=base)
    keep = cur.filter(f"NOT ({predicate})")
    new = _write_data_files(keep.unionByName(df), table)
    # read-modify-write: pin the snapshot the rewrite derived from, so
    # a concurrent commit surfaces as CommitConflict, not a lost update
    return _commit(spark, table, new, note, expected_parent=base)


def committed_txns(spark: SparkSession, table: str) -> set:
    """Transaction ids recorded by ``snap_append_txn`` across the
    retained history (walk is O(versions), driver-side, manifest-sized).
    """
    out = set()
    v = current_version(spark, table)
    while v:
        m = read_manifest(spark, table, v)
        if m.get("txn") is not None:
            out.add(m["txn"])
        v = m["parent"] or 0
    return out


def snap_append_txn(spark: SparkSession, table: str, df: DataFrame,
                    txn: str, note: str = "append") -> int | None:
    """EXACTLY-ONCE append: the commit records ``txn`` in its manifest,
    and a txn already present in history makes the call a NO-OP (returns
    None). This is the ``foreachBatch(epoch_id)`` sink contract —
    Structured Streaming replays a failed epoch, the replayed commit
    sees its own txn and skips, so the table reflects each epoch exactly
    once. (Files written by the failed first attempt become vacuumable
    orphans; the manifest never saw them.) Retention caveat: vacuum
    truncates history, so keep ``keep_versions`` above the deepest
    replay the stream can attempt — in practice one epoch."""
    if txn in committed_txns(spark, table):
        return None
    new = _write_data_files(df, table)
    prev = read_manifest(spark, table)["files"]
    return _commit(spark, table, prev + new, note, txn=txn)


def read_snapshot(spark: SparkSession, table: str,
                  version: int | None = None) -> DataFrame:
    """DataFrame over one snapshot's EXPLICIT file list — no directory
    listing, no visibility of in-flight commits; pass ``version`` for
    time travel. An empty table yields an empty error upstream — commit
    first."""
    m = read_manifest(spark, table, version)
    if not m["files"]:
        raise FileNotFoundError(f"snapshot v{m['version']} is empty")
    return spark.read.parquet(*[f"{table}/{f}" for f in m["files"]])


def snap_history(spark: SparkSession, table: str) -> list:
    """[(version, note, n_files), ...] newest first."""
    out = []
    v = current_version(spark, table)
    while v:
        m = read_manifest(spark, table, v)
        out.append((m["version"], m["note"], len(m["files"])))
        v = m["parent"] or 0
    return out


def vacuum(spark: SparkSession, table: str,
           keep_versions: int = 1) -> list:
    """Delete data files referenced ONLY by snapshots older than the
    newest ``keep_versions`` (plus orphans from crashed commits — files
    no manifest references at all). Time travel works up to the vacuum
    horizon, exactly the Delta/Iceberg contract. Returns deleted names.
    """
    head = current_version(spark, table)
    keep = set()
    v = head
    for _ in range(keep_versions):
        if not v:
            break
        m = read_manifest(spark, table, v)
        keep.update(m["files"])
        v = m["parent"] or 0
    fs, jvm = _jvm_fs(spark, f"{table}/data")
    root = jvm.org.apache.hadoop.fs.Path(f"{table}/data")
    deleted = []
    if not fs.exists(root):
        return deleted
    for sub in fs.listStatus(root):
        for st in fs.listStatus(sub.getPath()):
            rel = f"data/{sub.getPath().getName()}/{st.getPath().getName()}"
            if rel not in keep:
                fs.delete(st.getPath(), False)
                deleted.append(rel)
        if len(fs.listStatus(sub.getPath())) == 0:
            fs.delete(sub.getPath(), False)
    return sorted(deleted)
