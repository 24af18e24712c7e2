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
    <table>/_manifests/seg-<hex>.json  {"files": [...], "stats": {...}}
                                       one commit's DELTA (immutable)
    <table>/_manifests/v00000001.json  {"version", "segments": [names],
                                        "parent", "note",
                                        "deletes": [{file, cols}]}
                                       (appends / merge-on-read deletes)
                                       or inline {"files", "stats"}
                                       (overwrite/replace/compact —
                                       these MATERIALIZE any deletes)
    <table>/_manifests/HEAD            text: current version number

At 100 TB the manifest layer lists file names, not data — and the
manifest-LIST indirection (Iceberg's shape) keeps each append commit
O(files added): the version file holds segment names only, the new
segment holds just this commit's files + stats, and parent segments are
referenced untouched. Every _MAX_SEGMENTS appends the list coalesces
into one segment (amortized O(table/_MAX_SEGMENTS) maintenance). Reads
plan from the resolved explicit file list so NO directory listing of
the data tree ever happens (the classic object-store listing
bottleneck). The reference has no table layer at
all (it truncates/reloads Postgres tables, ref ``utils.py``/DDL in
``dags/includes``); this is the engine-side replacement.
"""

from __future__ import annotations

import json
import re
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


#: Highest manifest format this reader understands. Format 2 = data-
#: sequenced equality deletes (Iceberg-v2 rule: a delete applies only
#: to files sequenced strictly before it). A manifest that RELIES on
#: sequence semantics stamps ``"format": 2`` so a pre-sequence reader
#: (older library build, stale pyds copy) REFUSES it instead of
#: applying every delete to every file and silently dropping a MERGE's
#: replacement rows. Manifests without sequenced deletes stay
#: unstamped (format 1) — readable by every build.
_FORMAT_VERSION = 2


def _check_format(m: dict, table: str) -> dict:
    if m.get("format", 1) > _FORMAT_VERSION:
        raise ValueError(
            f"{table}: manifest format {m['format']} is newer than this "
            f"reader (supports <= {_FORMAT_VERSION}) — upgrade the "
            "library; reading anyway could silently corrupt results")
    return m


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


def _read_raw_manifest(spark: SparkSession, table: str,
                       version: int | None = None) -> dict:
    """The version file EXACTLY as committed — segment refs unresolved.
    Writers use this to reuse the parent's segment list at O(refs) cost."""
    v = current_version(spark, table) if version is None else version
    if v == 0:
        return {"version": 0, "files": [], "parent": None, "note": "empty"}
    text = _read_text(spark, _manifest_path(table, v))
    if text is None:
        raise FileNotFoundError(f"no snapshot v{v} at {table}")
    return _check_format(json.loads(text), table)


def _segment_path(table: str, name: str) -> str:
    return f"{table}/_manifests/{name}"


def _write_segment(spark: SparkSession, table: str, files: list,
                   stats: dict, file_seqs: dict | None = None) -> str:
    """One immutable segment manifest: the (files, per-file stats) of a
    single commit's delta. Uniquely named, so no OCC needed — only the
    version file that REFERENCES it is contended. ``file_seqs`` (only
    for segments whose files come from SEVERAL commits — inline-manifest
    lifts and coalesces) bakes per-file data-sequence numbers into the
    body; ordinary one-commit segments get their sequence from the
    version file's ``segment_seqs`` at commit time instead (the number
    isn't known until the OCC race is won)."""
    name = f"seg-{uuid.uuid4().hex}.json"
    body = {"files": list(files),
            "stats": {k: v for k, v in (stats or {}).items()
                      if k in set(files)}}
    if file_seqs:
        body["file_seqs"] = {k: v for k, v in file_seqs.items()
                             if k in set(files)}
    _write_text_atomic(spark, _segment_path(table, name),
                       json.dumps(body, indent=1))
    return name


def _read_segment(spark: SparkSession, table: str, name: str) -> dict:
    text = _read_text(spark, _segment_path(table, name))
    if text is None:
        raise FileNotFoundError(f"missing segment {name} at {table}")
    return json.loads(text)


def read_manifest(spark: SparkSession, table: str,
                  version: int | None = None) -> dict:
    """Resolved manifest: always carries the FULL ``files`` list and
    merged ``stats``, whether the version file inlines them (legacy /
    bootstrap) or references segment manifests (the append path — each
    commit writes only its O(delta) segment; the version file lists
    segment names, Iceberg's manifest-list shape)."""
    m = _read_raw_manifest(spark, table, version)
    if "segments" not in m:
        # inline manifest (overwrite/replace/compact): those commits
        # MATERIALIZE deletes, so every listed file is at least as new
        # as any surviving delete — its own version is a safe sequence.
        # snap_clone inlines an EXPLICIT file_seqs map instead (it
        # carries the source's deletes, so relative order must survive).
        out = dict(m)
        if "file_seqs" not in out:
            out["file_seqs"] = {f: m["version"]
                                for f in m.get("files", [])}
        return out
    files: list = []
    stats: dict = {}
    seqs: dict = {}
    seg_seqs = m.get("segment_seqs") or {}
    for name in m["segments"]:
        seg = _read_segment(spark, table, name)
        files += seg["files"]
        stats.update(seg.get("stats", {}))
        if "file_seqs" in seg:
            # multi-commit segment (lift/coalesce): per-file seqs baked
            # into the body at the time the source seqs were known
            seqs.update({f: seg["file_seqs"].get(f, 0)
                         for f in seg["files"]})
        else:
            # legacy segments without a recorded sequence read as 0
            # (oldest: every delete applies — the pre-sequence
            # behavior, unchanged)
            seqs.update({f: seg_seqs.get(name, 0) for f in seg["files"]})
    out = dict(m)
    out["files"] = files
    out["file_seqs"] = seqs
    if stats:
        out["stats"] = stats
    return out


# Strict numeric forms mirroring the JVM's parse rules (what Spark's
# own path-partition inference accepts). Python's bare int()/float()
# take MORE — int("2024_01")=202401, float("1_0.5"), float("inf"
# case-insensitively) — so an unguarded cast here would call a value
# numeric that Spark's _read_files inference keeps as a string, and the
# global cast in _read_files would then NULL it out (silent corruption),
# or prune_files would compare int stat vs string predicate (TypeError).
# The float grammar is JavaBigDecimal's (digits with optional point
# anywhere, optional exponent) — measured against the JVM: x=1e5 infers
# decimal(7,0)=100000, x=1. infers decimal(1,0)=1, x=Infinity infers
# double — so these forms MUST parse numeric here or the manifest stat
# ("1e5") and the rebuilt column value (100000.0) would disagree and an
# equality predicate could prune a file that holds matching rows.
_PART_INT_RE = re.compile(r"[+-]?\d+\Z")
_PART_FLOAT_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\Z")
#: exact JVM Double.parseDouble special tokens (case-sensitive — the
#: JVM rejects "inf"/"nan", and so must we)
_PART_SPECIALS = {"Infinity": float("inf"), "+Infinity": float("inf"),
                  "-Infinity": float("-inf"), "NaN": float("nan")}


def partition_values_of(name: str) -> dict:
    """``col=value`` path segments of a table-relative file name →
    {col: python value or None}, undoing Hive's percent-escaping and
    ``__HIVE_DEFAULT_PARTITION__`` null sentinel, with Spark's scalar
    inference (int, then float, else string — dates stay ISO strings,
    which order lexicographically for pruning). Numeric casts are
    regex-gated to the JVM grammar: exponent forms, bare-point decimals
    and the exact Infinity/NaN tokens parse numeric (the JVM types them
    numeric too — see _PART_FLOAT_RE's note), while underscore
    separators, hex, and lowercase inf/nan stay strings, exactly as the
    JVM partition inference treats them."""
    from urllib.parse import unquote

    out = {}
    for seg in name.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        v = unquote(v)
        if v == "__HIVE_DEFAULT_PARTITION__":
            out[k] = None
        elif _PART_INT_RE.match(v):
            out[k] = int(v)
        elif v in _PART_SPECIALS:
            out[k] = _PART_SPECIALS[v]
        elif _PART_FLOAT_RE.match(v):
            out[k] = float(v)
        else:
            out[k] = v
    return out


def _partition_stats(names: list, partition_by: tuple) -> dict:
    """Per-file stats entries derived from the PATH, no data scan: a
    hive-partitioned file holds exactly one value per partition column,
    so min = max = the directory's value — a perfect pruning window for
    free. The synthetic rows=1/nulls∈{0,1} pair encodes all-null vs
    no-null exactly (one value per file), which is all is_null /
    is_not_null pruning reads."""
    stats = {}
    for n in names:
        vals = partition_values_of(n)
        cols = {}
        for c in partition_by:
            if c not in vals:
                continue
            v = _stat_json(vals[c])
            cols[c] = {"min": v, "max": v,
                       "nulls": 1 if v is None else 0}
        if cols:
            stats[n] = {"rows": 1, "cols": cols}
    return stats


def partition_spark_type(values: list) -> str:
    """Spark SQL type for a hive partition column from its path-parsed
    values, mirroring Spark's own partition inference order (int →
    bigint → double → date → string) so every reader agrees."""
    import re

    vs = [v for v in values if v is not None]
    if not vs:
        return "string"
    if all(isinstance(v, int) and not isinstance(v, bool) for v in vs):
        return ("int" if all(-2**31 <= v < 2**31 for v in vs)
                else "bigint")
    if all(isinstance(v, (int, float)) for v in vs):
        return "double"
    if all(isinstance(v, str)
           and re.fullmatch(r"\d{4}-\d{2}-\d{2}", v) for v in vs):
        return "date"
    return "string"


def _read_files(spark: SparkSession, table: str, files: list,
                partition_by: list | None,
                merge_schema: bool = False) -> DataFrame:
    """DataFrame over an explicit snapshot file list. Unpartitioned
    tables are ONE parquet relation. Hive-partitioned snapshots read
    per COMMIT directory (Spark's partition inference requires a
    uniform directory structure under the base path, and
    ``data/c-<hex>/col=v`` prefixes differ per commit), partition
    columns cast to one globally-inferred type, then unionByName — the
    group count is bounded by live commit dirs (compaction collapses
    them), and each group is still a plain multi-file parquet scan."""
    from pyspark.sql import functions as F

    if not partition_by:
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*[f"{table}/{f}" for f in files])
    types = {c: partition_spark_type(
        [partition_values_of(f).get(c) for f in files])
        for c in partition_by}
    groups: dict = {}
    for f in files:
        groups.setdefault("/".join(f.split("/")[:2]), []).append(f)
    out = None
    for _, fs in sorted(groups.items()):
        reader = spark.read.option("basePath", table)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[f"{table}/{f}" for f in fs])
        for c, t in types.items():
            if c in df.columns:
                df = df.withColumn(c, F.col(c).cast(t))
        out = df if out is None else out.unionByName(
            df, allowMissingColumns=merge_schema)
    return out


def _write_data_files(df: DataFrame, table: str,
                      stat_cols: tuple = (),
                      value_cols: tuple = (),
                      partition_by: tuple = ()) -> tuple:
    """Materialize ``df`` as new immutable files under ``data/`` and
    return ``(table-relative names, per-file column stats)``. Each
    commit writes to its own unique subdirectory (Spark's writer owns
    naming inside it), so concurrent/crashed writers can never collide;
    files are referenced individually by manifests, the directory is
    just a namespace. With ``stat_cols``, one extra Spark job over the
    JUST-WRITTEN files (batch-sized, never the table) collects per-file
    min/max/null-count — the manifest-level pruning index. With
    ``partition_by``, files land in hive-style ``col=value``
    subdirectories and each file's partition values become exact
    min=max stats entries parsed from the PATH (zero extra I/O) — the
    partition fast path every production table format keeps."""
    sub = f"data/c-{uuid.uuid4().hex}"
    w = df.write.mode("error")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{table}/{sub}")
    fs, jvm = _jvm_fs(df.sparkSession, f"{table}/{sub}")
    names = []
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(f"{table}/{sub}"), True)
    while it.hasNext():
        p = it.next().getPath().toString()
        if p.endswith(".parquet"):
            # table-relative name: sub + the path below the commit dir
            names.append(f"{sub}/{p.split('/' + sub + '/', 1)[1]}")
    names = sorted(names)
    stats = (_collect_file_stats(df.sparkSession, table, names, stat_cols,
                                 value_cols)
             if (stat_cols or value_cols) and names else {})
    if partition_by and names:
        pstats = _partition_stats(names, tuple(partition_by))
        for n, entry in pstats.items():
            if n in stats:
                stats[n]["cols"].update(entry["cols"])
            else:
                stats[n] = entry
    return names, stats


def _stat_json(v):
    """JSON-encodable stat value. ISO-8601 keeps timestamps/dates
    ordered lexicographically, so pruning compares strings directly."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


#: distinct-value sets above this size are dropped from the manifest —
#: a "values" list is a pruning index for LOW-cardinality (categorical)
#: columns, not a copy of the data.
_VALUE_SET_CAP = 32


def _collect_file_stats(spark: SparkSession, table: str, names: list,
                        stat_cols: tuple,
                        value_cols: tuple = ()) -> dict:
    """name -> {"rows": n, "cols": {col: {"min","max","nulls"[,"values"]}}}
    via one groupBy(input_file_name()) aggregate over the new files only.
    ``value_cols`` (opt-in, declare only LOW-cardinality columns like
    event_type/source) additionally records each file's distinct value
    set when it fits _VALUE_SET_CAP — min/max windows are useless for
    equality pruning on categoricals (every file spans 'a'..'z'), a
    value set prunes exactly."""
    from pyspark.sql import functions as F

    df = spark.read.option("basePath", table) \
        .parquet(*[f"{table}/{n}" for n in names])
    present = [c for c in stat_cols if c in df.columns]
    vcols = [c for c in value_cols if c in df.columns]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in set(present) | set(vcols):
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"__nl_{c}")]
    for c in vcols:
        # capped BEFORE collect: slice keeps cap+1 so an over-cap set is
        # detectable (and dropped) without shipping the full set
        aggs.append(F.slice(F.sort_array(F.collect_set(c)), 1,
                            _VALUE_SET_CAP + 1).alias(f"__vs_{c}"))
    rows = df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    # input_file_name is an absolute URI; manifests key by the unique
    # table-relative tail (data/c-<hex>/[k=v/...]<part>.parquet) — split
    # on the LAST /data/ occurrence so a table that itself lives under a
    # path containing /data/ (e.g. /data/lake/tab) still maps; partition
    # path segments can't contain '/' (hive escapes it), so the table's
    # own data dir is always the last match
    by_tail = {}
    for r in rows:
        tail = "data/" + r["__f"].rsplit("/data/", 1)[1] \
            if "/data/" in r["__f"] else "/".join(r["__f"].split("/")[-3:])
        by_tail[tail] = r
    out = {}
    for n in names:
        r = by_tail.get(n)
        if r is None:
            continue
        cols = {}
        for c in set(present) | set(vcols):
            cols[c] = {"min": _stat_json(r[f"__mn_{c}"]),
                       "max": _stat_json(r[f"__mx_{c}"]),
                       "nulls": r[f"__nl_{c}"]}
        for c in vcols:
            vs = r[f"__vs_{c}"]
            if vs is not None and len(vs) <= _VALUE_SET_CAP:
                cols[c]["values"] = sorted(_stat_json(v) for v in vs)
        out[n] = {"rows": r["__rows"], "cols": cols}
    return out


_PRUNE_OPS = ("<", "<=", ">", ">=", "=", "is_null", "is_not_null")


def _prune_value(v):
    return _stat_json(v)


def prune_files(manifest: dict, predicates: list) -> list:
    """Manifest-level file pruning: return the subset of the snapshot's
    files whose [min, max]/null-count window can still satisfy EVERY
    predicate (conjunction). Conservative by construction — a file with
    no stats, or no stats for the predicate's column, is always kept;
    only a window that PROVABLY excludes all rows drops. Predicates:
    ``(col, op, value)`` with op in <, <=, >, >=, = and
    ``(col, "is_null"/"is_not_null")``. Runs on the driver over the
    manifest dict — zero I/O, O(files × predicates)."""
    stats = manifest.get("stats", {})
    kept = []
    for name in manifest["files"]:
        st = stats.get(name)
        keep = True
        for p in (predicates or []):
            col, op = p[0], p[1]
            if op not in _PRUNE_OPS:
                raise ValueError(f"unsupported prune op: {op!r}")
            if st is None or col not in st.get("cols", {}):
                continue                      # no stats → can't exclude
            cs = st["cols"][col]
            mn, mx, nulls, rows = cs["min"], cs["max"], cs["nulls"], st["rows"]
            if op == "is_null":
                keep = nulls > 0
            elif op == "is_not_null":
                keep = rows > nulls
            else:
                if mn is None or mx is None:  # all-NULL file: no value
                    keep = False              # can match a comparison
                else:
                    v = _prune_value(p[2])
                    if any(isinstance(x, float) and x != x
                           for x in (mn, mx, v)):
                        continue  # NaN window or predicate: every
                        # comparison below would read False and drop a
                        # file that may hold rows — keep (conservative)
                    keep = {"<": mn < v, "<=": mn <= v,
                            ">": mx > v, ">=": mx >= v,
                            "=": mn <= v <= mx}[op]
                    if op == "=" and keep and "values" in cs:
                        # categorical value set: exact membership beats
                        # the [min, max] window
                        keep = v in cs["values"]
            if not keep:
                break
        if keep:
            kept.append(name)
    return kept


def snap_scan(spark: SparkSession, table: str, predicates: list = (),
              version: int | None = None,
              merge_schema: bool = False) -> DataFrame:
    """Read one snapshot with manifest-level file skipping: files whose
    stats windows exclude the predicates never reach the Spark plan (at
    100 TB this is the difference between planning 40 files and 40,000
    — parquet footer skipping still applies WITHIN the survivors). The
    same predicates are re-applied as a residual filter, so the result
    is exact regardless of how coarse the stats are."""
    from pyspark.sql import functions as F

    m = read_manifest(spark, table, version)
    files = prune_files(m, list(predicates))
    if not files:
        base = read_snapshot(spark, table, version,
                             merge_schema=merge_schema)  # schema-only path
        return base.limit(0)
    df = _read_with_deletes(spark, table, files, m, merge_schema)
    for p in (predicates or []):
        col, op = p[0], p[1]
        if op == "is_null":
            df = df.filter(F.col(col).isNull())
        elif op == "is_not_null":
            df = df.filter(F.col(col).isNotNull())
        else:
            c, v = F.col(col), F.lit(p[2])
            df = df.filter({"<": c < v, "<=": c <= v, ">": c > v,
                            ">=": c >= v, "=": c == v}[op])
    return df


class CommitConflict(Exception):
    """Another writer committed between this writer's snapshot read and
    its commit attempt. Retry: re-read, re-derive, re-commit."""


def _commit(spark: SparkSession, table: str, files: list | None,
            note: str, expected_parent: int | None = None,
            txn: str | None = None, stats: dict | None = None,
            segments: list | None = None,
            deletes: list | None = None,
            partition_by: list | None = None,
            segment_seqs: dict | None = None,
            file_seqs: dict | None = None) -> int:
    """Optimistic concurrency: the manifest file for version v is
    created with create(overwrite=False) — on a store with atomic
    create-if-absent, two writers racing to the same parent see exactly
    one winner; the loser gets CommitConflict and retries against the
    new head. ``expected_parent`` additionally pins the snapshot the
    writer DERIVED its files from (a lost-update guard for
    read-modify-write commits like replace_where; append-only commits
    can leave it None)."""
    # malformed manifests must die at write time, not at a later read:
    # a files list that isn't flat strings (e.g. the (names, stats)
    # tuple _write_data_files returns, passed un-unpacked) would
    # serialize fine and corrupt every downstream resolution
    for seq_name, seq_val in (("files", files), ("segments", segments)):
        if seq_val is not None and (not isinstance(seq_val, (list, tuple))
                                    or any(not isinstance(x, str)
                                           for x in seq_val)):
            raise TypeError(
                f"_commit: {seq_name} must be a list of str names, got "
                f"{type(seq_val).__name__} of "
                f"{[type(x).__name__ for x in seq_val][:3]}")
    parent = current_version(spark, table)
    if expected_parent is not None and parent != expected_parent:
        raise CommitConflict(
            f"{table}: head moved to v{parent} (derived from "
            f"v{expected_parent}) — re-read and retry")
    v = parent + 1
    manifest = {"version": v, "parent": parent or None, "note": note}
    if segments is not None:
        # manifest-list shape: the version file carries only segment
        # NAMES — O(segments) bytes regardless of live file count
        manifest["segments"] = list(segments)
        if segment_seqs:
            # data-sequence numbers (Iceberg v2): which COMMIT's data a
            # segment carries, so equality deletes apply only to files
            # SEQUENCED BEFORE them — the invariant that makes a
            # single-commit MERGE (delete old + add new) readable
            manifest["segment_seqs"] = {
                k: v2 for k, v2 in segment_seqs.items() if k in set(segments)}
    else:
        manifest["files"] = files
        if stats:
            # only stats for files this manifest actually lists (carried
            # forward from the parent for retained files, fresh for new)
            manifest["stats"] = {k: v2 for k, v2 in stats.items()
                                 if k in set(files)}
        if file_seqs:
            # explicit per-file sequences for an INLINE commit that
            # carries deletes forward (snap_clone): relative data/delete
            # order must survive the copy
            manifest["file_seqs"] = {k: v2 for k, v2 in file_seqs.items()
                                     if k in set(files)}
    if deletes:
        # merge-on-read equality deletes: {"file": <key parquet>,
        # "cols": [...]} entries readers anti-join; compaction/overwrite
        # materializes them (their commits simply omit the key)
        manifest["deletes"] = list(deletes)
        if any(d.get("seq") is not None for d in deletes):
            # sequence semantics are load-bearing: a pre-sequence reader
            # would apply these deletes to EVERY file and drop a MERGE's
            # replacement rows — make it refuse instead (_check_format)
            manifest["format"] = _FORMAT_VERSION
    if txn is not None:
        manifest["txn"] = txn
    if partition_by:
        # informational + the pyds reader's cue to rebuild hive
        # partition columns; pruning needs nothing extra (partition
        # values are already per-file min=max stats entries)
        manifest["partition_by"] = list(partition_by)
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


_APPEND_RETRIES = 5
_MAX_SEGMENTS = 64


def _parent_segments(spark: SparkSession, table: str, raw: dict) -> tuple:
    """``(segment refs, segment_seqs)`` for the parent snapshot. A
    legacy inline manifest (or the replace/compact paths, which commit
    inline) is lifted into one segment so the child append stays
    O(delta) forever after — the lifted segment bakes per-file
    sequences into its body (inline commits materialize deletes, so the
    manifest's own version is each file's safe sequence, unless the
    inline commit pinned explicit seqs — the clone path)."""
    if raw["version"] == 0 or not (raw.get("files") or raw.get("segments")):
        return [], {}
    if "segments" in raw:
        return list(raw["segments"]), dict(raw.get("segment_seqs") or {})
    fseqs = raw.get("file_seqs") or {f: raw["version"]
                                     for f in raw["files"]}
    return [_write_segment(spark, table, raw["files"],
                           raw.get("stats", {}), file_seqs=fseqs)], {}


def _coalesce_segments(spark: SparkSession, table: str,
                       segs: list, seg_seqs: dict) -> str:
    """Merge many segment manifests into one — amortized maintenance
    (every _MAX_SEGMENTS appends) that keeps read-side resolution
    O(_MAX_SEGMENTS) small reads instead of O(commits). The merged
    segment spans many commits, so per-file sequences (from each source
    segment's body or the version file's ``segment_seqs``) are baked
    into its body."""
    files: list = []
    stats: dict = {}
    fseqs: dict = {}
    for name in segs:
        seg = _read_segment(spark, table, name)
        files += seg["files"]
        stats.update(seg.get("stats", {}))
        if "file_seqs" in seg:
            fseqs.update({f: seg["file_seqs"].get(f, 0)
                          for f in seg["files"]})
        else:
            fseqs.update({f: seg_seqs.get(name, 0) for f in seg["files"]})
    return _write_segment(spark, table, files, stats, file_seqs=fseqs)


def _resolve_layout(spark: SparkSession, table: str,
                    partition_by: tuple) -> tuple:
    """The ONE hive layout a snapshot's live files may use: mixing
    partitioned and unpartitioned files (or two different partition
    specs) in one manifest would fail Spark's partition discovery at
    read time, so appends inherit the table's recorded layout when none
    is given and REFUSE a conflicting explicit one (relayout goes
    through snap_overwrite, which resets it)."""
    cur = _read_raw_manifest(spark, table)
    recorded = tuple(cur.get("partition_by") or ())
    if not partition_by:
        return recorded
    if cur["version"] and recorded != tuple(partition_by):
        raise ValueError(
            f"{table}: partition_by={tuple(partition_by)} conflicts with "
            f"the table's layout {recorded or '(unpartitioned)'} — "
            "change layout with snap_overwrite")
    return tuple(partition_by)


def snap_append(spark: SparkSession, table: str, df: DataFrame,
                note: str = "append", stat_cols: tuple = (),
                value_cols: tuple = (),
                partition_by: tuple = ()) -> int:
    """Append commit: ONE new segment manifest listing just this
    commit's files (+ stats), referenced by a version file that carries
    the parent's segment names plus the new one — commit payload is
    O(files added), never O(table), so a 10^6-file table appends at the
    same driver cost as a 10-file one. Every _MAX_SEGMENTS appends the
    segment list coalesces into one (amortized O(table/_MAX_SEGMENTS)).
    ``stat_cols`` enables manifest-level pruning stats for the new
    files; parent segments carry forward untouched (files are
    immutable, so their stats are too).

    The commit pins ``expected_parent`` to the manifest it derived its
    segment list from: a commit landing between the manifest read and
    the OCC create would otherwise be silently dropped from the new
    list (lost update). On conflict the already-written data files and
    segment are reused — only the version-file read + commit retries.
    ``value_cols`` opt-in per-file distinct-value sets for categorical
    equality pruning (see _collect_file_stats)."""
    partition_by = _resolve_layout(spark, table, partition_by)
    new, stats = _write_data_files(df, table, stat_cols, value_cols,
                                   partition_by)
    new_seg = _write_segment(spark, table, new, stats)
    for _ in range(_APPEND_RETRIES):
        raw = _read_raw_manifest(spark, table)
        psegs, seg_seqs = _parent_segments(spark, table, raw)
        segs = psegs + [new_seg]
        # the new segment's data sequence = the version this commit will
        # take (expected_parent pins it — a racer forces a retry)
        seg_seqs = {**seg_seqs, new_seg: raw["version"] + 1}
        if len(segs) > _MAX_SEGMENTS:
            segs = [_coalesce_segments(spark, table, segs, seg_seqs)]
            seg_seqs = {}
        try:
            return _commit(spark, table, None, note,
                           expected_parent=raw["version"], segments=segs,
                           deletes=raw.get("deletes"),
                           partition_by=list(partition_by) or None,
                           segment_seqs=seg_seqs or None)
        except CommitConflict:
            continue
    raise CommitConflict(
        f"{table}: append lost the commit race {_APPEND_RETRIES} times")


def snap_overwrite(spark: SparkSession, table: str, df: DataFrame,
                   note: str = "overwrite", stat_cols: tuple = (),
                   value_cols: tuple = (),
                   partition_by: tuple = ()) -> int:
    """Full-table overwrite commit: the manifest simply stops listing
    the old files — they stay on disk for time travel until vacuum.
    ``partition_by`` lays the new files out hive-style with path-derived
    per-file pruning stats (see _write_data_files)."""
    new, stats = _write_data_files(df, table, stat_cols, value_cols,
                                   partition_by)
    return _commit(spark, table, new, note, stats=stats,
                   partition_by=list(partition_by) or None)


def snap_replace_where(spark: SparkSession, table: str, df: DataFrame,
                       predicate: str,
                       note: str = "replace_where",
                       stat_cols: tuple = (),
                       prune_predicates: list | None = None) -> int:
    """Partition-overwrite equivalent without directories: rows of the
    current snapshot NOT matching ``predicate`` are carried alongside
    ``df`` (which must match it); replaced files drop out of the
    manifest.

    ``prune_predicates`` (the ``snap_scan`` tuple form — it must be a
    conservative SUPERSET of ``predicate``, e.g. the partition-key
    range the predicate touches) turns the rewrite from O(table) into
    O(files that can contain matching rows): files whose stats windows
    provably exclude every prune predicate are CARRIED UNTOUCHED —
    name + stats re-listed, bytes never read — and only the candidate
    files are filtered and rewritten. At 100 TB that is the difference
    between rewriting one day's files and the whole table. Without it
    the whole snapshot rewrites (the always-correct fallback, also
    used when merge-on-read deletes are pending — carrying untouched
    files while dropping the delete list would resurrect their deleted
    rows)."""
    base = current_version(spark, table)
    if base == 0:
        # empty table: nothing to carry — the commit is just the new
        # slice (Delta's replaceWhere bootstraps the same way)
        new, stats = _write_data_files(df, table, stat_cols)
        return _commit(spark, table, new, note, expected_parent=0,
                       stats=stats)
    m = read_manifest(spark, table, base)
    layout = tuple(m.get("partition_by") or ())
    untouched: list = []
    if prune_predicates and not m.get("deletes"):
        candidates = set(prune_files(m, list(prune_predicates)))
        untouched = [f for f in m["files"] if f not in candidates]
    else:
        candidates = set(m["files"])
    if candidates:
        cur = _read_with_deletes(spark, table, sorted(candidates), m)
        keep = cur.filter(f"NOT ({predicate})")
        new, stats = _write_data_files(keep.unionByName(df), table,
                                       stat_cols, partition_by=layout)
    else:
        new, stats = _write_data_files(df, table, stat_cols,
                                       partition_by=layout)
    carried = {k: v for k, v in m.get("stats", {}).items() if k in
               set(untouched)}
    # read-modify-write: pin the snapshot the rewrite derived from, so
    # a concurrent commit surfaces as CommitConflict, not a lost update
    return _commit(spark, table, untouched + new, note,
                   expected_parent=base, stats={**carried, **stats},
                   partition_by=list(layout) or None)


def snap_delete_keys(spark: SparkSession, table: str, keys: DataFrame,
                     key_cols: list, note: str = "delete") -> int:
    """MERGE-ON-READ row deletion (Iceberg equality-delete shape): the
    commit writes only the DELETE-KEY parquet (distinct ``key_cols``
    rows of ``keys``) and records it in the manifest's ``deletes`` list
    — no data file is rewritten, so deleting 1k rows from a 10^6-file
    table costs O(keys), not O(table). Readers anti-join the
    accumulated delete keys (``read_snapshot``/``snap_scan``); the next
    ``snap_compact``/``snap_overwrite``/``snap_replace_where``
    MATERIALIZES them (rewritten files exclude the rows, the new commit
    carries no delete list). Same OCC/retry discipline as append. The
    reference deletes row-by-row over JDBC (ref
    ``dags/includes/utils.py``); this is the table-format answer."""
    if current_version(spark, table) == 0:
        raise FileNotFoundError(f"nothing to delete at {table}")
    new, _ = _write_data_files(keys.select(*key_cols).distinct(), table)
    for _ in range(_APPEND_RETRIES):
        raw = _read_raw_manifest(spark, table)
        segs, seg_seqs = _parent_segments(spark, table, raw)
        # the delete's sequence = this commit's version: it applies only
        # to files sequenced BEFORE it (Iceberg-v2 equality-delete rule),
        # so a later append of the same key is NOT retro-deleted
        entries = [{"file": n, "cols": list(key_cols),
                    "seq": raw["version"] + 1} for n in new]
        dels = list(raw.get("deletes", [])) + entries
        try:
            return _commit(spark, table, None, note,
                           expected_parent=raw["version"], segments=segs,
                           deletes=dels, segment_seqs=seg_seqs or None,
                           partition_by=raw.get("partition_by"))
        except CommitConflict:
            continue
    raise CommitConflict(
        f"{table}: delete lost the commit race {_APPEND_RETRIES} times")


def snap_merge_keys(spark: SparkSession, table: str, df: DataFrame,
                    key_cols: list, note: str = "merge",
                    stat_cols: tuple = (),
                    value_cols: tuple = (),
                    on_duplicate: str = "error") -> int:
    """Single-commit MERGE (upsert) into a snapshot table: ONE atomic
    commit that both equality-deletes ``df``'s keys and appends ``df``'s
    rows — whole-row upsert with merge-on-read cost (O(batch) writes, no
    data-file rewrite; Iceberg-v2 MERGE shape). Readers stay correct
    because the delete carries this commit's data-sequence number and
    the new files are sequenced AT it: the delete applies only to files
    sequenced strictly before, so the replacement rows it ships with are
    never self-deleted. Snapshot isolation means a reader sees the old
    rows or the new rows, never a mix. The next compact/overwrite
    materializes the deletes as usual. The reference upserts row-by-row
    over JDBC (ref ``dags/includes/user_table.py:105-121``); this is
    the table-format answer at lake scale.

    ``on_duplicate`` guards the upsert contract against a batch holding
    SEVERAL rows per key: the equality delete applies only to files
    sequenced before this commit, so all duplicates would land and none
    delete — a silent multi-row "upsert". ``"error"`` (default, one
    batch-sized agg; Iceberg's MERGE errors on multiple matches too)
    raises; ``"keep_all"`` documents that the caller WANTS every row
    appended under one delete (an intentional replace-group-by-key)."""
    if on_duplicate not in ("error", "keep_all"):
        raise ValueError(
            f"on_duplicate must be 'error' or 'keep_all', got "
            f"{on_duplicate!r}")
    if on_duplicate == "error":
        from pyspark.sql import functions as F

        dup = (df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
               .filter("__n > 1").limit(1).collect())
        if dup:
            key_desc = {c: dup[0][c] for c in key_cols}
            raise ValueError(
                f"snap_merge_keys: batch has multiple rows for key "
                f"{key_desc} — an upsert needs at most one row per key "
                "(dedupe upstream, or pass on_duplicate='keep_all' to "
                "append all rows for a key as a group replace)")
    if current_version(spark, table) == 0:
        # bootstrap: a merge into an empty table is just an append
        return snap_append(spark, table, df, note=note,
                           stat_cols=stat_cols, value_cols=value_cols)
    layout = _resolve_layout(spark, table, ())
    new, stats = _write_data_files(df, table, stat_cols, value_cols,
                                   partition_by=layout)
    new_seg = _write_segment(spark, table, new, stats)
    keyf, _ = _write_data_files(df.select(*key_cols).distinct(), table)
    for _ in range(_APPEND_RETRIES):
        raw = _read_raw_manifest(spark, table)
        psegs, seg_seqs = _parent_segments(spark, table, raw)
        segs = psegs + [new_seg]
        v = raw["version"] + 1
        seg_seqs = {**seg_seqs, new_seg: v}
        if len(segs) > _MAX_SEGMENTS:
            segs = [_coalesce_segments(spark, table, segs, seg_seqs)]
            seg_seqs = {}
        dels = list(raw.get("deletes", [])) + [
            {"file": n, "cols": list(key_cols), "seq": v} for n in keyf]
        try:
            return _commit(spark, table, None, note,
                           expected_parent=raw["version"], segments=segs,
                           deletes=dels, segment_seqs=seg_seqs or None,
                           partition_by=list(layout) or None)
        except CommitConflict:
            continue
    raise CommitConflict(
        f"{table}: merge lost the commit race {_APPEND_RETRIES} times")


def _apply_delete_entries(spark: SparkSession, table: str, df: DataFrame,
                          dels: list) -> DataFrame:
    """Anti-join equality-delete keys onto ``df``, one join per distinct
    key-column set (delete files sharing a key set read as ONE parquet
    scan). Unhinted: AQE broadcasts small key sets from observed sizes;
    a huge delete backlog degrades to SMJ instead of OOMing the driver —
    and is the signal to run snap_compact."""
    groups: dict = {}
    for d in dels:
        groups.setdefault(tuple(d["cols"]), []).append(d["file"])
    for cols, files in groups.items():
        keys = spark.read.parquet(*[f"{table}/{f}" for f in files])             .select(*cols).dropDuplicates(list(cols))
        df = df.join(keys, list(cols), "left_anti")
    return df


def _read_with_deletes(spark: SparkSession, table: str, files: list,
                       manifest: dict,
                       merge_schema: bool = False) -> DataFrame:
    """Read ``files`` applying the snapshot's merge-on-read equality
    deletes under the DATA-SEQUENCE rule (Iceberg v2): a delete with
    sequence s applies only to files sequenced strictly BEFORE s —
    the invariant that makes a single-commit MERGE (delete old keys +
    add replacement rows) readable, and that keeps a later re-append of
    a deleted key alive. Files are grouped by their applicable-delete
    set (group count ≤ distinct sequences, itself ≤ segments — bounded,
    and 1 for the common all-legacy case, identical plan to before);
    each group is one parquet scan + its anti-joins, unioned. Legacy
    delete entries without ``seq`` apply to everything (pre-sequence
    behavior, unchanged)."""
    dels = manifest.get("deletes") or []
    if not dels:
        return _read_files(spark, table, files, manifest.get("partition_by"),
                           merge_schema)
    fseqs = manifest.get("file_seqs") or {}
    groups: dict = {}
    for f in files:
        s = fseqs.get(f, 0)
        key = tuple(i for i, d in enumerate(dels)
                    if d.get("seq") is None or d["seq"] > s)
        groups.setdefault(key, []).append(f)
    out = None
    for key in sorted(groups):
        df = _read_files(spark, table, groups[key],
                         manifest.get("partition_by"), merge_schema)
        df = _apply_delete_entries(spark, table, df,
                                   [dels[i] for i in key])
        out = df if out is None else out.unionByName(
            df, allowMissingColumns=merge_schema)
    return out


def committed_txns(spark: SparkSession, table: str) -> set:
    """Transaction ids recorded by ``snap_append_txn`` across the
    retained history (walk is O(versions), driver-side, manifest-sized).
    """
    out = set()
    v = current_version(spark, table)
    while v:
        m = _read_raw_manifest(spark, table, v)   # txn/parent only —
        if m.get("txn") is not None:              # no segment resolution
            out.add(m["txn"])
        v = m["parent"] or 0
    return out


def snap_append_txn(spark: SparkSession, table: str, df: DataFrame,
                    txn: str, note: str = "append",
                    stat_cols: tuple = ()) -> int | None:
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
    layout = _resolve_layout(spark, table, ())
    new, stats = _write_data_files(df, table, stat_cols,
                                   partition_by=layout)
    new_seg = _write_segment(spark, table, new, stats)
    for _ in range(_APPEND_RETRIES):
        # re-check the txn inside the retry loop: the racer we lost to
        # may have BEEN this txn (two replaying workers of one epoch)
        if txn in committed_txns(spark, table):
            return None
        raw = _read_raw_manifest(spark, table)
        psegs, seg_seqs = _parent_segments(spark, table, raw)
        segs = psegs + [new_seg]
        seg_seqs = {**seg_seqs, new_seg: raw["version"] + 1}
        if len(segs) > _MAX_SEGMENTS:
            segs = [_coalesce_segments(spark, table, segs, seg_seqs)]
            seg_seqs = {}
        try:
            return _commit(spark, table, None, note, txn=txn,
                           expected_parent=raw["version"], segments=segs,
                           deletes=raw.get("deletes"),
                           partition_by=list(layout) or None,
                           segment_seqs=seg_seqs or None)
        except CommitConflict:
            continue
    raise CommitConflict(
        f"{table}: txn append lost the commit race {_APPEND_RETRIES} times")


def read_snapshot(spark: SparkSession, table: str,
                  version: int | None = None,
                  merge_schema: bool = False) -> DataFrame:
    """DataFrame over one snapshot's EXPLICIT file list — no directory
    listing, no visibility of in-flight commits; pass ``version`` for
    time travel. An empty table yields an empty error upstream — commit
    first. ``merge_schema=True`` unions the schemas of every listed
    file (columns added by later commits come back NULL-filled for old
    files) — schema evolution on read, at the cost of a footer read per
    file, so leave it off for fixed-schema tables."""
    m = read_manifest(spark, table, version)
    if not m["files"]:
        raise FileNotFoundError(f"snapshot v{m['version']} is empty")
    return _read_with_deletes(spark, table, m["files"], m, merge_schema)


def snap_compact(spark: SparkSession, table: str,
                 target_files: int = 1,
                 stat_cols: tuple = (),
                 cluster_by: tuple = ()) -> int:
    """Bin-pack the current snapshot into ``target_files`` files —
    identical rows, new layout — as ONE OCC-pinned commit: the compactor
    derives from the head it read, so a concurrent append surfaces as
    ``CommitConflict`` (retry against the new head) instead of silently
    dropping the racer's rows. Old files stay for time travel until
    vacuum. This is the table-format answer to the small-files problem
    streaming appends create: run it on a schedule, readers never
    notice (snapshot isolation), and per-file stats are rebuilt so
    pruning IMPROVES as data coalesces.

    ``cluster_by`` additionally RANGE-CLUSTERS the rewrite on those
    columns (repartitionByRange + sortWithinPartitions — Delta's
    OPTIMIZE ZORDER intent for the single-key/prefix case): each output
    file then covers a narrow, non-overlapping slice of the cluster
    key, so its manifest min/max window is tight and a point/range
    predicate prunes to O(1) files instead of all of them. At 100 TB
    this is the difference between scanning one file and scanning the
    table for a key lookup; pair it with ``stat_cols`` covering the
    cluster key (they are added automatically)."""
    base = current_version(spark, table)
    if base == 0:
        raise FileNotFoundError(f"nothing to compact at {table}")
    cur = read_snapshot(spark, table, version=base)
    if cluster_by:
        cols = [c for c in cluster_by]
        packed = (cur.repartitionByRange(target_files, *cols)
                  .sortWithinPartitions(*cols))
        stat_cols = tuple(dict.fromkeys(tuple(stat_cols) + tuple(cols)))
        note = f"compact({target_files}, cluster_by={cols})"
    else:
        packed = cur.repartition(target_files)
        note = f"compact({target_files})"
    layout = _resolve_layout(spark, table, ())
    new, stats = _write_data_files(packed, table, stat_cols,
                                   partition_by=layout)
    return _commit(spark, table, new, note,
                   expected_parent=base, stats=stats,
                   partition_by=list(layout) or None)


def snap_restore(spark: SparkSession, table: str, version: int,
                 note: str | None = None) -> int:
    """Roll the table back (or forward) to ``version``'s EXACT state as
    a NEW commit — time travel made durable (Delta's RESTORE / Iceberg's
    rollback). No data moves: the new manifest re-lists the old
    snapshot's files, stats, deletes and data sequences verbatim, so
    the restore is O(manifest) regardless of table size, and the
    intermediate history stays readable for time travel until vacuum.
    Sequence safety needs no renormalization (unlike snap_clone): the
    version counter never restarts, so every future commit's sequence
    is strictly above everything restored."""
    head = current_version(spark, table)
    if version > head or version < 1:
        raise ValueError(f"{table}: cannot restore v{version} "
                         f"(head is v{head})")
    m = read_manifest(spark, table, version)
    dels = m.get("deletes")
    return _commit(
        spark, table, list(m["files"]),
        note or f"restore(v{version})",
        expected_parent=head, stats=m.get("stats"),
        deletes=dels,
        partition_by=m.get("partition_by"),
        file_seqs=m.get("file_seqs") if dels else None)


def snap_changes(spark: SparkSession, table: str,
                 from_version: int, to_version: int | None = None) -> DataFrame:
    """Change feed for append-style tables: rows in files ADDED by
    commits in (from_version, to_version] — the incremental-consumer
    contract (\"give me what landed since v\"). Cost is a read of only
    the added files, never the table. Raises if any commit in the range
    REMOVED files (overwrite/replace_where/compact rewrite history, so
    added-files no longer mean added-rows; consumers must re-read the
    snapshot instead — same rule as Delta's CDF for non-append commits).
    """
    to_v = current_version(spark, table) if to_version is None else to_version
    if to_v < from_version:
        raise ValueError(f"to_version {to_v} < from_version {from_version}")
    base_m = read_manifest(spark, table, from_version) \
        if from_version else {"files": []}
    prev = set(base_m["files"])
    prev_dels = [d["file"] for d in base_m.get("deletes", [])]
    added: list = []
    layout_of: dict = {}  # file -> partition_by of the commit that ADDED it
    for v in range(from_version + 1, to_v + 1):
        m = read_manifest(spark, table, v)
        cur = set(m["files"])
        cur_dels = [d["file"] for d in m.get("deletes", [])]
        if prev - cur:
            raise ValueError(
                f"{table} v{v} removed files (non-append commit) — "
                "change feed undefined; re-read the snapshot")
        if cur_dels != prev_dels:
            raise ValueError(
                f"{table} v{v} changed the delete list (merge-on-read "
                "delete or compaction) — added-files no longer mean "
                "added-rows; re-read the snapshot")
        new = sorted(cur - prev)
        pb = tuple(m.get("partition_by") or ())
        for f in new:
            layout_of[f] = pb
        added += new
        prev, prev_dels = cur, cur_dels
    if not added:
        return read_snapshot(spark, table, version=to_v).limit(0)
    # partition_by is resolved PER SOURCE VERSION, not from HEAD: if the
    # layout changed mid-range (e.g. relayout of an empty table followed
    # by partitioned appends), each file group reads under the layout it
    # was written with; unionByName reconciles column order, and a true
    # schema divergence surfaces as its clear error rather than NULLed
    # partition columns.
    groups: dict = {}
    for f in added:
        groups.setdefault(layout_of[f], []).append(f)
    out = None
    for pb in sorted(groups):
        df = _read_files(spark, table, groups[pb], list(pb) or None)
        out = df if out is None else out.unionByName(df)
    return out


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
           keep_versions: int = 1,
           retention_ms: int = 3_600_000) -> list:
    """Delete data files referenced ONLY by snapshots older than the
    newest ``keep_versions`` (plus orphans from crashed commits — files
    no manifest references at all). Time travel works up to the vacuum
    horizon, exactly the Delta/Iceberg contract. Returns deleted names.

    ``retention_ms`` (default 1 h) skips files younger than the window
    regardless of references: a concurrent appender writes its data
    files BEFORE its commit, so a zero-window vacuum racing it would
    delete the not-yet-referenced files and let the append commit a
    manifest pointing at nothing — the Delta/Iceberg retention
    convention closes that race. Tests pass ``retention_ms=0`` for
    deterministic single-writer cleanup."""
    head = current_version(spark, table)
    keep = set()
    v = head
    for _ in range(keep_versions):
        if not v:
            break
        m = read_manifest(spark, table, v)
        keep.update(m["files"])
        keep.update(d["file"] for d in m.get("deletes", []))
        v = m["parent"] or 0
    fs, jvm = _jvm_fs(spark, f"{table}/data")
    root = jvm.org.apache.hadoop.fs.Path(f"{table}/data")
    deleted = []
    if not fs.exists(root):
        return deleted
    now_ms = jvm.java.lang.System.currentTimeMillis()
    for sub in fs.listStatus(root):
        for st in fs.listStatus(sub.getPath()):
            rel = f"data/{sub.getPath().getName()}/{st.getPath().getName()}"
            young = now_ms - st.getModificationTime() < retention_ms
            if rel not in keep and not young:
                fs.delete(st.getPath(), False)
                deleted.append(rel)
        if len(fs.listStatus(sub.getPath())) == 0:
            fs.delete(sub.getPath(), False)
    return sorted(deleted)


def snap_clone(spark: SparkSession, src_table: str, dst_table: str,
               version: int | None = None,
               note: str | None = None) -> int:
    """Byte-level snapshot clone: copy EXACTLY the files the chosen
    snapshot references (data files + merge-on-read delete keys, same
    relative names so stats keys carry unchanged) into a fresh table
    directory and commit them as its v1 — the backup / environment-
    promotion primitive (prod table → staging clone, divergent
    histories from then on; a later vacuum of the source cannot touch
    the clone). The copy loop is driver-side over the manifest's file
    LIST (names, not data — the bytes move FS-to-FS via FileUtil.copy);
    for a 10^6-file table distribute the copy with a files-list job and
    commit the same manifest afterwards, same contract."""
    m = read_manifest(spark, src_table, version)
    if current_version(spark, dst_table) != 0:
        raise ValueError(f"snap_clone: {dst_table} is not empty")
    fs, jvm = _jvm_fs(spark, src_table)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    FileUtil = jvm.org.apache.hadoop.fs.FileUtil
    Path = jvm.org.apache.hadoop.fs.Path
    dfs = Path(dst_table).getFileSystem(conf)
    to_copy = list(m["files"]) + [d["file"] for d in m.get("deletes", [])]
    for rel in to_copy:
        src_p, dst_p = Path(f"{src_table}/{rel}"), Path(f"{dst_table}/{rel}")
        dfs.mkdirs(dst_p.getParent())
        if not FileUtil.copy(fs, src_p, dfs, dst_p, False, True, conf):
            raise IOError(f"snap_clone: copy failed for {rel}")
    # Deletes travel with their seq fields, so the clone must pin the
    # source's file sequences too — an inline default of "everything is
    # v1" would put every file BELOW carried deletes and re-delete rows
    # a source-side MERGE had just written. But the source seqs CANNOT
    # carry verbatim either: the clone commits at v1 and the dst's
    # version counter restarts, so a post-clone delete at seq 2 would
    # skip cloned files whose source seq is >= 2, and a post-clone
    # append at seq 2-3 would be retro-deleted by carried deletes with
    # higher source seqs. Renormalize ORDER-PRESERVINGLY into (0, 1]:
    # seqs are only ever compared (delete.seq > file.seq, strict), so
    # fractional ranks keep every carried relation intact while every
    # future dst commit (version >= 2) sequences strictly after ALL
    # carried files and deletes.
    dels = m.get("deletes") or []
    fseqs = None
    if dels:
        src_fseqs = m.get("file_seqs") or {}
        all_seqs = sorted({src_fseqs.get(f, 0) for f in m["files"]} |
                          {d["seq"] for d in dels
                           if d.get("seq") is not None})
        rank = {s: (i + 1) / len(all_seqs)
                for i, s in enumerate(all_seqs)}
        fseqs = {f: rank[src_fseqs.get(f, 0)] for f in m["files"]}
        dels = [{**d, "seq": rank[d["seq"]]}
                if d.get("seq") is not None else dict(d) for d in dels]
    return _commit(
        spark, dst_table, list(m["files"]),
        note or f"clone of {src_table}@v{m['version']}",
        expected_parent=0, stats=m.get("stats"),
        deletes=dels or None, file_seqs=fseqs)
