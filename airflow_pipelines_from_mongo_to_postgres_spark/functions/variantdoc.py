"""Schemaless documents as Spark 4 VARIANT columns.

The reference's source rows are MongoDB documents — schemaless, nested,
per-row shape drift (ref ``dags/includes/user_table.py:58-87`` flattens
them with ``element.get(path, default)`` chains). The engine's primary
answer is declared StructType schemas + the conform layer
(functions/conform.py), which is right when the shape IS known. VARIANT
(Spark 4's semi-structured type, same design as Snowflake/Databricks
VARIANT) is the answer when it ISN'T: ingest the raw document once as a
binary-encoded variant and let every query extract typed paths on
demand — no schema migration when producers add fields, no
corrupt-record column when one document in a billion has a string where
a number belongs (``try_variant_get`` brackets the type per access).

Scale notes: variant is a BINARY encoding (not JSON text) — parse once
at ingest, then path extraction is JVM-side byte walking with
whole-stage codegen, no Python anywhere; shredding/pushdown aside, a
variant scan reads one column, not the blast radius of a 400-column
exploded schema.

All helpers are pure Column builders (zero UDFs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_variant(col, *, strict: bool = False) -> Column:
    """JSON text -> VARIANT. Non-strict (default) uses
    ``try_parse_json``: a malformed document becomes NULL instead of
    failing the job — the M14 quarantine discipline (ref
    ``user_table.py:116-121`` drops bad rows silently; we keep them
    visible as NULLs a filter can route)."""
    return F.parse_json(col) if strict else F.try_parse_json(col)


def vget(doc, path: str, dtype: str, default=None) -> Column:
    """One typed path extraction: ``$.a.b[0]`` style paths, null-safe on
    missing paths AND on type mismatch (``try_variant_get``), with an
    optional default — the exact semantics of the reference's
    ``element.get("a", {}).get("b", default)`` chains (ref
    ``user_table.py:64-84``) as one codegen'd expression."""
    c = F.try_variant_get(doc if isinstance(doc, Column) else F.col(doc),
                          path, dtype)
    return c if default is None else F.coalesce(c, F.lit(default))


def vexists(doc, path: str) -> Column:
    """Mongo ``$exists`` over variant: the path resolves to any value
    (including null-typed JSON null? no — variant null IS absent for
    ``$exists`` purposes, matching ``try_variant_get`` returning NULL)."""
    return F.try_variant_get(
        doc if isinstance(doc, Column) else F.col(doc),
        path, "variant").isNotNull()


def variant_conform(df: DataFrame, doc_col: str, spec: dict,
                    keep: tuple = ()) -> DataFrame:
    """The schemaless twin of the entity flatten (plans/entities.py):
    project a variant document column into typed scalars in ONE select.
    ``spec``: ``out_name -> (path, spark_type[, default])``. ``keep``
    passes non-document columns through unchanged."""
    cols = [F.col(c) for c in keep]
    for out, s in spec.items():
        cols.append(vget(doc_col, s[0], s[1],
                         s[2] if len(s) > 2 else None).alias(out))
    return df.select(*cols)


# --- MongoDB Extended JSON v2 (mongoexport / mongodump) ----------------------
def ejson_get(doc, path: str, dtype: str, default=None) -> Column:
    """Typed path extraction over MongoDB Extended JSON v2 — the
    format ``mongoexport`` / ``mongodump`` emit, i.e. the file a
    reference user actually has in hand when they leave the live
    cluster behind. BSON values arrive as wrapper documents
    (``{"$oid"}``, ``{"$date"}`` ISO or ``{"$date":{"$numberLong"}}``
    canonical millis, ``{"$numberLong/Int/Double/Decimal"}`` with
    string payloads, ``{"$binary":{"base64",...}}``); relaxed-mode
    plain values pass through unchanged. One coalesce chain per
    target type — variant byte-walking + try_cast, fully codegen,
    null on mismatch (the M14 quarantine discipline), no UDFs."""
    d = doc if isinstance(doc, Column) else F.col(doc)

    def wrap(sub: str) -> Column:
        return F.try_variant_get(d, f"{path}.{sub}", "string")

    plain = F.try_variant_get(d, path, dtype)
    alts: list[Column] = []
    if dtype == "string":
        alts = [wrap("$oid")]
    elif dtype in ("tinyint", "smallint", "int", "bigint", "long"):
        t = "bigint" if dtype == "long" else dtype
        plain = F.try_variant_get(d, path, t)
        alts = [wrap("$numberLong").try_cast(t),
                wrap("$numberInt").try_cast(t)]
    elif dtype in ("float", "double"):
        # canonical payloads are strings, incl. "Infinity"/"NaN"
        alts = [wrap("$numberDouble").try_cast(dtype),
                wrap("$numberDecimal").try_cast(dtype),
                wrap("$numberLong").try_cast(dtype),
                wrap("$numberInt").try_cast(dtype)]
    elif dtype.startswith("decimal"):
        alts = [wrap("$numberDecimal").try_cast(dtype),
                wrap("$numberLong").try_cast(dtype),
                wrap("$numberInt").try_cast(dtype)]
    elif dtype in ("timestamp", "timestamp_ntz", "date"):
        ms = F.try_variant_get(d, f"{path}.$date.$numberLong", "string")
        alts = [wrap("$date").try_cast(dtype),
                F.timestamp_millis(ms.try_cast("bigint")).try_cast(dtype)]
    elif dtype == "binary":
        alts = [F.try_to_binary(wrap("$binary.base64"), F.lit("base64"))]
    # wrapper legs FIRST: variant_get-to-string SERIALIZES an object
    # (so a wrapped {"$oid": ...} would leak its JSON text through the
    # plain leg); a wrapper key never exists on a plain value, so the
    # order costs nothing there
    out = F.coalesce(*alts, plain) if alts else plain
    return out if default is None else F.coalesce(out, F.lit(default))


def ejson_conform(df: DataFrame, doc_col: str, spec: dict,
                  keep: tuple = ()) -> DataFrame:
    """:func:`variant_conform` over Extended JSON v2 documents —
    ``spec``: ``out_name -> (path, spark_type[, default])``, wrapper
    documents unwrapped per :func:`ejson_get`. The drop-in ingest for
    mongoexport JSON-lines: ``as_variant`` the raw line, conform with
    this, and the reference's entity specs run unchanged."""
    cols = [F.col(c) for c in keep]
    for out, s in spec.items():
        cols.append(ejson_get(doc_col, s[0], s[1],
                              s[2] if len(s) > 2 else None).alias(out))
    return df.select(*cols)


def ejson_render(df: DataFrame, fields: Sequence[str] | None = None) -> Column:
    """Render typed columns as ONE canonical Extended JSON v2 document
    string per row — the inverse of :func:`ejson_conform`, so engine
    output feeds straight into ``mongoimport`` (the return path for a
    reference user who still has Mongo consumers). Wrapper choice is
    driven by the COLUMN TYPE: integers → ``{"$numberLong"}``, floats
    → ``{"$numberDouble"}``, decimals → ``{"$numberDecimal"}``,
    date/timestamp → canonical ``{"$date": {"$numberLong": millis}}``,
    binary → ``{"$binary": {"base64", "subType": "00"}}``; strings and
    booleans stay relaxed. Built as one nested struct + ``to_json`` —
    pure codegen, no UDFs. A SQL NULL renders as an ABSENT field
    (``to_json`` drops null struct fields; Mongo treats missing and
    null alike on read — documented)."""
    from pyspark.sql import types as ST

    names = list(fields) if fields is not None else list(df.columns)
    parts: list[Column] = []
    for n in names:
        dt = df.schema[n].dataType
        c = F.col(n)
        if isinstance(dt, (ST.ByteType, ST.ShortType, ST.IntegerType,
                           ST.LongType)):
            w = F.struct(c.cast("string").alias("$numberLong"))
        elif isinstance(dt, (ST.FloatType, ST.DoubleType)):
            w = F.struct(c.cast("string").alias("$numberDouble"))
        elif isinstance(dt, ST.DecimalType):
            w = F.struct(c.cast("string").alias("$numberDecimal"))
        elif isinstance(dt, (ST.DateType, ST.TimestampType,
                             ST.TimestampNTZType)):
            ms = F.unix_millis(c.cast("timestamp")).cast("string")
            w = F.struct(F.struct(ms.alias("$numberLong")).alias("$date"))
        elif isinstance(dt, ST.BinaryType):
            w = F.struct(F.struct(
                F.base64(c).alias("base64"),
                F.lit("00").alias("subType")).alias("$binary"))
        elif isinstance(dt, (ST.StringType, ST.BooleanType)):
            w = c
        else:
            raise ValueError(
                f"ejson_render: no Extended JSON wrapper for column "
                f"{n!r} of type {dt.simpleString()}")
        if not isinstance(dt, (ST.StringType, ST.BooleanType)):
            # null value -> null wrapper STRUCT (not {"$...": null}),
            # so to_json drops the field entirely
            w = F.when(c.isNull(), F.lit(None)).otherwise(w)
        parts.append(w.alias(n))
    return F.to_json(F.struct(*parts))


# --- mongo $match over variant docs -----------------------------------------
_CMP = {"$eq": "==", "$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<=",
        "$ne": "!="}


def _typed(path: str, value) -> Column:
    """Extraction typed FROM the literal it is compared to — the
    type-bracketed $match semantics the struct-mode translator
    implements (sources/mongoql.py): a document whose field holds a
    different type never matches a typed comparison, it just extracts
    NULL and drops."""
    if isinstance(value, bool):
        t = "boolean"
    elif isinstance(value, int):
        t = "bigint"
    elif isinstance(value, float):
        t = "double"
    else:
        t = "string"
    return F.try_variant_get("__doc__", f"$.{path}", t)


def _variant_op(path: str, op: str, val, spec: dict) -> Column:
    """One $match operator against a variant path — the schemaless twin
    of mongoql._match_op (same operator set where types allow)."""
    if op == "$exists":
        e = F.try_variant_get("__doc__", f"$.{path}",
                              "variant").isNotNull()
        return e if val else ~e
    if op in ("$in", "$nin"):
        c = _typed(path, val[0] if val else "")
        inset = c.isin(list(val)) if val else F.lit(False)
        if op == "$nin":
            # Mongo: $nin also matches missing fields (null extraction)
            return F.coalesce(~inset, F.lit(True))
        return inset
    if op == "$regex":
        pattern = val
        options = spec.get("$options")
        if options:
            if not set(options) <= set("imsx"):
                raise ValueError(
                    f"unsupported $regex options: {options!r}")
            pattern = f"(?{options})" + pattern
        return _typed(path, "").rlike(pattern)
    if op == "$mod":
        if not isinstance(val, list) or len(val) != 2:
            raise ValueError("$mod expects [divisor, remainder]")
        return (_typed(path, 0) % F.lit(val[0])) == F.lit(val[1])
    if op == "$not":
        # fails-including-nulls, the struct-mode rule (mongoql)
        if isinstance(val, str):
            inner = _variant_op(path, "$regex", val, {})
        elif isinstance(val, dict) and val:
            inner = None
            for k, v in val.items():
                if k == "$options":
                    continue
                c = _variant_op(path, k, v, val)
                inner = c if inner is None else inner & c
        else:
            raise ValueError("$not expects an operator document or regex")
        return F.coalesce(~inner, F.lit(True))
    if op in _CMP:
        c = _typed(path, val)
        return {"$eq": c == F.lit(val),
                "$ne": c != F.lit(val),
                "$gt": c > F.lit(val),
                "$gte": c >= F.lit(val),
                "$lt": c < F.lit(val),
                "$lte": c <= F.lit(val)}[op]
    raise ValueError(f"unsupported $match op on variant: {op!r}")


def _match_expr(cond: dict) -> Column:
    exprs = []
    for path, spec in cond.items():
        if path in ("$and", "$or"):
            sub = [_match_expr(c) for c in spec]
            e = sub[0]
            for s in sub[1:]:
                e = (e & s) if path == "$and" else (e | s)
            exprs.append(e)
            continue
        if path == "$nor":
            for c in spec:
                exprs.append(F.coalesce(~_match_expr(c), F.lit(True)))
            continue
        if not isinstance(spec, dict):
            spec = {"$eq": spec}
        for op, val in spec.items():
            if op == "$options":
                if "$regex" not in spec:
                    raise ValueError("$options requires $regex")
                continue
            exprs.append(_variant_op(path, op, val, spec))
    out = exprs[0]
    for e in exprs[1:]:
        out = out & e
    return out


def variant_select(df: DataFrame, doc_col: str, fields: dict,
                   keep: tuple = ()) -> DataFrame:
    """Conform a VARIANT document into (possibly NESTED) typed columns
    in ONE select, rebuilding intermediate structs so downstream dotted
    references (``F.col("profile.name")``, mongoql's ``$profile.name``)
    resolve natively.

    ``fields``: ``dotted.path -> spark_type`` (or ``(type, default)``).
    ``{"a": "bigint", "p.x": "string", "p.y": "double"}`` yields columns
    ``a: bigint`` and ``p: struct<x:string, y:double>``. Array paths
    take array types (``"array<struct<q:bigint,r:string>>"``) so an
    extraction feeds ``explode``/``$unwind`` directly. A path cannot be
    both a leaf and a parent (``"p"`` + ``"p.x"`` raises). A document
    MISSING a parent yields a NULL struct, matching a typed schema's
    reading of a missing subdocument (leaf defaults apply only inside a
    present parent).

    This differs from ``variant_conform`` (flat out-name -> path spec):
    here the OUTPUT SHAPE mirrors the document, which is what a Mongo
    pipeline's field references assume."""
    tree: dict = {}
    for path, spec in fields.items():
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(
                    f"field path conflict at {p!r} in {path!r}: "
                    "a leaf cannot also be a parent")
        if parts[-1] in node:
            raise ValueError(f"field path conflict: {path!r}")
        node[parts[-1]] = spec if isinstance(spec, tuple) else (spec,)

    def build(node: dict, prefix: str) -> list[Column]:
        cols = []
        for name, sub in node.items():
            p = f"{prefix}.{name}"
            if isinstance(sub, dict):
                # a document without the parent yields a NULL struct
                # (the typed-schema reading of a missing subdocument),
                # not a struct of NULLs — struct-translator parity
                cols.append(F.when(vexists(doc_col, p),
                                   F.struct(*build(sub, p))).alias(name))
            else:
                cols.append(vget(doc_col, p, sub[0],
                                 sub[1] if len(sub) > 1 else None)
                            .alias(name))
        return cols

    return df.select(*[F.col(c) for c in keep], *build(tree, "$"))


def variant_pipeline(df: DataFrame, doc_col: str, stages: list,
                     fields: dict, collections: dict | None = None,
                     keep_null_docs: bool = False) -> DataFrame:
    """Run a MongoDB aggregation pipeline ($match/$unwind/$group/
    computed $project/$addFields/$sort/$limit/$lookup — the full
    translator surface) against a VARIANT document column with NO
    declared table schema.

    Two-step plan: (1) ONE select conforms exactly the document paths
    the pipeline reads — declared in ``fields`` with their types, the
    same per-access type bracketing every variant read requires — into
    document-shaped typed columns (``variant_select``); (2) the
    struct-mode translator (sources/mongoql/stages.py::apply_pipeline) runs
    unchanged on top, so the whole expression language ($cond/$switch/
    arithmetic/accumulators) is available over schemaless ingest.
    Everything stays JVM-side whole-stage codegen: variant byte-walk
    extraction, then ordinary Column expressions.

    Malformed documents (NULL variants from non-strict ``as_variant``)
    are quarantine rows, not documents: they are excluded before the
    pipeline unless ``keep_null_docs=True`` (which surfaces them as
    all-NULL extractions, Mongo's missing-field behavior)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.mongoql import (
        apply_pipeline,
    )
    src = df if keep_null_docs else df.filter(F.col(doc_col).isNotNull())
    return apply_pipeline(variant_select(src, doc_col, fields), stages,
                          collections)


def variant_match(df: DataFrame, doc_col: str, cond: dict) -> DataFrame:
    """Mongo ``$match`` against a VARIANT document column — dotted
    paths, comparison ops, ``$in``/``$exists``/``$and``/``$or``, with
    the same type-bracketed semantics as the struct-mode translator
    (a type-mismatched field extracts NULL and the row drops). Lets a
    reference user run their ``$match`` stages on documents ingested
    WITHOUT any declared schema.

    A NULL document (malformed JSON under non-strict ``as_variant``)
    matches NO condition — not even ``$exists: false`` — because it is
    a quarantine row, not a document; route it with
    ``df.filter(col(doc).isNull())`` instead."""
    renamed = df.withColumnRenamed(doc_col, "__doc__")
    out = renamed.filter(F.col("__doc__").isNotNull() & _match_expr(cond))
    return out.withColumnRenamed("__doc__", doc_col)
