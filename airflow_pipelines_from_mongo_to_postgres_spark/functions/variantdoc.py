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


def _match_expr(cond: dict) -> Column:
    exprs = []
    for path, spec in cond.items():
        if path == "$and":
            sub = [_match_expr(c) for c in spec]
            e = sub[0]
            for s in sub[1:]:
                e = e & s
            exprs.append(e)
            continue
        if path == "$or":
            sub = [_match_expr(c) for c in spec]
            e = sub[0]
            for s in sub[1:]:
                e = e | s
            exprs.append(e)
            continue
        if not isinstance(spec, dict):
            spec = {"$eq": spec}
        for op, val in spec.items():
            if op == "$exists":
                e = F.try_variant_get("__doc__", f"$.{path}",
                                      "variant").isNotNull()
                exprs.append(e if val else ~e)
            elif op == "$in":
                c = _typed(path, val[0] if val else "")
                exprs.append(c.isin(list(val)))
            elif op in _CMP:
                c = _typed(path, val)
                exprs.append({"$eq": c == F.lit(val),
                              "$ne": c != F.lit(val),
                              "$gt": c > F.lit(val),
                              "$gte": c >= F.lit(val),
                              "$lt": c < F.lit(val),
                              "$lte": c <= F.lit(val)}[op])
            else:
                raise ValueError(f"unsupported $match op on variant: {op!r}")
    out = exprs[0]
    for e in exprs[1:]:
        out = out & e
    return out


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
