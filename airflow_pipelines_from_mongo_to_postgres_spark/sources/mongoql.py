"""MongoDB aggregation-pipeline → DataFrame translator.

The reference embeds hand-written aggregation pipelines per collection
(ref dags/includes/loanapplication_table.py:26-49: ``$match`` with a
``$gt`` datetime bound, ``$unwind {path}``, dotted-path ``$project``).
``apply_pipeline`` lets those pipeline definitions run verbatim against
a DataFrame — the drop-in path for a reference user whose collection is
already in the lake (parquet/CSV export) rather than behind a live
connector. For the live path, the SAME list serializes into the Spark
connector's server-side ``aggregation.pipeline`` option
(connectors.mongo_read_options), so one definition serves both.

Every stage translates to declarative DataFrame ops (Catalyst prunes and
pushes down through them); nothing collects, nothing loops rows.

Supported stages — the reference's three, plus the common tail:
``$match`` (equality, ``$eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$exists``,
``$and/$or``), ``$project`` (include / exclude / "$path" aliases),
``$unwind`` (str or ``{path, preserveNullAndEmptyArrays}``),
``$addFields``/``$set``, ``$group`` (``$sum/$avg/$min/$max/$count`` and
``$sum: 1``), ``$sort``, ``$limit``, ``$skip``, ``$count``.

Mongo-fidelity notes:
* dotted ``$project`` includes are materialized as flat columns NAMED by
  their dotted path (the conform layer's flatten specs expect exactly
  that shape);
* ``$unwind`` defaults to dropping null/empty arrays, as Mongo does
  (preserveNullAndEmptyArrays=True maps to ``explode_outer``);
* ``$skip`` uses DataFrame.offset — meaningful only after a ``$sort``,
  same as Mongo.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CMP = {"$eq": "__eq__", "$ne": "__ne__", "$gt": "__gt__", "$gte": "__ge__",
        "$lt": "__lt__", "$lte": "__le__"}


def _ref(v: Any) -> Column:
    """'$a.b' → column reference; anything else → literal."""
    if isinstance(v, str) and v.startswith("$"):
        return F.col(v[1:])
    return F.lit(v)


def _match_cond(cond: dict[str, Any]) -> Column:
    if not cond:
        return F.lit(True)  # Mongo: {$match: {}} is match-all
    parts: list[Column] = []
    for field, spec in cond.items():
        if field == "$and":
            sub = [_match_cond(c) for c in spec] or [F.lit(True)]
            acc = sub[0]
            for c in sub[1:]:
                acc = acc & c
            parts.append(acc)
        elif field == "$or":
            sub = [_match_cond(c) for c in spec] or [F.lit(True)]
            acc = sub[0]
            for c in sub[1:]:
                acc = acc | c
            parts.append(acc)
        elif isinstance(spec, dict) and any(k.startswith("$") for k in spec):
            col = F.col(field)
            for op, val in spec.items():
                if op in _CMP:
                    parts.append(getattr(col, _CMP[op])(F.lit(val)))
                elif op == "$in":
                    parts.append(col.isin(*val))
                elif op == "$nin":
                    parts.append(~col.isin(*val))
                elif op == "$exists":
                    parts.append(col.isNotNull() if val else col.isNull())
                else:
                    raise ValueError(f"unsupported $match operator: {op}")
        else:
            parts.append(F.col(field) == F.lit(spec))
    acc = parts[0]
    for c in parts[1:]:
        acc = acc & c
    return acc


def _project(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    keep_id = "_id" in df.columns and spec.get("_id", 1) not in (0, False)
    includes = {k: v for k, v in spec.items()
                if k != "_id" and v not in (0, False)}
    excludes = [k for k, v in spec.items() if v in (0, False) and k != "_id"]
    if includes:
        cols: list[Column] = []
        if keep_id:
            cols.append(F.col("_id"))
        for name, v in includes.items():
            if v in (1, True):
                cols.append(F.col(name).alias(name))
            else:
                cols.append(_ref(v).alias(name))
        return df.select(*cols)
    # exclusion projection. DataFrame.drop ignores nested fields, so a
    # dotted exclusion path would silently SURVIVE where Mongo removes
    # it — fail loudly instead of diverging.
    dotted = [k for k in excludes if "." in k]
    if dotted:
        raise ValueError(
            f"$project exclusion of nested paths is unsupported: {dotted} "
            "(use an inclusion projection or flatten first)")
    drop = excludes + ([] if keep_id else ["_id"])
    return df.drop(*[c for c in drop if c in df.columns])


def _group(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    gid = spec["_id"]
    aggs = []
    for name, agg in spec.items():
        if name == "_id":
            continue
        (op, arg), = agg.items()
        if op == "$sum" and arg == 1:
            aggs.append(F.count(F.lit(1)).alias(name))
        elif op == "$sum":
            aggs.append(F.sum(_ref(arg)).alias(name))
        elif op == "$avg":
            aggs.append(F.avg(_ref(arg)).alias(name))
        elif op == "$min":
            aggs.append(F.min(_ref(arg)).alias(name))
        elif op == "$max":
            aggs.append(F.max(_ref(arg)).alias(name))
        elif op == "$count":
            aggs.append(F.count(F.lit(1)).alias(name))
        else:
            raise ValueError(f"unsupported $group accumulator: {op}")
    if gid is None:
        return df.agg(*aggs).select(F.lit(None).alias("_id"), "*")
    return df.groupBy(_ref(gid).alias("_id")).agg(*aggs)


def apply_pipeline(df: DataFrame, stages: list[dict[str, Any]]) -> DataFrame:
    """Run a MongoDB aggregation pipeline against a DataFrame."""
    for stage in stages:
        (op, spec), = stage.items()
        if op == "$match":
            df = df.filter(_match_cond(spec))
        elif op == "$project":
            df = _project(df, spec)
        elif op == "$unwind":
            if isinstance(spec, str):
                path, preserve = spec[1:], False
            else:
                path = spec["path"][1:]
                preserve = bool(spec.get("preserveNullAndEmptyArrays", False))
            fn = F.explode_outer if preserve else F.explode
            if "." in path:
                # Mongo replaces the nested field IN PLACE. explode is a
                # generator (must sit in a top-level projection), so
                # explode into a temp column first, then graft the element
                # back into the struct with withField and drop the temp.
                top, rest = path.split(".", 1)
                tmp = "__unwound"
                df = (df.withColumn(tmp, fn(F.col(path)))
                      .withColumn(top,
                                  F.col(top).withField(rest, F.col(tmp)))
                      .drop(tmp))
            else:
                df = df.withColumn(path, fn(F.col(path)))
        elif op in ("$addFields", "$set"):
            for name, v in spec.items():
                df = df.withColumn(name, _ref(v))
        elif op == "$group":
            df = _group(df, spec)
        elif op == "$sort":
            df = df.orderBy(*[F.col(k).asc() if d == 1 else F.col(k).desc()
                              for k, d in spec.items()])
        elif op == "$limit":
            df = df.limit(int(spec))
        elif op == "$skip":
            df = df.offset(int(spec))
        elif op == "$count":
            df = df.agg(F.count(F.lit(1)).alias(str(spec)))
        else:
            raise ValueError(f"unsupported pipeline stage: {op}")
    return df
