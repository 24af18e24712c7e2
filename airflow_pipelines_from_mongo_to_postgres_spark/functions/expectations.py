"""Declarative data-quality expectations, compiled into ONE scan.

The reference validates loads implicitly (a bad row raises mid-loop and
poisons the whole pipeline run); here the checks are DATA: a list of
declarative expectations compiles into a single aggregate pass over the
table — at 100 TB the audit costs one map-side scan regardless of how
many checks it carries, plus one anti-join per FK edge (the only check
that genuinely needs a second input) — broadcast when the dimension's
planning-time size estimate fits ``broadcast_threshold``, shuffled
otherwise (a 10^9-key dimension must not be forced through the driver).

Check kinds:
- ``not_null(col)`` — violation when the column IS NULL.
- ``in_range(col, lo, hi)`` — violation when outside [lo, hi]; NULLs do
  NOT violate (pair with not_null — two findings beat one ambiguous).
- ``in_set(col, values)`` — violation when not a member; NULLs pass.
- ``matches(col, regex)`` — violation when non-NULL and not rlike.
- ``unique(cols)`` — duplicate-key rows: count(*) − count(DISTINCT
  struct(cols)). The struct keeps NULL keys countable (a bare
  count-distinct over multiple columns would silently drop them).
- ``custom(name, column)`` — violation when the boolean Column is false.
- ``fk(cols, dim, dim_cols)`` — orphan fact rows, broadcast anti-join.

``run_expectations`` returns one row per check: ``(check, violations,
rows_checked, passed)`` — zero-violation checks INCLUDED, so a skipped
check is distinguishable from a clean one (q139's never-vacuous rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str                      # rowlevel | unique | fk
    violated: Optional[Column] = None      # rowlevel: true when the row violates
    cols: tuple = ()                       # unique/fk key columns
    dim: Optional[DataFrame] = None        # fk dimension
    dim_cols: tuple = ()                   # fk dimension key columns


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "rowlevel", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(f"in_range({col},{lo},{hi})", "rowlevel",
                 c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def in_set(col: str, values: Sequence) -> Check:
    c = F.col(col)
    return Check(f"in_set({col})", "rowlevel",
                 c.isNotNull() & ~c.isin(list(values)))


def matches(col: str, regex: str) -> Check:
    c = F.col(col)
    return Check(f"matches({col})", "rowlevel",
                 c.isNotNull() & ~c.rlike(regex))


def unique(cols: Sequence[str]) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", cols=tuple(cols))


def custom(name: str, ok: Column) -> Check:
    return Check(f"custom({name})", "rowlevel", ~F.coalesce(ok, F.lit(False)))


def fk(cols: Sequence[str], dim: DataFrame, dim_cols: Sequence[str],
       name: str = "") -> Check:
    label = name or f"fk({','.join(cols)})"
    return Check(label, "fk", cols=tuple(cols), dim=dim,
                 dim_cols=tuple(dim_cols))


def _hint_small_dim(dim: DataFrame, threshold: int) -> DataFrame:
    """Broadcast-hint the FK dimension only when Catalyst's planning-time
    size estimate fits under ``threshold`` bytes. An unconditional
    ``F.broadcast`` OOMs the driver on a large dimension (10^9 user keys);
    above the gate we leave the join unhinted so Catalyst picks a shuffled
    anti-join (SMJ) — and AQE may still upgrade it to broadcast at runtime
    from OBSERVED sizes, which is exactly the safe version of the hint."""
    try:
        size = int(str(dim._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes()))
    except Exception:       # stats unavailable -> assume large, stay safe
        return dim
    return F.broadcast(dim) if 0 <= size <= threshold else dim


def run_expectations(df: DataFrame, checks: Sequence[Check],
                     broadcast_threshold: int = 32 << 20) -> DataFrame:
    """Compile the battery: every rowlevel + unique check folds into ONE
    ``df.agg(...)`` (a single map-side scan, one 1-row result), then
    unpivots to the long report; each fk check adds one anti-join over
    just its key column — broadcast when the dimension's planning-time
    size estimate is at most ``broadcast_threshold`` bytes (default
    32 MB), shuffled otherwise. Output ordered by check name so the
    report is deterministic."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    names: list[str] = []
    for i, ch in enumerate(checks):
        if ch.kind == "rowlevel":
            aggs.append(F.sum(F.when(ch.violated, 1).otherwise(0))
                        .cast("long").alias(f"__c{i}"))
            names.append(ch.name)
        elif ch.kind == "unique":
            key = F.struct(*[F.col(c) for c in ch.cols])
            aggs.append((F.count(F.lit(1)) - F.countDistinct(key))
                        .cast("long").alias(f"__c{i}"))
            names.append(ch.name)

    wide = df.agg(*aggs)
    pairs = []
    for i, ch in enumerate(checks):
        if ch.kind in ("rowlevel", "unique"):
            pairs.append(F.struct(F.lit(ch.name).alias("check"),
                                  F.col(f"__c{i}").alias("violations"),
                                  F.col("__rows").alias("rows_checked")))
    report = wide.select(F.explode(F.array(*pairs)).alias("r")) \
                 .select("r.*") if pairs else None

    spark = df.sparkSession
    for ch in checks:
        if ch.kind != "fk":
            continue
        fact = df.select(*ch.cols)
        dim = ch.dim.select(*ch.dim_cols)
        cond = None
        for a, b in zip(ch.cols, ch.dim_cols):
            c = fact[a].eqNullSafe(dim[b])
            cond = c if cond is None else cond & c
        orphans = fact.join(_hint_small_dim(dim, broadcast_threshold),
                            cond, "left_anti")
        row = fact.agg(F.count(F.lit(1)).alias("rows_checked")) \
            .crossJoin(F.broadcast(
                orphans.agg(F.count(F.lit(1)).alias("violations")))) \
            .select(F.lit(ch.name).alias("check"), "violations",
                    "rows_checked")
        report = row if report is None else report.unionByName(row)

    if report is None:
        schema = "check string, violations long, rows_checked long"
        report = spark.createDataFrame([], schema)
    return report.withColumn("passed", F.col("violations") == 0) \
                 .orderBy("check")
