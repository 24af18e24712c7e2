"""Temporal custom operators Spark lacks as built-ins: as-of join and
range (interval) join. Both are compositions of existing DataFrame ops —
no UDFs, no driver-side loops (SURVEY.md §7 design rule).

Scale design
------------
* ``asof_join`` uses the union + last(ignoreNulls) window technique: tag
  both inputs, union them, and run ONE window over (keys, ts). Cost is a
  single shuffle on the key columns — strictly cheaper than the naive
  join + filter + row_number plan (two shuffles and an |left|×|right|
  per-key blow-up before ranking). Skewed keys degrade to a per-key sort,
  not a cross product.
* ``range_join`` is an equi-join on the key columns with the range
  predicate applied as a join condition; Spark plans a hash join on the
  equi part and filters within matched buckets. For keyless interval
  joins, bucketize the time axis first (not needed by current plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              left_ts: str, right_ts: str, right_cols: list[str],
              strict: bool = False, direction: str = "backward",
              tolerance: str | None = None) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    key group: the greatest ``right_ts`` <= ``left_ts`` for
    ``direction="backward"`` (the default), the smallest
    ``right_ts`` >= ``left_ts`` for ``"forward"`` (< / > if ``strict``).
    Unmatched left rows keep nulls.

    ``tolerance`` (an SQL interval literal body, e.g. ``"10 minutes"``)
    nulls out matches farther than the tolerance from ``left_ts`` —
    applied AFTER the window fill, so it costs a per-row comparison, not
    a different plan. Direction only flips the window's sort order: the
    single-shuffle union + last(ignoreNulls) plan is identical both
    ways.

    ``right_cols`` are the right-side payload columns to carry; the matched
    timestamp itself is exposed as ``asof_ts``.
    """
    assert direction in ("backward", "forward"), direction
    payload = [c for c in right_cols if c != right_ts]
    # Tag sides, align schemas: left keeps its columns, right contributes
    # payload columns nulled on the left side and vice versa.
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__r_ts"),
    )
    rt = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(right_ts).alias("__r_ts"),
    ).select(*lt.columns)  # column order alignment for union
    # At equal ts: right rows sort before left for <=/>= semantics (a right
    # row at exactly left_ts is visible), after left for strict </>.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    ts_order = F.col("__ts").asc() if direction == "backward" \
        else F.col("__ts").desc()
    w = (Window.partitionBy(*keys).orderBy(ts_order, side_order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = lt.unionByName(rt).select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
          for c in payload],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__f_ts"),
    )
    if tolerance is None:
        ok = F.lit(True)
    else:
        tol = F.expr(f"INTERVAL {tolerance}")
        ok = (F.col("__f_ts") >= F.col("__ts") - tol) \
            if direction == "backward" \
            else (F.col("__f_ts") <= F.col("__ts") + tol)
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.when(ok, F.col(f"__f_{c}")).alias(c) for c in payload],
            F.when(ok, F.col("__f_ts")).alias("asof_ts"),
        )
    )


def range_join(left: DataFrame, right: DataFrame, keys: list[str],
               left_start: str, left_end: str, right_ts: str,
               how: str = "inner") -> DataFrame:
    """Join rows whose right-side timestamp falls in a left-derived interval:
    equi on ``keys`` + ``left_start < right_ts <= left_end`` band predicate
    (half-open on the left so a left row never matches itself at
    ``right_ts == left_start``).

    Right-side columns come back prefixed ``r_`` — this both avoids output
    collisions and sidesteps Spark's ambiguous-attribute trap when left and
    right derive from the same source (self-join lineage).
    """
    r = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = (F.col(f"r_{right_ts}") > F.col(left_start)) \
        & (F.col(f"r_{right_ts}") <= F.col(left_end))
    for k in keys:
        cond = (F.col(k) == F.col(f"r_{k}")) & cond
    return left.join(r, cond, how)


def _interval_micros(bucket: str):
    """Width of an SQL interval literal body in microseconds, as a
    foldable Column. Anchored at an explicitly-UTC epoch literal
    (``TIMESTAMP '...Z'``) so the session timezone cannot leak into the
    value — a bare epoch string cast to timestamp is interpreted in
    session time, making the width ``tz_offset + bucket`` off-UTC."""
    return F.unix_micros(
        F.expr(f"TIMESTAMP '1970-01-01 00:00:00Z' + INTERVAL {bucket}"))


def range_join_bucketed(left: DataFrame, right: DataFrame,
                        left_start: str, left_end: str, right_ts: str,
                        bucket: str = "5 minutes",
                        keys: list[str] | None = None,
                        salt: int = 1) -> DataFrame:
    """KEYLESS (or weak-keyed) interval join without the nested loop.

    ``range_join`` relies on its equi keys to get a hash join; with no
    keys (or a key like a single-tenant id) Catalyst's only plan for a
    pure band predicate is BroadcastNestedLoop — O(|L|·|R|) at 100 TB.
    The banding trick restores an equi join: bucketize time into
    ``bucket``-sized cells, explode each left interval over the cells it
    overlaps (bounded: ⌈interval/bucket⌉+1 rows — pick ``bucket`` ≈ the
    max interval width so the fan-out is ~2×), equi-join on the cell id
    (plus any ``keys``), then apply the exact band filter. Each right
    row lives in exactly one cell, so a qualifying (L, R) pair meets
    exactly once — no dedup pass needed. Inner-join semantics. Gates:
    tests/test_plans.py::test_range_join_bucketed_plan_is_hash_join
    asserts the physical plan is a shuffled hash/sort-merge join with
    no BroadcastNestedLoop; q119_error_burst_windows runs it against a
    DuckDB oracle.

    The cell width comes from the interval literal anchored at an
    explicitly-UTC epoch (``TIMESTAMP '...Z'``), so an off-UTC session
    timezone cannot silently inflate the bucket size (and with it the
    explode fan-out).

    ``salt > 1`` spreads each HOT CELL across ``salt`` tasks: the right
    side hash-salts into sub-cells, the left explodes over all of them
    (×salt left fan-out — left is the small interval side). Pair WORK
    is unchanged (every qualifying pair still meets once, in exactly
    one sub-cell); what changes is that one wall-clock-dominating cell
    becomes ``salt`` parallel partitions — the keyless-join analogue of
    operators/skew.salted_join."""
    keys = keys or []
    w = _interval_micros(bucket)
    r = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    r = r.withColumn(
        "__rcell",
        F.floor(F.unix_micros(F.col(f"r_{right_ts}").cast("timestamp")) / w))
    lo = F.floor(F.unix_micros(F.col(left_start).cast("timestamp")) / w)
    hi = F.floor(F.unix_micros(F.col(left_end).cast("timestamp")) / w)
    l_ = left.withColumn("__cell", F.explode(F.sequence(lo, hi)))
    cond = F.col("__cell") == F.col("__rcell")
    if salt > 1:
        r = r.withColumn("__rsalt",
                         F.pmod(F.hash(F.col(f"r_{right_ts}")), F.lit(salt)))
        l_ = l_.withColumn("__salt",
                           F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        cond = cond & (F.col("__salt") == F.col("__rsalt"))
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"r_{k}"))
    return (
        l_.join(r, cond, "inner")
        .filter((F.col(f"r_{right_ts}") > F.col(left_start))
                & (F.col(f"r_{right_ts}") <= F.col(left_end)))
        .drop("__cell", "__rcell",
              *(["__salt", "__rsalt"] if salt > 1 else []))
    )
