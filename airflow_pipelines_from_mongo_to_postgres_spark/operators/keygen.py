"""Surrogate-key assignment (SURVEY.md §2.5, J1+J2).

Reference semantics (ref dags/includes/utils.py:5-39): for an incoming batch,
look up each natural key ``_id`` in the target table (one SELECT per row —
the N+1 antipattern, utils.py:27-37); keys found keep their surrogate id;
misses get ``max_id + i`` with ``i`` assigned in ``_id``-sorted scan order
(sort at user_table.py:143, counter at utils.py:26,36-37).

Spark-first: ONE left join replaces the N+1 lookups, ONE max() aggregation
replaces the top-1 query (ref utils.py:13-20), and a row_number window over
the misses reproduces the deterministic ordered assignment.

Scale note: ``row_number`` over a global ordering is a single-partition
bottleneck — acceptable because only the *misses* (the new-key slice of one
incremental batch) pass through it, not the 100 TB target table. For
bulk backfills where dense ordered ids are not required, use
``monotonically_increasing_id`` or ``zipWithIndex`` semantics instead
(``dense=False``), which stay fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_surrogate_keys(existing: DataFrame, incoming: DataFrame,
                          natural_key: str = "_id", surrogate: str = "id",
                          dense: bool = True) -> DataFrame:
    """Return ``incoming`` with a ``surrogate`` column: matched rows keep the
    existing id; new rows get max(existing id) + row_number() in
    ``natural_key`` order (J2 determinism, ref utils.py:22-39).

    ``existing`` needs columns (surrogate, natural_key). ``dense=False``
    swaps the ordered window for a parallel non-dense id (scale path).
    """
    lookup = existing.select(F.col(natural_key), F.col(surrogate).alias("__existing_id"))
    joined = incoming.join(lookup, on=natural_key, how="left")  # J1: one join, not N+1
    max_id = existing.select(F.coalesce(F.max(surrogate), F.lit(0)).alias("m"))
    joined = joined.join(F.broadcast(max_id))  # attach scalar max, broadcast 1-row side
    if dense:
        w = Window.partitionBy(F.col("__existing_id").isNull()).orderBy(natural_key)
        new_id = F.col("m") + F.row_number().over(w)
    else:
        new_id = F.col("m") + F.monotonically_increasing_id() + 1
    out = joined.withColumn(surrogate, F.coalesce(F.col("__existing_id"),
                                                  new_id.cast("long")))
    return out.drop("__existing_id", "m")
