"""Mergeable sketch columns: the pre-aggregation path for NDV and
quantiles at lake scale.

The reference recomputes every aggregate from the raw rows on each run
(its pipelines re-read whole Mongo collections per day, ref
``dags/includes/user_table.py``); at 100 TB that rescan is the cost that
kills the schedule. DataSketches sketches are ASSOCIATIVE and MERGEABLE:
a per-partition (e.g. per-day) sketch table is thousands of rows of
~KB binary blobs, and any rollup — month, region, all-time — is a union
of sketches, never a rescan of the lake. This module extends
``operators/aggmaint.py``'s combine-partials pattern (counts/decimal
sums) to the two aggregates that are NOT naively combinable: distinct
counts (HLL / theta) and quantiles (KLL).

All functions are pure Column/DataFrame code over Spark 4's built-in
DataSketches-compatible functions (``hll_sketch_agg``, ``hll_union_agg``,
``theta_sketch_agg``, ``theta_union_agg``, ``kll_sketch_agg_double``,
``kll_sketch_merge_double``) — JVM-side, zero Python in the data path.
The binary sketch columns round-trip through parquet unchanged
(tests/test_sketches.py proves a persisted daily-partial rollup exactly
equals a weekly-partial rollup of the same data — the union state
depends on the coupon set, not the partial boundaries — and that
incremental append == full recompute).

Scale contract:
- partial tables: one shuffle on the partial keys; |output| = |groups|.
- rollups: one shuffle on the rollup keys over the PARTIAL table
  (thousands of rows), never the source.
- KLL has no union *aggregate* in Spark, so ``kll_rollup`` folds a
  ``collect_list`` of sketches per rollup group with ``F.reduce`` —
  bounded by partials-per-group × k doubles (a 365-day × k=200 fold is
  ~600 KB per group), not by source rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


# --- HLL: distinct counts, fixed-size sketches ------------------------------

def hll_partials(df: DataFrame, keys: Sequence[str], col: str,
                 lgk: int = 12, sketch_col: str = "ndv_sketch") -> DataFrame:
    """Per-group HLL sketch of ``col``: groupBy(keys) + ``hll_sketch_agg``.
    lgk=12 → 4 KiB sketches, ~1.6% standard error. The output is the
    PERSISTABLE partial — write it per ingest batch and never rescan."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias(sketch_col))


def hll_rollup(partials: DataFrame, keys: Sequence[str],
               sketch_col: str = "ndv_sketch",
               out_col: str = "ndv_est",
               keep_sketch: bool = False) -> DataFrame:
    """Union partial sketches up to a coarser key set and estimate.
    ``allowDifferentLgConfigK=True`` so partials written at different
    lgk epochs still merge (the union degrades to the smaller k)."""
    agg = partials.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col, F.lit(True)).alias("__u"))
    out = agg.withColumn(out_col, F.hll_sketch_estimate("__u"))
    return out if keep_sketch else out.drop("__u")


# --- theta: distinct counts with set operations -----------------------------

def theta_partials(df: DataFrame, keys: Sequence[str], col: str,
                   sketch_col: str = "theta_sketch") -> DataFrame:
    """Per-group theta sketch. Theta supports (via union aggregate) the
    same rollup as HLL but stays exact below its sampling threshold."""
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(col).alias(sketch_col))


def theta_rollup(partials: DataFrame, keys: Sequence[str],
                 sketch_col: str = "theta_sketch",
                 out_col: str = "ndv_est") -> DataFrame:
    agg = partials.groupBy(*keys).agg(
        F.expr(f"theta_union_agg({sketch_col})").alias("__u"))
    return agg.withColumn(out_col, F.theta_sketch_estimate("__u")) \
              .drop("__u")


def theta_set_estimates(left: DataFrame, right: DataFrame,
                        keys: Sequence[str],
                        sketch_col: str = "theta_sketch") -> DataFrame:
    """Per-key set algebra over two theta-sketch tables: estimates for
    |A∩B| and |A∖B| from the SKETCHES alone — the audience-overlap /
    churn query answered from precomputed per-segment sketches with no
    rescan of either side's raw data. Below the sketch's sampling
    threshold (2^12 retained hashes by default) theta is EXACT, so
    small-segment overlaps come back error-free; above it the estimate
    carries the documented bounded error. Input columns are suffixed
    ``_a``/``_b`` internally; output: keys + inter_est + a_not_b_est."""
    a = left.select(*keys, F.col(sketch_col).alias("__a"))
    b = right.select(*keys, F.col(sketch_col).alias("__b"))
    j = a.join(b, list(keys))
    return j.select(
        *keys,
        F.theta_sketch_estimate(
            F.expr("theta_intersection(__a, __b)")).alias("inter_est"),
        F.theta_sketch_estimate(
            F.expr("theta_difference(__a, __b)")).alias("a_not_b_est"),
    )


# --- KLL: quantiles ---------------------------------------------------------

def kll_partials(df: DataFrame, keys: Sequence[str], col: str,
                 k: int = 200, sketch_col: str = "q_sketch") -> DataFrame:
    """Per-group KLL quantile sketch over a DOUBLE column. k=200 →
    ~1.65% rank error at 99% confidence (the library default)."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(F.col(col).cast("double"),
                                F.lit(k)).alias(sketch_col))


def kll_merged(partials: DataFrame, keys: Sequence[str],
               sketch_col: str = "q_sketch",
               out_col: str = "q_sketch") -> DataFrame:
    """Merge KLL partials up to ``keys`` by folding the per-group sketch
    list with the two-arg ``kll_sketch_merge_double`` (Spark exposes no
    KLL union aggregate). Cost bound: partials-per-group sketches of
    ~8·k·log(n) bytes each collected into ONE array value per rollup
    group — for daily partials that is a ~365-element array, never
    source rows. The fold itself is a JVM higher-order function."""
    lst = partials.groupBy(*keys).agg(
        F.collect_list(sketch_col).alias("__sks"))
    merged = F.reduce(
        F.slice("__sks", 2, F.greatest(F.size("__sks") - 1, F.lit(0))),
        F.element_at("__sks", 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x))
    return lst.withColumn(out_col, merged).drop("__sks")


def kll_quantiles(df: DataFrame, probs: Sequence[float],
                  sketch_col: str = "q_sketch",
                  prefix: str = "p") -> DataFrame:
    """Extract quantile estimates from a merged KLL sketch column, one
    output column per probability (p50, p95, ...)."""
    cols: list[Column] = []
    for p in probs:
        name = f"{prefix}{int(round(p * 100)):02d}"
        cols.append(F.kll_sketch_get_quantile_double(
            sketch_col, F.lit(float(p))).alias(name))
    return df.select("*", *cols).drop(sketch_col)
