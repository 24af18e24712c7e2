"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
REPRODUCIBLE: re-running the pipeline (or running it on a different
engine) must pick the same rows, and adding new rows must not reshuffle
the membership of old ones. RNG-based sampling (``df.sample``) gives
none of that — its outcome depends on seed AND partitioning. Hash-based
sampling gives all of it: a row's fate is a pure function of its key.

The uniform variate is md5-derived (functions/text.py convention), so a
DuckDB oracle reproduces every membership decision bit-for-bit — these
ops get full value-hash gates, not rows-only checks.

Scale notes: both ops are stateless row-local projections/filters — no
shuffle, no state, fully codegen'd; the md5 is one pass per row. A 100 TB
scan samples at scan speed, and the filter sits directly above the scan
(Catalyst pushes the projection pruning into it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import text as T

#: Denominator of the 28-bit md5 variate: u = hash28(key) / 2^28 ∈ [0, 1).
_U_DENOM = float(1 << 28)


def hash_uniform(col, salt: str = "") -> Column:
    """Uniform [0,1) variate as a pure function of a key column. ``salt``
    decouples independent sampling decisions made from the same key (two
    unsalted samples of the same table select nested subsets — sometimes
    wanted, e.g. growing a sample; salt when independence is needed)."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(F.lit(salt), c.cast("string")) if salt else c.cast("string")
    return T.hash28(keyed) / F.lit(_U_DENOM)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "") -> DataFrame:
    """Keep a row iff its key's hash-variate falls below ``fraction``.
    Membership is stable under re-runs, engine changes, partitioning
    changes, and appends (old rows never change fate)."""
    return df.filter(hash_uniform(key_col, salt) < F.lit(fraction))


def train_val_test_split(df: DataFrame, key_col: str,
                         weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
                         salt: str = "") -> DataFrame:
    """Assign each row a ``split`` label ('train'/'val'/'test') by hash
    range — disjoint, exhaustive, append-stable. The cut points are
    cumulative weights over the [0,1) variate."""
    w_train, w_val, _ = weights
    u = hash_uniform(key_col, salt)
    split = (F.when(u < F.lit(w_train), F.lit("train"))
             .when(u < F.lit(w_train + w_val), F.lit("val"))
             .otherwise(F.lit("test")))
    return df.withColumn("split", split)
