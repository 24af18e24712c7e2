"""Incremental aggregate maintenance: combine partial aggregates instead
of rescanning history (the materialized-view delta-merge pattern).

At 100 TB the standing aggregate is orders of magnitude smaller than its
source; merging a day's partial into it touches |aggregate| + |delta|
rows — never the lake. Correctness requires ASSOCIATIVE measures: counts
and DECIMAL sums qualify (double sums do not — float addition is not
associative, which is why the decimal-sum rule matters beyond hash
stability). q79 proves combine == full recomputation against the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def combine_partial_aggs(base: DataFrame, delta: DataFrame,
                         keys: Sequence[str],
                         count_cols: Sequence[str] = (),
                         sum_cols: Sequence[str] = ()) -> DataFrame:
    """Merge two partial aggregates over the same grouping keys: one
    full-outer join; counts and sums add (missing side contributes 0).
    Output schema matches the inputs, so the result feeds the next
    combine — associativity is what makes multi-batch maintenance
    order-insensitive (property-tested in tests/test_merge.py)."""
    b = base.select(*[F.col(k).alias(f"__bk_{k}") for k in keys],
                    *[F.col(c).alias(f"__b_{c}")
                      for c in [*count_cols, *sum_cols]])
    d = delta.select(*[F.col(k).alias(f"__dk_{k}") for k in keys],
                     *[F.col(c).alias(f"__d_{c}")
                       for c in [*count_cols, *sum_cols]])
    # eqNullSafe: a NULL grouping key must match itself, or the two sides'
    # partials for the null group stay as separate rows and the combine
    # silently diverges from a full recomputation.
    cond = None
    for k in keys:
        c = F.col(f"__bk_{k}").eqNullSafe(F.col(f"__dk_{k}"))
        cond = c if cond is None else cond & c
    joined = b.join(d, cond, "full_outer")
    out_cols = [F.coalesce(f"__bk_{k}", f"__dk_{k}").alias(k) for k in keys]
    for c in count_cols:
        out_cols.append((F.coalesce(f"__b_{c}", F.lit(0))
                         + F.coalesce(f"__d_{c}", F.lit(0))).alias(c))
    for c in sum_cols:
        zero = F.lit(0).cast(dict(base.dtypes)[c])
        out_cols.append((F.coalesce(F.col(f"__b_{c}"), zero)
                         + F.coalesce(F.col(f"__d_{c}"), zero))
                        .cast(dict(base.dtypes)[c]).alias(c))
    return joined.select(*out_cols)
