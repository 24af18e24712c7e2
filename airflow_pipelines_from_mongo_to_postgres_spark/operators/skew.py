"""Skew-mitigation join operators.

A shuffle equi-join places every row of one key in one task; a hot key
(one customer with 10^8 orders at 100 TB) turns that task into the
straggler that dominates the stage. AQE's skew-join splitting handles the
sort-merge case post-hoc; ``salted_join`` is the explicit a-priori version
that also covers shuffle-hash joins and keeps working when AQE statistics
miss the skew (e.g. under-sampled hot keys in a first-stage shuffle).

The reference has no analytic joins at all (SURVEY.md §2.5 — its only join
is a per-row key lookup, utils.py:27-37); this operator belongs to the
scale-out surface our engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` that scatters each join key over ``salts``
    buckets: the big side gets a deterministic per-row salt, the small side
    is replicated once per salt value. Output is row-identical to
    ``big.join(small, big_key == small_key, how)``; the hot key's rows now
    land in ``salts`` tasks instead of one.

    Cost model: small side shuffles ``salts``× its size — use for
    mid-size dimensions that are too big to broadcast but far smaller than
    the fact side. Supported ``how``: inner / left (semantics that don't
    need to observe "no match across ALL salts" per small-side row).

    The salt must be deterministic under task retry (a recomputed partition
    must re-produce identical rows), so it hashes the whole big-side row
    rather than using rand().
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    bs = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
        .cast("int"))
    ss = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    # shuffle_hash: salting exists precisely for the non-broadcast path —
    # without the hint Catalyst would just broadcast a small test dim and
    # the salted plan shape would never be exercised.
    cond = (bs[big_key] == ss[small_key]) & (bs[_SALT] == ss[_SALT])
    return bs.join(ss.hint("shuffle_hash"), cond, how) \
        .drop(bs[_SALT]).drop(ss[_SALT])
