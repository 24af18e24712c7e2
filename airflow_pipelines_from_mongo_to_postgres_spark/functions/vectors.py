"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (``zip_with`` / ``aggregate``), evaluated
JVM-side. No UDFs: at 100 TB the dot products run inside codegen.

All math is done in double precision (inputs cast up from float32) so an
independent double-precision oracle agrees to ~1e-15 relative error.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def unit(a) -> Column:
    """L2-normalized copy: ``cosine(a, b) == dot(unit(a), unit(b))``.
    Normalizing each side ONCE per row before a pairwise join turns the
    per-pair cost from 3 array passes (dot + two norms) into 1.

    The norm is evaluated once per ROW too: higher-order functions are
    interpreted with no CSE across element evaluations, so embedding the
    norm aggregate inside the divide lambda would recompute it for every
    element — O(dim²). ``array_repeat`` materializes the scalar once and
    ``zip_with`` divides elementwise, keeping the whole thing O(dim) in a
    single Column expression (call sites stay one projection)."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.zip_with(a, F.array_repeat(n, F.size(a)), lambda x, m: x / m)


def cosine(a, b) -> Column:
    """Cosine similarity; null-safe only in the Spark sense (null arrays
    propagate null, matching SQL oracles)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (norm(a) * norm(b))
