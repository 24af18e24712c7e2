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
    per-pair cost from 3 array passes (dot + two norms) into 1."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.transform(a, lambda x: x / n)


def cosine(a, b) -> Column:
    """Cosine similarity; null-safe only in the Spark sense (null arrays
    propagate null, matching SQL oracles)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (norm(a) * norm(b))
