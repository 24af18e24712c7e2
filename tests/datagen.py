"""Deterministic schema-driven nested-document generator (FIXTURES.md).

Generates rows for any entity StructType with the fixture conventions:
24-hex ``_id``; every non-``_id`` field randomly absent (None) in some rows
to exercise default policies; arrays include empty and multi-element cases;
day-2 delta batches mutate mutable columns for ~half the ids and add new
ids (FIXTURES.md "Cross-cutting fixture requirements").
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, StringType, StructType,
    TimestampType,
)

_WORDS = ["alpha", "beta", "gamma", "delta", "omega", "kappa", "sigma", "zeta"]


def _hexid(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(24))


def _value(rng: random.Random, dt, depth: int = 0):
    if isinstance(dt, StructType):
        return {f.name: _value(rng, f.dataType, depth + 1)
                if rng.random() > 0.2 else None for f in dt.fields}
    if isinstance(dt, ArrayType):
        n = rng.choice([0, 1, 1, 2, 3])
        return [_value(rng, dt.elementType, depth + 1) for _ in range(n)]
    if isinstance(dt, BooleanType):
        return rng.random() > 0.5
    if isinstance(dt, DoubleType):
        return round(rng.uniform(1, 1000), 2)
    if isinstance(dt, IntegerType):
        return rng.randint(1, 60)
    if isinstance(dt, TimestampType):
        return datetime(2023, 1, 1) + timedelta(seconds=rng.randint(0, 3_000_000))
    if isinstance(dt, StringType):
        return rng.choice(_WORDS) + str(rng.randint(0, 99))
    raise NotImplementedError(str(dt))


def gen_rows(schema: StructType, n: int, seed: int = 42,
             absent_rate: float = 0.25) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        row = {}
        for f in schema.fields:
            if f.name == "_id":
                row["_id"] = _hexid(rng)
            elif rng.random() < absent_rate:
                row[f.name] = None  # missing field → default policy path
            else:
                row[f.name] = _value(rng, f.dataType)
        rows.append(row)
    return rows


def day2_delta(schema: StructType, day1: list[dict], mutable: tuple[str, ...],
               n_new: int, seed: int = 43) -> list[dict]:
    """~50% existing ids with mutated fields + n_new brand-new ids."""
    rng = random.Random(seed)
    out = []
    for row in day1[: len(day1) // 2]:
        mut = dict(row)
        for f in schema.fields:
            if f.name != "_id" and rng.random() > 0.5:
                mut[f.name] = _value(rng, f.dataType)
        out.append(mut)
    out.extend(gen_rows(schema, n_new, seed=seed + 1))
    return out
