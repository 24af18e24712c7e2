"""Conform layer: the reference's flatten/default/rename surface as
composable Column expressions (SURVEY.md §2.2–§2.3, P1–P6 / F1–F2).

The reference flattens nested MongoDB documents row-at-a-time in Python dict
loops (ref dags/includes/user_table.py:58-87). Here each per-field policy is
a Catalyst expression, so the whole flatten is ONE ``df.select(...)`` that
stays inside whole-stage codegen — no UDFs, no Python in the hot path.

Sentinel default for missing dates reproduces the reference's
``datetime(1990,1,1)`` policy (ref user_table.py:83-84).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference missing-date sentinel (ref dags/includes/user_table.py:83-84).
SENTINEL_DATE = "1990-01-01 00:00:00"


def nested(path: str, default=None) -> Column:
    """P2: null-safe nested struct access with default.

    ``element.get("personalInformation", {}).get("firstName", None)``
    (ref user_table.py:64-67) becomes ``coalesce(col("a.b"), lit(default))``.
    Struct access in Spark is already null-safe on a missing/null parent.
    """
    c = F.col(path)
    return c if default is None else F.coalesce(c, F.lit(default))


def bool_default(path: str) -> Column:
    """P4 boolean policy: missing → False (ref user_table.py:74-80)."""
    return F.coalesce(F.col(path).cast("boolean"), F.lit(False))


def date_sentinel(path: str) -> Column:
    """P4 date policy: missing → 1990-01-01 (ref user_table.py:83-84)."""
    return F.coalesce(
        F.col(path).cast("timestamp"),
        F.lit(SENTINEL_DATE).cast("timestamp"),
    )


def first_element(array_path: str, field: str, default=None) -> Column:
    """P3: element-0 struct extraction, empty-list-safe.

    ``safe_list_get(element["products"], 0, {}).get("productId")``
    (ref trades_table.py:17-21,69-74). ``try_element_at(..., 1)`` is null on
    empty/missing arrays (ANSI-safe), so the guard branch collapses into
    coalesce.
    """
    c = F.try_element_at(F.col(array_path), F.lit(1)).getField(field)
    return c if default is None else F.coalesce(c, F.lit(default))


def stringify(path: str) -> Column:
    """P6: complex value kept as one string column.

    The reference uses Python ``str()`` reprs (ref user_table.py:71); the
    engine canonicalizes as JSON text so independent engines can agree on
    the bytes (SURVEY.md §7 risk 4). Nulls stay null.
    """
    return F.to_json(F.col(path), {"ignoreNullFields": "false"})


def explode_unwind(df: DataFrame, array_col: str) -> DataFrame:
    """F1: MongoDB ``$unwind`` ≡ ``explode`` — one row per element, rows with
    null/empty arrays dropped (matches $unwind default
    preserveNullAndEmptyArrays=false; ref loanapplication_table.py:33-35).
    """
    return df.withColumn(array_col, F.explode(F.col(array_col)))


def flatten(df: DataFrame, spec: dict[str, Column]) -> DataFrame:
    """F2: document → flat row. One declarative projection replaces the
    reference's per-row dict loop (ref user_table.py:58-87). ``spec`` maps
    output column name (P5 rename) → expression (P2/P3/P4/P6 policies).
    """
    return df.select(*[expr.alias(name) for name, expr in spec.items()])
