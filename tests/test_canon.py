"""Cross-engine numeric canon: every cast/round idiom the gated plans rely
on must produce BIT-IDENTICAL doubles on Spark and DuckDB when fed
full-precision doubles — not just the 2-dp money values the current
fixtures happen to contain. Fixtures are regenerated every round, so a
plan idiom that is only stable for 2-dp inputs is a latent hash flake.

Idioms under test (the same pairs of Spark expression + oracle SQL the
plans use):
  1. exact decimal(18,4) sum  -> cast double            (q37/q40/q44/q46/q67)
  2. product -> decimal(18,6) sum -> round 4 -> double  (q01/q04)
  3. decimal sum -> double -> / count -> round 6 (avg)  (q01/q38/q72/q78/q80)
  4. per-row round(ln,9) -> decimal(18,9) sum -> avg    (q78)
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def _rows(n: int = 2500) -> list[tuple[int, float, float]]:
    """(group, v, w) with v full-precision across several magnitude bands
    and w a full-precision rate in [0, 0.2] (the l_discount shape)."""
    rng = random.Random(20260814)
    out = []
    for i in range(n):
        band = i % 4
        if band == 0:
            v = rng.uniform(0.0, 1.0)
        elif band == 1:
            v = rng.uniform(0.0, 1_000.0)
        elif band == 2:
            v = rng.uniform(900_000.0, 1_100_000.0)
        else:
            v = round(rng.uniform(0.0, 1_000.0), 2)  # today's fixture shape
        out.append((i % 7, v, rng.uniform(0.0, 0.2)))
    # adversarial: doubles whose SHORTEST repr sits exactly on a 4-dp half
    # boundary (their binary value is a hair off it). Probed: both engines
    # round these identically (123.45675 -> 123.4568 on both), i.e. DuckDB's
    # double->decimal cast agrees with Spark's shortest-repr HALF_UP — the
    # one place the idioms could have disagreed by construction.
    for j, v in enumerate([0.00005, 0.00015, 1.00005, 123.45675, 7.00025]):
        out.append((j % 7, v, 0.05))
    return out


def test_decimal_round_idioms_bit_identical_across_engines(spark):
    rows = _rows()
    sdf = spark.createDataFrame(rows, ["g", "v", "w"])
    spark_out = (
        sdf.groupBy("g").agg(
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double")
            .alias("sum4"),
            F.round(F.sum((F.col("v") * (1 - F.col("w")))
                          .cast("decimal(18,6)")), 4).cast("double")
            .alias("prod_sum"),
            F.round(F.sum(F.col("v").cast("decimal(18,4)")).cast("double")
                    / F.count(F.lit(1)), 6).alias("avg6"),
            F.round(F.sum(F.round(F.log(F.col("v") + 1.0), 9)
                          .cast("decimal(18,9)")).cast("double")
                    / F.count(F.lit(1)), 6).alias("mean_log"),
        ).collect()
    )

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v", "w"]))
    duck_out = con.execute("""
        SELECT g,
               CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sum4,
               CAST(round(sum(CAST(v * (1 - w) AS DECIMAL(18,6))), 4) AS DOUBLE) AS prod_sum,
               round(CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg6,
               round(CAST(sum(CAST(round(ln(v + 1.0), 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS mean_log
        FROM t GROUP BY g
    """).fetchall()

    s = {r.g: (r.sum4, r.prod_sum, r.avg6, r.mean_log) for r in spark_out}
    d = {r[0]: tuple(r[1:]) for r in duck_out}
    assert set(s) == set(d)
    for g in s:
        for i, (sv, dv) in enumerate(zip(s[g], d[g])):
            # bit-identical, not "close": the driver hash-compares strings
            assert sv == dv and repr(sv) == repr(dv), \
                f"group {g} idiom {i}: spark={sv!r} duck={dv!r}"


def test_double_sum_would_not_be_stable(spark):
    """Control for the test above: document WHY the decimal idioms exist.
    A plain double sum of the same full-precision values differs between
    an ordered (DuckDB, 1 thread) and a partial-agg (Spark, parallel)
    summation for at least one group — i.e. round(sum(double), k) is only
    stable by luck. If this ever starts passing for every group/seed it
    does NOT invalidate the idioms; it just means this seed got lucky."""
    rows = _rows()
    sdf = spark.createDataFrame(rows, ["g", "v", "w"]).repartition(8)
    spark_sums = {r.g: r.s for r in
                  sdf.groupBy("g").agg(F.sum("v").alias("s")).collect()}
    seq_sums: dict[int, float] = {}
    for g, v, _ in rows:
        seq_sums[g] = seq_sums.get(g, 0.0) + v
    diffs = [g for g in seq_sums if spark_sums[g] != seq_sums[g]]
    # tolerate a lucky seed, but record the observation: exact equality
    # of float sums across summation orders is coincidence, not contract
    if not diffs:
        import warnings
        warnings.warn("double sums happened to agree for this seed; "
                      "the decimal idioms remain the only guarantee")


def test_no_oracle_outputs_exotic_duckdb_types(sf_dir):
    """DESCRIBE every registered oracle on DuckDB and assert no output
    column type falls outside the proven-green set. Driver-red class,
    proven twice: round 3's only hash failures were the DecimalType
    outputs, round 4's single red (q67) was the registry's single HUGEINT
    output (``sum(integer) OVER (...)`` types as HUGEINT in DuckDB) — the
    driver's fetch/canon path renders both differently from Spark even
    when every cell agrees. Any aggregate that would produce
    HUGEINT/DECIMAL must be cast (BIGINT/DOUBLE) in the oracle SQL."""
    import duckdb

    import __spark_entry__ as entrymod

    GREEN = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
             "TIMESTAMP", "DATE"}
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            base = typ.split("(")[0].strip().upper()
            if base not in GREEN:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, f"exotic oracle output types: {offenders}"


def test_local_replica_rejects_list_cells():
    """The local oracle replica (tools/check_oracle.py) must FAIL FAST on
    list/map cells instead of str()-ing them. Driver-red class, proven in
    round 11: norm_cell's str() fallback canonicalized q180's array cells
    happily, so "tri-scale parity" was true locally and false at the
    driver, whose pandas canon raises "unhashable type: 'list'". The
    replica exists to PREDICT the driver; it must diverge loudly, never
    silently."""
    import importlib.util
    from pathlib import Path

    import pytest

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # scalars still normalize
    assert mod.norm_cell(1.5) == "1.5"
    assert mod.norm_cell(-0.0) == "0"
    assert mod.norm_cell("x") == "x"
    # containers fail fast — the driver cannot hash them
    for bad in ([1, 2], {"a": 1}, (1,), {1}):
        with pytest.raises(TypeError, match="to_json"):
            mod.norm_cell(bad)
