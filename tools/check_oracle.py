"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + sorted-by-name schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and representation jitter beyond ~12 significant digits
        return f"{v + 0.0:.12g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, dict, set, tuple)):
        # The DRIVER's pandas canon dies on list cells ("unhashable type:
        # 'list'", CORRECTNESS_r11 q180). str()-ing them here made the
        # local replica pass where the driver failed — fail fast instead
        # so the divergence is caught before commit. Final projections
        # must to_json array/map columns on both engines.
        raise TypeError(
            f"list/map cell {v!r}: the driver canon cannot hash this — "
            "to_json the column in the final projection on both engines")
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as entrymod
    from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    executed = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        executed += 1
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"pass {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            failed.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            failed.append(name)
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            print(f"FAIL {name}: schema spark={sorted(scols)} duckdb={sorted(dcols)}")
            failed.append(name)
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n"
                  f"  spark : {cs[bad]}\n  duckdb: {cd[bad]}")
            failed.append(name)
            continue
        print(f"pass {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{executed - len(failed)}/{executed} executed pass "
          f"({len(qs)} registered)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
