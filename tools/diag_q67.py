"""Full-precision q67 diagnosis: compare Spark vs DuckDB outputs with exact
repr (no 12-sig-digit canon) to find what the driver's stricter hash sees."""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark
from airflow_pipelines_from_mongo_to_postgres_spark.plans.analytics import (
    q67_sessionize, Q67_SQL)

spark = get_spark("diag-q67", cpus=8)
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")

sdf = q67_sessionize(spark, SF_DIR)
scols = sdf.columns
srows = [tuple(r) for r in sdf.collect()]
res = con.execute(Q67_SQL)
dcols = [d[0] for d in res.description]
drows = res.fetchall()

print("spark cols:", scols)
print("duck  cols:", dcols)
print("rows:", len(srows), len(drows))

def keyed(rows, cols):
    i_u, i_s = cols.index("user_id"), cols.index("session_seq")
    return {(r[i_u], r[i_s]): {c: v for c, v in zip(cols, r)} for r in rows}

sk, dk = keyed(srows, scols), keyed(drows, dcols)
print("key overlap:", len(set(sk) & set(dk)), "spark-only:", len(set(sk) - set(dk)))

ndiff = 0
for k in sorted(set(sk) & set(dk), key=str):
    a, b = sk[k], dk[k]
    for c in scols:
        va, vb = a[c], b[c]
        same = repr(va) == repr(vb)
        if isinstance(va, float) and isinstance(vb, float):
            same = va == vb and repr(va) == repr(vb)
        if not same:
            ndiff += 1
            if ndiff <= 20:
                print(f"DIFF key={k} col={c}: spark={va!r} ({type(va).__name__}) "
                      f"duck={vb!r} ({type(vb).__name__})")
print("total differing cells (exact repr):", ndiff)

# also show types of one row
if srows:
    print("spark row0 types:", [(c, type(v).__name__) for c, v in zip(scols, srows[0])])
    print("duck  row0 types:", [(c, type(v).__name__) for c, v in zip(dcols, drows[0])])
spark.stop()
