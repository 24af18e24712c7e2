"""Plan-shape audit over EVERY registered query: one summary line per
query (Exchange/scan/join/Python-eval counts, plan operator count) plus a
flag column for smells worth a human look. Explain-only — nothing runs.

Usage: python tools/audit_plans.py [sf_dir]   (default sf0.1)

Smell flags:
  PY        BatchEvalPython/ArrowEvalPython/MapInPandas in a batch plan
  CARTESIAN CartesianProduct (not BroadcastNestedLoop, which is deliberate
            for tiny literal tables)
  EXCH>=8   8+ distinct Exchange nodes (dedup'd by id) — wide plans
  BIGPLAN   250+ physical operators — driver planning cost
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from airflow_pipelines_from_mongo_to_postgres_spark.plans import all_queries
    from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark

    spark = get_spark("plan-audit",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:
            rows.append((name, f"EXPLAIN FAILED: {e}"))
            continue
        # the numbered detail section repeats every operator; count only
        # the tree section (before the first "(1) " detail block)
        tree = txt.split("\n\n(1)")[0]
        n_ops = len(re.findall(r"\(\d+\)", tree))
        counts = {
            "exch": len(re.findall(r"\bExchange\b", tree)),
            "scan": len(re.findall(r"Scan parquet", tree)),
            "smj": len(re.findall(r"SortMergeJoin", tree)),
            "bhj": len(re.findall(r"BroadcastHashJoin", tree)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", tree)),
            "cart": len(re.findall(r"CartesianProduct", tree)),
            "win": len(re.findall(r"\bWindow\b", tree)),
            "sortagg": len(re.findall(r"SortAggregate", tree)),
            "py": len(re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
                r"FlatMapGroupsInPandas", tree)),
        }
        flags = []
        if counts["py"]:
            flags.append("PY")
        if counts["cart"]:
            flags.append("CARTESIAN")
        if counts["exch"] >= 8:
            flags.append("EXCH>=8")
        if n_ops >= 250:
            flags.append("BIGPLAN")
        rows.append((name, f"ops={n_ops:4d} " + " ".join(
            f"{k}={v}" for k, v in counts.items() if v)
            + ("  <== " + ",".join(flags) if flags else "")))
    for name, line in rows:
        print(f"{name:42s} {line}")


if __name__ == "__main__":
    main()
