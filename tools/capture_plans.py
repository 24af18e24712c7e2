"""Capture .explain("formatted") for gated queries into plan files.

Usage:
    python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each named query (default: the
bench HEADLINE set) at $SPARK_GRAFT_SF_DIR (default sf0.1). Explain-only —
nothing is executed, so this is safe to run alongside other work.

Also prints a one-line plan-shape summary per query (Exchange count, join
strategies, Python eval nodes) so a plan regression is visible in the
terminal without opening the files.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def plan_summary(txt: str) -> str:
    n_exch = len(re.findall(r"\bExchange\b", txt))
    n_reused = len(re.findall(r"\bReusedExchange\b", txt))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b", txt)
    pyeval = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandas)\b", txt)
    n_win = len(re.findall(r"\bWindow\b", txt))
    n_agg = len(re.findall(r"\bHashAggregate\b", txt))
    from collections import Counter
    jc = Counter(joins)
    pc = Counter(pyeval)
    return (f"exch={n_exch}(reused={n_reused}) agg={n_agg} win={n_win} "
            f"joins={dict(jc)} py={dict(pc) or '{}'}")


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from airflow_pipelines_from_mongo_to_postgres_spark.plans import all_queries
    from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark

    spark = get_spark("plan-capture",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    if not names:
        import bench
        names = bench.HEADLINE
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # capture must never abort the batch
            txt = f"EXPLAIN FAILED: {e}"
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(txt)
        print(f"{name}: {plan_summary(txt)}  -> {path}")


if __name__ == "__main__":
    main()
