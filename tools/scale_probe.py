#!/usr/bin/env python
"""Scaling-curve probe: run headline queries at every available scale
factor and report wall time per SF plus the step-up ratio — measured
evidence for the design-for-scale claim (a plan whose runtime grows
≲ linearly in data across 100× of SF has no hidden n² or driver-side
bottleneck at these shapes; one that blows up names its scale bug).

Usage: python tools/scale_probe.py [q01_pricing_summary q58_... ]
Prints one JSON line per query:
  {"query": ..., "sf": {"0.001": s, "0.01": s, "0.1": s},
   "rows": {...}, "ratio_10x": t(0.1)/t(0.01)}

Interpretation note baked into the output: fixture row counts grow ~10×
per SF step, so ratio_10x ≈ 10 is linear scaling, ≪ 10 means fixed
overhead still dominates at these sizes, and ≫ 10 flags superlinear
work (the thing to chase before a 1000-executor run).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT = [
    "q01_pricing_summary", "q26_ngram_jaccard_pairs", "q58_corpus_build",
    "q108_semantic_dedup", "q119_error_burst_windows",
    "q134_corpus_build_semantic",
]


def main() -> None:
    from airflow_pipelines_from_mongo_to_postgres_spark.plans import all_queries
    from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    root = Path(os.environ.get("SPARK_GRAFT_SF_ROOT", "/root/testdata"))
    sf_dirs = sorted(root.glob("sf*"),
                     key=lambda p: float(p.name[2:]))
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    from airflow_pipelines_from_mongo_to_postgres_spark.plans import llmdata

    def clear():
        llmdata.clear_caches()
        spark.catalog.clearCache()

    for name in names:
        fn = qs[name]
        for d in sf_dirs:          # warm-up pass: JIT/compile amortized
            fn(spark, str(d)).count()
        clear()
        secs, rows = {}, {}
        for d in sf_dirs:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn(spark, str(d)).count()
                runs.append(time.perf_counter() - t0)
                clear()
            secs[d.name[2:]] = round(min(runs), 3)
            rows[d.name[2:]] = n
        ks = sorted(secs, key=float)
        ratio = round(secs[ks[-1]] / secs[ks[-2]], 2) \
            if len(ks) >= 2 and secs[ks[-2]] > 0 else None
        print(json.dumps({"query": name, "sf": secs, "rows": rows,
                          "ratio_10x": ratio}))


if __name__ == "__main__":
    main()
