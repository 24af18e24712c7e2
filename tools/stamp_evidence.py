"""Stamp registry fingerprints into EVIDENCE_FPS.json.

Run at ROUND START, against the commit the driver evaluated (before
editing any plan): a stamp records the (plan source, oracle SQL)
fingerprint that a driver CORRECTNESS row actually covers.
plans/__init__.py derives the sweep pin-list as "fingerprint != stamp" —
so any later edit to a plan or oracle automatically re-pins that query
for re-sampling, with no hand-maintained list to forget (the round-4 q59
incident).

MERGE semantics: a query's stamp only updates if it APPEARS in the
newest CORRECTNESS_r*.json (the driver ran this code against it); a
query the driver's wall-clock budget skipped keeps its old stamp, so it
stays pinned until a driver row actually lands. Stamps for queries no
longer in the registry are dropped.

Usage: python tools/stamp_evidence.py [--check | --force-all]
  --check:     exit 1 if stamps differ from the live registry (i.e.
               there are unsampled changes), printing the changed names.
  --force-all: stamp every query unconditionally (bootstrap only).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _latest_correctness_names() -> set:
    paths = sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json")))
    if not paths:
        return set()
    try:
        with open(paths[-1]) as fh:
            rows = json.load(fh)
        return set(rows) if isinstance(rows, dict) else set()
    except (OSError, json.JSONDecodeError):
        return set()


def main() -> int:
    from airflow_pipelines_from_mongo_to_postgres_spark.plans import (
        changed_since_stamped,
        current_fingerprints,
    )

    out = REPO / "EVIDENCE_FPS.json"
    if "--check" in sys.argv:
        changed = changed_since_stamped()
        if changed:
            print("changed since stamped:", " ".join(sorted(changed)))
            return 1
        print("all stamps current")
        return 0

    fps = current_fingerprints()
    old: dict = {}
    try:
        old = json.loads(out.read_text())
    except (OSError, json.JSONDecodeError):
        pass
    if "--force-all" in sys.argv:
        merged = fps
        updated = len(fps)
    else:
        sampled = _latest_correctness_names()
        merged = {n: (fps[n] if n in sampled else old.get(n, fps[n]))
                  for n in fps}
        # a query with no old stamp and no driver row stays UNSTAMPED
        # (= pinned) rather than being stamped sight-unseen
        merged = {n: v for n, v in merged.items()
                  if n in sampled or n in old}
        updated = sum(1 for n in merged
                      if n in sampled and old.get(n) != merged[n])
    out.write_text(json.dumps(dict(sorted(merged.items())), indent=1) + "\n")
    print(f"stamped {len(merged)} fingerprints ({updated} updated) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
