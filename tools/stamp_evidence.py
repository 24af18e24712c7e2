"""Stamp the current registry fingerprints into EVIDENCE_FPS.json.

Run this against the COMMIT THE DRIVER EVALUATED (i.e. at round start,
before editing any plan): each stamp records the (plan source, oracle SQL)
fingerprint that the round's CORRECTNESS_r{N}.json evidence actually
covers. plans/__init__.py derives the sweep pin-list as "fingerprint !=
stamp" — so any later edit to a plan or oracle automatically re-pins that
query for re-sampling, with no hand-maintained list to forget (the round-4
q59 incident).

Usage: python tools/stamp_evidence.py [--check]
  --check: exit 1 if the committed stamps differ from the live registry
           (i.e. there are unsampled changes), printing the changed names.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


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
    out.write_text(json.dumps(dict(sorted(fps.items())), indent=1) + "\n")
    print(f"stamped {len(fps)} fingerprints -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
