#!/bin/sh
# Full verification pipeline, one command — the superset of what the
# round driver gates (driver: sf0.01 oracle sample + bench + entry
# smoke). Run before calling a round done:
#
#   sh tools/run_all_checks.sh            # ~25 min on local[32]
#
# 1. unit/streaming/property tests   2. tri-scale oracle parity
# 3. headline bench                  4. BASELINE scaling-row gate (hard)
# 5. evidence-pin status (informational)
set -e
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle parity: sf0.001 / sf0.01 / sf0.1 =="
for sf in sf0.001 sf0.01 sf0.1; do
    python tools/check_oracle.py "/root/testdata/$sf" 2>&1 | tail -1
done

echo "== bench (sf0.1) =="
# settle: the suite/sweep phases leave a decaying loadavg tail that
# inflates the isolated medians (r15 close run benched at load1 7.15 —
# its own sweep's tail; a fixed 60s sleep was not enough). POLL until
# load1 < 1 (cap 5 min), and record the observed pre-bench load1 —
# bench.py stamps it again under load.start.
python - <<'EOF'
import os, time
t0 = time.time()
while time.time() - t0 < 300:
    l1 = os.getloadavg()[0]
    if l1 < 1.0:
        break
    print(f"# settling: load1 {l1:.2f} (waiting for < 1.0, "
          f"{int(300 - (time.time() - t0))}s budget left)", flush=True)
    time.sleep(15)
print(f"# pre-bench load1: {os.getloadavg()[0]:.2f}")
EOF
python bench.py 2>/dev/null | tail -1 | tee /tmp/bench_line.json
# the driver keeps only the last 2,000 stdout chars — the final line
# must parse as JSON and fit the cap or the round's bench evidence is
# lost (r14/r15 "parsed": null incidents)
python - <<'EOF'
import json
line = open("/tmp/bench_line.json").read().strip()
assert len(line) < 2000, f"bench final line {len(line)} chars >= 2000"
rec = json.loads(line)
assert rec.get("queries") and rec.get("value"), rec.keys()
print(f"# bench line OK: {len(line)} chars, "
      f"{len(rec['queries'])} queries, total {rec['value']}s")
EOF

echo "== BASELINE.md scaling rows for gated queries =="
python tools/check_baseline_rows.py

echo "== evidence pins (changed since last driver stamp) =="
python tools/stamp_evidence.py --check 2>&1 | tail -1 | head -c 400
echo ""
echo "== all checks done =="
