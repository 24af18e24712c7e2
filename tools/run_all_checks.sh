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
# inflates the first isolated medians (r15 close run: load1 7.15 at
# bench start, q26 median 3.42 vs 2.42 clean-box) — the bench's own
# load markers record whatever remains, this just shrinks it
sleep 60
python bench.py 2>/dev/null | tail -1

echo "== BASELINE.md scaling rows for gated queries =="
python tools/check_baseline_rows.py

echo "== evidence pins (changed since last driver stamp) =="
python tools/stamp_evidence.py --check 2>&1 | tail -1 | head -c 400
echo ""
echo "== all checks done =="
