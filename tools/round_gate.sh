#!/usr/bin/env bash
# One-command local rehearsal of everything the driver's round gate checks:
#   1. sbt test            (unit/property/plan/soak specs)
#   2. Verify + DuckDB compare at sf0.001 AND sf0.01 (the correctness gate)
#   3. Bench at sf0.1      (the perf gate; fails loud on any broken query)
# Run from the repo root before ending a round. ~15 min on a quiet box.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/4] sbt test"
sbt -batch test

for sf in sf0.001 sf0.01; do
  out="/tmp/round-gate-$sf"
  echo "=== [2/4] Verify + oracle compare @ $sf"
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out"
  # Run the oracle suite ONCE, keep the full report, then check the summary
  # (re-running it just to grep doubled gate time).
  report="/tmp/round-gate-$sf.report"
  python3 tools/check_correctness.py "/root/testdata/$sf" "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at $sf"; exit 1; }
done

echo "=== [3/4] Bench @ sf0.1 (exits non-zero if any headline query breaks)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"

echo "=== [4/4] Plan evidence is current?"
sbt -batch "runMain graft.PlanDump"
git diff --quiet PLANS.md \
  || echo "NOTE: PLANS.md changed — review and commit the regenerated evidence."

echo "ROUND GATE: all green"
