#!/bin/bash
# Round-3 on-chip validation runbook.  Run the moment the device tunnel
# is reachable; each stage is bounded and logs under /tmp/onchip_r3/.
#
#   bash scripts/onchip_r3.sh
#
# Order matters: correctness gates (run_tpu_tests) come before the A/Bs
# and the bench, so a Mosaic miscompile of the tilted kernels (the one
# untoggleable round-3 change; revert candidate a3fd38f) is caught with
# a named assert instead of a confusing bench delta.
set -u
LOG=/tmp/onchip_r3
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -6 "$LOG/$name.log"
  echo "--- $name rc=$rc"
  return $rc
}

GATE_RC=0
stage run_tpu_tests 3600 python run_tpu_tests.py || GATE_RC=$?
if [ "$GATE_RC" != 0 ]; then
  echo "!!! correctness gates FAILED (rc=$GATE_RC) — continuing so the"
  echo "!!! remaining stages leave diagnosis logs; bench's own asserts"
  echo "!!! still protect its numbers.  Tilt revert candidate: a3fd38f."
fi
stage runcap_ab     2400 python scripts/runcap_ab.py
stage chainskip_ab  2400 python scripts/chainskip_ab.py
stage bench         2400 python bench.py
stage bigbanded_40k 1800 python scripts/bigbanded_40k.py
stage profile_anchored 1800 python scripts/profile_anchored.py
echo "=== all stages done (gates rc=$GATE_RC); logs in $LOG ==="
exit $GATE_RC
