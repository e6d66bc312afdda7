#!/usr/bin/env bash
# Pending single-chip work queue (PERF_NOTES.md round-3 queue).
#
# Runs the quality A/B comparators still missing from perf/QUALITY_r02.json
# in priority order, each under a timeout; quality_ab.py writes its curve
# incrementally every 100 steps, so a timeout kill loses at most 100 steps.
#
# Launch:  nohup bash perf/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
#          echo $! > /tmp/tpu_queue.pid
# Stop:    kill $(cat /tmp/tpu_queue.pid)   # NEVER pkill by pattern
#
# The chip is shared with the round-end driver bench — stop this queue
# before the round ends.
set -u
cd "$(dirname "$0")/.."

STEPS=${STEPS:-2500}
ABT=${ABT:-4500}      # per-variant wall timeout (compile 150-900 s + run)

# --- quality A/Bs (priority order) ---
# refsembrick = joint reference-semantics stack minus backend (r2 #3)
# brick4k/hash4k = THE brick-grid gate as an affordable matched pair (#2)
# stagedl16 = end-of-schedule depth fix candidate default (#5)
run_variant() {
  v="$1"; t="$2"; s="$3"
  if python - "$v" <<'EOF'
import json, sys
try:
    d = json.load(open("perf/QUALITY_r02.json"))
except Exception:
    sys.exit(0)  # missing/corrupt results file => everything needs running
r = d.get(sys.argv[1])
sys.exit(0 if not (r and not r.get("partial", False)) else 1)
EOF
  then
    echo "=== quality_ab $v ($(date -u +%H:%M:%S), timeout ${t}s, steps $s) ==="
    timeout "$t" python perf/quality_ab.py --variant "$v" --steps "$s"
  else
    echo "=== $v already complete, skipping ==="
  fi
}

run_variant refsembrick 7200 "$STEPS"
run_variant brick4k     2700 1000
run_variant hash4k      7200 1000
run_variant stagedl16   4500 "$STEPS"
run_variant onehot0     4500 "$STEPS"
run_variant nofuse      5400 "$STEPS"
run_variant timepair0   4500 "$STEPS"

echo "=== queue done ($(date -u +%H:%M:%S)) ==="
