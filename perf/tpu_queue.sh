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
# hash    = THE brick-grid gate (VERDICT r2 #2)
# refsem  = joint reference-semantics stack at matched iterations (r2 #3)
# both use the tcnn-layout encoder (slower step) -> bigger timeout below.
for v in hash refsem nofuse timepair0 onehot0 stagedl16; do
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
    t="$ABT"
    case "$v" in hash|refsem) t=7200;; esac
    echo "=== quality_ab $v ($(date -u +%H:%M:%S), timeout ${t}s) ==="
    timeout "$t" python perf/quality_ab.py --variant "$v" --steps "$STEPS"
  else
    echo "=== $v already complete, skipping ==="
  fi
done

echo "=== queue done ($(date -u +%H:%M:%S)) ==="
