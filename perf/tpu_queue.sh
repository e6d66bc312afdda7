#!/usr/bin/env bash
# Pending single-chip work queue (PERF_NOTES.md round-3 queue).
#
# Runs the quality A/B comparators still missing from perf/QUALITY_r02.json
# in priority order, each under a timeout; quality_ab.py writes its curve
# incrementally every 100 steps, so a timeout kill loses at most 100 steps.
# Then runs the short bench probes for the pending row-count candidates.
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
ABT=${ABT:-3600}      # per-variant wall timeout (compile 150-900 s + run)

# --- quality A/Bs (priority order; `hash` is THE brick-grid gate) ---
for v in hash nofuse timepair0 onehot0 lprop6432 prop6432; do
  if python - "$v" <<'EOF'
import json, sys
d = json.load(open("perf/QUALITY_r02.json"))
r = d.get(sys.argv[1])
sys.exit(0 if not (r and not r.get("partial", False)) else 1)
EOF
  then
    echo "=== quality_ab $v ($(date -u +%H:%M:%S)) ==="
    timeout "$ABT" python perf/quality_ab.py --variant "$v" --steps "$STEPS"
  else
    echo "=== $v already complete, skipping ==="
  fi
done

# --- bench probes for row-count candidates (~60 steps each) ---
for ov in \
  "nerf.propnet.lidar_num_samples_per_prop=[64,32]" \
  "nerf.propnet.num_samples_per_prop=[64,32]" \
  "nerf.sampling.sample_topk=24" \
  "nerf.sampling.lidar_sample_topk=8" \
  ; do
  echo "=== bench $ov ($(date -u +%H:%M:%S)) ==="
  BENCH_OVERRIDES="$ov" BENCH_STEPS=8 timeout 1800 python bench.py
done
