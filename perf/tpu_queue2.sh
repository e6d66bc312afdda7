#!/usr/bin/env bash
# Round-3 follow-up chip queue: waits for the orphaned hash4k run (pid in
# $WAIT_PID) to finish, then runs the mx-backend bench + quality gates and
# the remaining comparators in priority order.
#
# Launch:  WAIT_PID=<pid> nohup bash perf/tpu_queue2.sh > /tmp/tpu_queue2.log 2>&1 &
#          echo $! > /tmp/tpu_queue2.pid
# Stop:    kill $(cat /tmp/tpu_queue2.pid)
set -u
cd "$(dirname "$0")/.."

if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID (hash4k) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== pid $WAIT_PID done ($(date -u +%H:%M:%S)) ==="
fi

run_variant() {
  v="$1"; t="$2"; s="$3"
  if python - "$v" <<'EOF'
import json, sys
try:
    d = json.load(open("perf/QUALITY_r02.json"))
except Exception:
    sys.exit(0)
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

# 1. mx full-step bench probe (few steps; writes no JSON — log is the record)
echo "=== bench mx ($(date -u +%H:%M:%S)) ==="
BENCH_OVERRIDES="nerf.model.grid_backend=mx" BENCH_STEPS=8 timeout 2700 python bench.py

# 2. mx flagship quality (expected fast steps; 2500 matched iterations)
run_variant mx 5400 2500

# 3. staged lidar-K gate (VERDICT r2 #5)
run_variant stagedl16 4500 2500

# 4. the joint reference-semantics stack (rerun after the it=512 crash;
#    retry logic now in quality_ab)
run_variant refsembrick 10800 2500

# 5. warm/cold compile probe (VERDICT r2 #4)
if [ ! -f perf/COMPILE_PROBE.json ]; then
  echo "=== compile_probe ($(date -u +%H:%M:%S)) ==="
  timeout 2700 python perf/compile_probe.py
fi

# 6. remaining individual comparators, as time allows
run_variant onehot0 4500 2500
run_variant nofuse 5400 2500
run_variant timepair0 4500 2500

echo "=== queue2 done ($(date -u +%H:%M:%S)) ==="
