#!/usr/bin/env bash
# Round-3 chip queue (supersedes tpu_queue2.sh): waits for the in-flight
# hash4k run (pid in $WAIT_PID), then works through the round-3 chip jobs
# in priority order:
#   1. mx full-step bench probe        (decision number for VERDICT r2 #1c)
#   2. mx flagship quality gate        (2500 matched iterations)
#   3. reference-profile bench line    (VERDICT r2 #4 -> BENCH_PROFILES.json)
#   4. xprof composition of the mx step (guides the next optimization)
#   5. stagedl16 gate                  (VERDICT r2 #5)
#   6. refsembrick joint stack         (VERDICT r2 #3)
#   7. warm/cold compile probe         (VERDICT r2 #4)
#   8. onehot0 / nofuse / timepair0    (complete the comparator set)
#
# Launch:  WAIT_PID=<pid> nohup bash perf/tpu_queue3.sh > /tmp/tpu_queue3.log 2>&1 &
#          echo $! > /tmp/tpu_queue3.pid
# Stop:    kill $(cat /tmp/tpu_queue3.pid)
set -u
cd "$(dirname "$0")/.."

if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID ==="
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

# 1. mx full-step bench probe (few steps; writes no JSON — log is the record)
echo "=== bench mx ($(date -u +%H:%M:%S)) ==="
BENCH_OVERRIDES="nerf.model.grid_backend=mx" BENCH_STEPS=8 timeout 2700 python bench.py

# 2. mx flagship quality (2500 matched iterations)
run_variant mx 5400 2500

# 3. reference-work-definition bench line (VERDICT r2 #4); recorded into
#    perf/BENCH_PROFILES.json and embedded by every later default bench run
if [ ! -f perf/BENCH_PROFILES.json ]; then
  echo "=== bench reference profile ($(date -u +%H:%M:%S)) ==="
  BENCH_PROFILE=reference BENCH_STEPS=4 timeout 3600 python bench.py
fi

# 4. xprof composition of the mx step (perf/PROFILE_mx.json)
if [ ! -f perf/PROFILE_mx.json ]; then
  echo "=== profile mx step ($(date -u +%H:%M:%S)) ==="
  BENCH_OVERRIDES="nerf.model.grid_backend=mx" PROF_TAG=mx PROF_STEPS=3 \
    timeout 2700 python perf/profile_step.py
fi

# 5. staged lidar-K gate (VERDICT r2 #5)
run_variant stagedl16 4500 2500

# 6. the joint reference-semantics stack (rerun after the it=512 crash;
#    retry logic now in quality_ab)
run_variant refsembrick 12600 2500

# 7. warm/cold compile probe (VERDICT r2 #4)
if [ ! -f perf/COMPILE_PROBE.json ]; then
  echo "=== compile_probe ($(date -u +%H:%M:%S)) ==="
  timeout 2700 python perf/compile_probe.py
fi

# 8. remaining individual comparators, as time allows
run_variant onehot0 4500 2500
run_variant nofuse 5400 2500
run_variant timepair0 4500 2500

echo "=== queue3 done ($(date -u +%H:%M:%S)) ==="
