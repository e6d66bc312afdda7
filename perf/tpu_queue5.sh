#!/usr/bin/env bash
# Round-3 chip queue, part 3 (session schedule after the mx quality gate).
# Waits for any pid in $WAIT_PID, then:
#   1. xprof composition of the mx step      (where do the 761 ms go?)
#   2. xprof composition of the brick step   (default-backend comparison)
#   3. stagedl16 full 2500                   (VERDICT r2 #5, tail gate)
#   4. refsembrick4k 1000                    (joint stack, matched vs brick4k)
#   5. warm/cold compile probe               (VERDICT r2 #4)
#   6. bench.py prewarm                      (driver round-end bench cache)
#
# Launch:  WAIT_PID=<pid> nohup bash perf/tpu_queue5.sh > /tmp/tpu_queue5.log 2>&1 &
#          echo $! > /tmp/tpu_queue5.pid
set -u
cd "$(dirname "$0")/.."

if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== pid $WAIT_PID done ($(date -u +%H:%M:%S)) ==="
fi

run_variant() {
  v="$1"; t="$2"; s="$3"
  if python - "$v" "$s" <<'EOF'
import json, sys
try:
    d = json.load(open("perf/QUALITY_r02.json"))
except Exception:
    sys.exit(0)  # missing/corrupt results file => everything needs running
r = d.get(sys.argv[1])
done = r and not r.get("partial", False) and r.get("steps_done", 0) >= int(sys.argv[2])
sys.exit(1 if done else 0)
EOF
  then
    echo "=== quality_ab $v ($(date -u +%H:%M:%S), timeout ${t}s, steps $s) ==="
    timeout "$t" python perf/quality_ab.py --variant "$v" --steps "$s"
  else
    echo "=== $v already complete, skipping ==="
  fi
}

# 1+2. step composition profiles (few traced steps; warm caches)
if [ ! -f perf/PROFILE_mx.json ]; then
  echo "=== profile mx ($(date -u +%H:%M:%S)) ==="
  BENCH_OVERRIDES="nerf.model.grid_backend=mx" PROF_TAG=mx \
    timeout 2700 python perf/profile_step.py
fi
if [ ! -f perf/PROFILE_brick.json ]; then
  echo "=== profile brick ($(date -u +%H:%M:%S)) ==="
  PROF_TAG=brick timeout 2700 python perf/profile_step.py
fi

# 3. staged lidar-K: the full 2500-step tail gate
run_variant stagedl16 4200 2500

# 4. joint pruning/fusion stack at the matched 1/4-batch pair
run_variant refsembrick4k 3600 1000

# 5. warm/cold compile probe (VERDICT r2 #4)
if [ ! -f perf/COMPILE_PROBE.json ]; then
  echo "=== compile_probe ($(date -u +%H:%M:%S)) ==="
  timeout 2700 python perf/compile_probe.py
fi

# 6. prewarm the driver's round-end bench program
echo "=== bench prewarm ($(date -u +%H:%M:%S)) ==="
BENCH_STEPS=4 timeout 2700 python bench.py

echo "=== queue5 done ($(date -u +%H:%M:%S)) ==="
