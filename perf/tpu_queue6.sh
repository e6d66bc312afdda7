#!/usr/bin/env bash
# Round-3 chip queue, part 4 (post-profile reorder: perf probes first, so
# their findings can still land as code this round).
#   1. 32k-ray-batch amortization probe (gather/scatter rates grow with N —
#      the biggest untested throughput lever; falls back to 16k if 32k OOMs)
#   2. stagedl16 full 2500            (VERDICT r2 #5 gate -> default flip)
#   3. refsembrick4k 1000             (joint stack, matched vs brick4k)
#   4. warm/cold compile probe        (VERDICT r2 #4)
#   5. bench.py prewarm               (driver round-end bench cache)
#
# Launch:  WAIT_PID=<pid> nohup bash perf/tpu_queue6.sh > /tmp/tpu_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
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

# 1. batch-amortization probe: 32k rays/branch, fall back to 16k on failure
echo "=== bench 32k batch ($(date -u +%H:%M:%S)) ==="
if ! BENCH_OVERRIDES="data.ray_batch_size=32768" BENCH_STEPS=6 \
     timeout 2700 python bench.py; then
  echo "=== 32k failed; bench 16k batch ($(date -u +%H:%M:%S)) ==="
  BENCH_OVERRIDES="data.ray_batch_size=16384" BENCH_STEPS=6 \
    timeout 2700 python bench.py || true
fi

# 2. staged lidar-K: the full 2500-step tail gate
run_variant stagedl16 4200 2500

# 3. joint pruning/fusion stack at the matched 1/4-batch pair
run_variant refsembrick4k 3600 1000

# 4. warm/cold compile probe (VERDICT r2 #4)
if [ ! -f perf/COMPILE_PROBE.json ]; then
  echo "=== compile_probe ($(date -u +%H:%M:%S)) ==="
  timeout 2700 python perf/compile_probe.py
fi

# 5. prewarm the driver's round-end bench program
echo "=== bench prewarm ($(date -u +%H:%M:%S)) ==="
BENCH_STEPS=4 timeout 2700 python bench.py

echo "=== queue6 done ($(date -u +%H:%M:%S)) ==="
