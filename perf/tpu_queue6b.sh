#!/usr/bin/env bash
# Round-3 chip queue, final leg: after stagedl16 —
#   1. bench.py prewarm (insurance for the driver's round-end bench cache)
#   2. refsembrick4k 1000 (joint stack, matched vs brick4k; incremental)
#   3. warm/cold compile probe (VERDICT r2 #4)
# Launch:  WAIT_PID=<pid> nohup bash perf/tpu_queue6b.sh > /tmp/tpu_queue6b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== pid $WAIT_PID done ($(date -u +%H:%M:%S)) ==="
fi

echo "=== bench prewarm ($(date -u +%H:%M:%S)) ==="
BENCH_STEPS=4 timeout 2700 python bench.py || true

if python - refsembrick4k 1000 <<'EOF'
import json, sys
try:
    d = json.load(open("perf/QUALITY_r02.json"))
except Exception:
    sys.exit(0)
r = d.get(sys.argv[1])
done = r and not r.get("partial", False) and r.get("steps_done", 0) >= int(sys.argv[2])
sys.exit(1 if done else 0)
EOF
then
  echo "=== quality_ab refsembrick4k ($(date -u +%H:%M:%S)) ==="
  timeout 3600 python perf/quality_ab.py --variant refsembrick4k --steps 1000
fi

if [ ! -f perf/COMPILE_PROBE.json ]; then
  echo "=== compile_probe ($(date -u +%H:%M:%S)) ==="
  timeout 2700 python perf/compile_probe.py
fi
echo "=== queue6b done ($(date -u +%H:%M:%S)) ==="
