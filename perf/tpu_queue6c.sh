#!/usr/bin/env bash
# Round-3 final leg v2: prewarm -> compile probe (all-or-nothing) ->
# refsembrick4k (incremental; a timeout/round-end kill keeps the curve).
set -u
cd "$(dirname "$0")/.."
if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== pid $WAIT_PID done ($(date -u +%H:%M:%S)) ==="
fi

echo "=== bench prewarm ($(date -u +%H:%M:%S)) ==="
BENCH_STEPS=4 timeout 2700 python bench.py || true

if [ ! -f perf/COMPILE_PROBE.json ]; then
  echo "=== compile_probe ($(date -u +%H:%M:%S)) ==="
  timeout 2700 python perf/compile_probe.py
fi

echo "=== quality_ab refsembrick4k ($(date -u +%H:%M:%S)) ==="
timeout 3600 python perf/quality_ab.py --variant refsembrick4k --steps 1000
echo "=== queue6c done ($(date -u +%H:%M:%S)) ==="
