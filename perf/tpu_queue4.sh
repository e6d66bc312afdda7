#!/usr/bin/env bash
# Round-3 chip queue, part 2 (after the mx OOM fix / blocked-periodic
# redesign).  Waits for any pid in $WAIT_PID, then:
#   1. mx full-step bench probe        (the VERDICT r2 #1 decision number)
#   2. mx flagship quality gate        (2500 matched iterations)
#   3. refsembrick joint stack         (VERDICT r2 #3)
#   4. warm/cold compile probe         (VERDICT r2 #4)
#   5. onehot0 / nofuse / timepair0    (complete the comparator set)
#   6. topk0 completion                (finish the partial 1400/2500)
#
# Launch:  WAIT_PID=<pid> nohup bash perf/tpu_queue4.sh > /tmp/tpu_queue4.log 2>&1 &
#          echo $! > /tmp/tpu_queue4.pid
# Stop:    kill $(cat /tmp/tpu_queue4.pid)
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

# 1. mx full-step bench probe (few steps; log is the record)
echo "=== bench mx ($(date -u +%H:%M:%S)) ==="
BENCH_OVERRIDES="nerf.model.grid_backend=mx" BENCH_STEPS=8 timeout 2700 python bench.py

# 2. mx flagship quality (2500 matched iterations)
run_variant mx 7200 2500

# 3. the joint reference-semantics stack
run_variant refsembrick 12600 2500

# 4. warm/cold compile probe (VERDICT r2 #4)
if [ ! -f perf/COMPILE_PROBE.json ]; then
  echo "=== compile_probe ($(date -u +%H:%M:%S)) ==="
  timeout 2700 python perf/compile_probe.py
fi

# 5. remaining individual comparators, as time allows
run_variant onehot0 4500 2500
run_variant nofuse 5400 2500
run_variant timepair0 4500 2500

# 6. finish the partial topk0 curve
run_variant topk0 7200 2500

echo "=== queue4 done ($(date -u +%H:%M:%S)) ==="
