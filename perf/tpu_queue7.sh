#!/usr/bin/env bash
# Round-4 chip queue (handoff from round 3; run on an idle chip:
#   nohup bash perf/tpu_queue7.sh > /tmp/tpu_queue7.log 2>&1 &
#   echo $! > /tmp/tpu_queue7.pid ).
# Priority order at round-3 close:
#   1. remaining row-count candidates: bench probes, then the quality A/B
#      for whichever beats ~1.1x (lprop6432 / prop6432 / stopk24)
#   2. comparator completion: onehot0, nofuse, timepair0 (2500 matched)
#   3. topk0 completion (partial 1400/2500)
#   4. refsembrick full-batch completion (partial 500/2500; the matched
#      refsembrick4k/brick4k pair already covers the joint stack at 1/4
#      batch — this is belt-and-braces, run LAST)
set -u
cd "$(dirname "$0")/.."

run_variant() {
  v="$1"; t="$2"; s="$3"
  if python - "$v" "$s" <<'EOF'
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
    echo "=== quality_ab $v ($(date -u +%H:%M:%S), timeout ${t}s, steps $s) ==="
    timeout "$t" python perf/quality_ab.py --variant "$v" --steps "$s"
  else
    echo "=== $v already complete, skipping ==="
  fi
}

echo "=== bench lprop6432 ($(date -u +%H:%M:%S)) ==="
BENCH_OVERRIDES="nerf.propnet.lidar_num_samples_per_prop=[64;32]" BENCH_STEPS=6 \
  timeout 2700 python bench.py || true
echo "=== bench prop6432+lprop6432 ($(date -u +%H:%M:%S)) ==="
BENCH_OVERRIDES="nerf.propnet.num_samples_per_prop=[64;32]" BENCH_STEPS=6 \
  timeout 2700 python bench.py || true

run_variant onehot0 4500 2500
run_variant nofuse 5400 2500
run_variant timepair0 4500 2500
run_variant topk0 7200 2500
run_variant refsembrick 12600 2500

echo "=== queue7 done ($(date -u +%H:%M:%S)) ==="
