#!/usr/bin/env bash
# Round-4 chained chip queue. Waits for the 25k north-star flagship run
# (VERDICT r3 #1, /tmp/northstar25k.pid), then:
#   phase A  — remaining single-chip row-count knob benches (VERDICT #2)
#   phase B  — missing default-on divergence comparator rows (VERDICT #3):
#              onehot0 / nofuse / timepair0 / topk0 at 2500 matched steps
#   phase C  — joint shipped-stack gate at 1/4 batch: brick4k (= exact
#              committed defaults incl. staged lidar-K, 2500 steps) vs
#              refsembrick4k extended 1000 -> 2500
# Every quality run writes incremental partials, so a timeout kill keeps
# the curve-so-far.
#   nohup bash perf/tpu_queue9.sh > /tmp/tpu_queue9.log 2>&1 &
#   echo $! > /tmp/tpu_queue9.pid
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${WAIT_PID:-$(cat /tmp/northstar25k.pid 2>/dev/null || echo)}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting on flagship pid $WAIT_PID ($(date -u +%H:%M:%S)) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== flagship done ($(date -u +%H:%M:%S)) ==="
fi

bench() {
  echo "=== bench $1 ($(date -u +%H:%M:%S)) ==="
  BENCH_OVERRIDES="$2" BENCH_STEPS=6 timeout 2700 python bench.py || true
}
qual() {
  echo "=== quality $1 x$2 ($(date -u +%H:%M:%S)) ==="
  timeout "$3" python perf/quality_ab.py --variant "$1" --steps "$2" || true
}

# phase A: row-count knobs (perf/tpu_queue8.sh contents)
bench lprop6432 "nerf.propnet.lidar_num_samples_per_prop=[64,32]"
bench lprop6432+prop6432 "nerf.propnet.lidar_num_samples_per_prop=[64,32];nerf.propnet.num_samples_per_prop=[64,32]"
bench lprop6432+prop6432+stopk24 "nerf.propnet.lidar_num_samples_per_prop=[64,32];nerf.propnet.num_samples_per_prop=[64,32];nerf.sampling.sample_topk=24;nerf.sampling.sample_topk_temp=0.3"

# phase B: missing comparator rows, full batch, 2500 matched steps
qual onehot0   2500 5400
qual timepair0 2500 5400
qual nofuse    2500 7200
qual topk0     2500 7200

# phase C: joint shipped-stack gate at 1/4 batch
qual brick4k        2500 3600
qual refsembrick4k  2500 5400

echo "=== queue9 done ($(date -u +%H:%M:%S)) ==="
