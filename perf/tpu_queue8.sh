#!/usr/bin/env bash
# Round-4 phase-A chip queue: the remaining single-chip row-count knobs
# (VERDICT r3 next-round #2).  Bench probes only — quality gates for
# winners run AFTER the 25k north-star job (phase B) so the flagship run
# starts as early as possible.
#   nohup bash perf/tpu_queue8.sh > /tmp/tpu_queue8.log 2>&1 &
#   echo $! > /tmp/tpu_queue8.pid
set -u
cd "$(dirname "$0")/.."

bench() {
  echo "=== bench $1 ($(date -u +%H:%M:%S)) ==="
  BENCH_OVERRIDES="$2" BENCH_STEPS=6 timeout 2700 python bench.py || true
}

bench lprop6432 "nerf.propnet.lidar_num_samples_per_prop=[64,32]"
bench lprop6432+prop6432 "nerf.propnet.lidar_num_samples_per_prop=[64,32];nerf.propnet.num_samples_per_prop=[64,32]"
bench lprop6432+prop6432+stopk24 "nerf.propnet.lidar_num_samples_per_prop=[64,32];nerf.propnet.num_samples_per_prop=[64,32];nerf.sampling.sample_topk=24;nerf.sampling.sample_topk_temp=0.3"

echo "=== queue8 phase A done ($(date -u +%H:%M:%S)) ==="
