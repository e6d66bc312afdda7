#!/usr/bin/env bash
# Round-4 chained chip queue (v2). Waits for the 25k north-star flagship
# run (VERDICT r3 #1, /tmp/northstar25k.pid), then runs 2500-step
# quality_ab jobs — each records BOTH the matched-iteration quality curve
# and steady_ms_per_step (speed), so no separate bench probes are needed:
#   1. rowstack   — the combined round-4 row-knob candidate default
#                   (lprop[64,32] + prop[64,32] + stopk24 + finelvl2):
#                   joint quality gate + joint speed in one run
#   2. onehot0 / timepair0 — the two missing default-on divergence rows
#   3. lprop6432 / finelvl2 — knob decomposition (if rowstack wins, these
#                   attribute it; if it loses, they salvage the winners)
#   4. nofuse / topk0 — remaining comparator rows (slow variants)
#   5. brick4k / refsembrick4k — joint shipped-stack gate at 1/4 batch,
#                   2500 matched steps
# Every run writes incremental partials; a timeout keeps the curve-so-far.
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

qual() {
  echo "=== quality $1 x$2 ($(date -u +%H:%M:%S)) ==="
  timeout "$3" python perf/quality_ab.py --variant "$1" --steps "$2" || true
}

# quick probe (~5 min): per-level vs batched all-level prop gathers
echo "=== bench_level_batch ($(date -u +%H:%M:%S)) ==="
timeout 1200 python perf/bench_level_batch.py || true

qual rowstack      2500 5400
qual onehot0       2500 5400
qual timepair0     2500 5400
qual lprop6432     2500 4500
qual finelvl2      2500 4500
qual nofuse        2500 7200
qual topk0         2500 7200
# 2500-step joint pair under NEW names: rerunning brick4k/refsembrick4k
# at a different num_iters would overwrite the 1000-step rows the
# recorded hash4k pair is matched against (round-4 review finding)
qual brick4k2500   2500 3600
qual refsem4k2500  2500 5400

echo "=== queue9 done ($(date -u +%H:%M:%S)) ==="
