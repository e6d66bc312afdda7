#!/usr/bin/env bash
# Round-5 post-flagship chip queue. Waits for the 25k north-star run
# (/tmp/northstar25k.pid), then uses whatever chip time remains in the
# round, quality/evidence first:
#   1. clean committed-default bench  -> /tmp/bench_r05_clean.json
#      (round-4 weak #3: the round-end driver bench was contaminated by a
#      concurrent job; this row is the idle-chip evidence)
#   2. onehot0   — last unmeasured default-on divergence row (2500 steps)
#   3. prop6432  — attributes pixstack's -0.40 dB: pixel prop rows alone,
#                  without the K=24 pruning (2500 steps)
#   4. timepair0 / nofuse / finelvl2 — remaining comparator rows
# Every quality run writes incremental partials every 100 steps; a
# timeout or round-end kill keeps the curve-so-far.
#   nohup bash perf/tpu_queue10.sh > /tmp/tpu_queue10.log 2>&1 &
#   echo $! > /tmp/tpu_queue10.pid
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${WAIT_PID:-$(cat /tmp/northstar25k.pid 2>/dev/null || echo)}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting on flagship pid $WAIT_PID ($(date -u +%H:%M:%S)) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== flagship done ($(date -u +%H:%M:%S)) ==="
fi

echo "=== clean bench ($(date -u +%H:%M:%S)) ==="
timeout 1800 python bench.py > /tmp/bench_r05_clean.json 2>/tmp/bench_r05_clean.err \
  && tail -2 /tmp/bench_r05_clean.json || true

qual() {
  echo "=== quality $1 x$2 ($(date -u +%H:%M:%S)) ==="
  timeout "$3" python perf/quality_ab.py --variant "$1" --steps "$2" || true
}

qual onehot0    2500 5400
qual prop6432   2500 4500
qual timepair0  2500 5400
qual finelvl2   2500 4500
qual nofuse     2500 7200

echo "=== queue10 done ($(date -u +%H:%M:%S)) ==="
