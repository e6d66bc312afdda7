#!/usr/bin/env bash
# Round-5 post-flagship chip queue. Waits for the 25k north-star run
# (/tmp/northstar25k.pid), then uses the chip time remaining in the
# round, quality/evidence first, under a HARD DEADLINE so the chip and
# its pid files are clean well before the round-end driver bench
# (round-4 weak #3 was a contaminated driver bench; a live queue at
# round end would either contaminate it again or trip bench.py's
# busy-guard and erase the round's number entirely):
#   1. clean committed-default bench  -> /tmp/bench_r05_clean.json
#      (BENCH_IGNORE_LOCK=1: the only live pid file at that point is
#      this queue's own)
#   2. onehot0   — last unmeasured default-on divergence row
#   3. prop6432  — attributes pixstack's -0.40 dB: pixel prop rows
#                  alone, without the K=24 pruning
#   4. timepair0 / finelvl2 / nofuse — remaining comparator rows
# Every quality run writes incremental partials every 100 steps; the
# deadline kill keeps the curve-so-far.
#   nohup bash perf/tpu_queue10.sh > /tmp/tpu_queue10.log 2>&1 &
#   echo $! > /tmp/tpu_queue10.pid
set -u
cd "$(dirname "$0")/.."

# default deadline: 13:20 UTC today (round ends ~13:50; leave the chip
# and the host core idle 30 min before the driver bench)
DEADLINE="${DEADLINE:-$(date -u -d 'today 13:20' +%s)}"

WAIT_PID="${WAIT_PID:-$(cat /tmp/northstar25k.pid 2>/dev/null || echo)}"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting on flagship pid $WAIT_PID ($(date -u +%H:%M:%S)) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== flagship done ($(date -u +%H:%M:%S)) ==="
fi
rm -f /tmp/northstar25k.pid

left() { echo $(( DEADLINE - $(date +%s) )); }

if [ "$(left)" -gt 900 ]; then
  echo "=== clean bench ($(date -u +%H:%M:%S)) ==="
  BENCH_IGNORE_LOCK=1 timeout 1800 python bench.py \
    > /tmp/bench_r05_clean.json 2>/tmp/bench_r05_clean.err \
    && tail -2 /tmp/bench_r05_clean.json || true
fi

qual() {
  local budget
  budget=$(( $(left) - 120 ))
  [ "$budget" -gt "$2" ] && budget="$2"
  if [ "$budget" -lt 900 ]; then
    echo "=== skip $1: ${budget}s left before deadline ==="
    return
  fi
  echo "=== quality $1 (budget ${budget}s, $(date -u +%H:%M:%S)) ==="
  timeout "$budget" python perf/quality_ab.py --variant "$1" --steps 2500 || true
}

qual onehot0    5400
qual prop6432   4500
qual timepair0  5400
qual finelvl2   4500
qual nofuse     7200

rm -f /tmp/tpu_queue10.pid
echo "=== queue10 done ($(date -u +%H:%M:%S)) ==="
