#!/usr/bin/env bash
# Stall-tolerant TPU stage runner: the axon relay sometimes wedges a
# long-lived connection mid-run (a fresh process reconnects fine).
# Runs the given command under a no-output watchdog: if the log stops
# growing for STALL_S seconds, the process is killed and retried —
# training CLIs resume from their per-epoch full train state.
#
# Bench yield protocol (round-4): the worker pid is registered in
# /tmp/radar_tpu_workers/ so bench.py can detect live competitors,
# and while the /tmp/radar_bench_running flag is fresh (<10 min old)
# the worker parks itself between steps (utils/contention.maybe_yield)
# while this runner neither stall-kills the parked worker nor
# launches a new attempt.
#
# Usage: tpu_retry.sh <logfile> <stall_seconds> <max_tries> cmd args...
set -uo pipefail
LOG=$1; STALL=$2; TRIES=$3; shift 3

PIDDIR=/tmp/radar_tpu_workers
FLAG=/tmp/radar_bench_running
mkdir -p "$PIDDIR"

bench_active() {
  # fresh flag file => a bench run is (or was very recently) live;
  # a stale flag (crashed bench) never deadlocks the chain.
  [ -f "$FLAG" ] || return 1
  local now mt
  now=$(date +%s); mt=$(stat -c %Y "$FLAG" 2>/dev/null || echo 0)
  [ $((now - mt)) -lt 600 ]
}

wait_for_bench() {
  while bench_active; do
    echo "=== tpu_retry: yielding to bench ($FLAG fresh)" >> "$LOG"
    sleep 15
  done
}

for attempt in $(seq 1 "$TRIES"); do
  wait_for_bench
  echo "=== tpu_retry attempt $attempt: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo $$ > "$PIDDIR/$PID" 2>/dev/null || true
  while kill -0 "$PID" 2>/dev/null; do
    SIZE0=$(stat -c %s "$LOG")
    for _ in $(seq 1 "$((STALL / 10))"); do
      sleep 10
      kill -0 "$PID" 2>/dev/null || break
    done
    kill -0 "$PID" 2>/dev/null || break
    if bench_active; then
      # worker is parked (cooperative yield) during a bench — not a
      # stall.
      continue
    fi
    SIZE1=$(stat -c %s "$LOG")
    if [ "$SIZE0" = "$SIZE1" ]; then
      echo "=== tpu_retry: no log output for ${STALL}s, killing $PID" \
        >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  RC=$?
  rm -f "$PIDDIR/$PID"
  if [ "$RC" = 0 ]; then
    echo "=== tpu_retry: success on attempt $attempt" >> "$LOG"
    exit 0
  fi
done
echo "=== tpu_retry: FAILED after $TRIES attempts" >> "$LOG"
exit 1
