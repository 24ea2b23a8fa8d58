#!/usr/bin/env bash
# Stall-tolerant TPU stage runner: the axon relay sometimes wedges a
# long-lived connection mid-run (a fresh process reconnects fine).
# Runs the given command under a no-output watchdog: if the log stops
# growing for STALL_S seconds, the process is killed and retried —
# training CLIs resume from their per-epoch full train state.
#
# Usage: tpu_retry.sh <logfile> <stall_seconds> <max_tries> cmd args...
set -uo pipefail
LOG=$1; STALL=$2; TRIES=$3; shift 3

for attempt in $(seq 1 "$TRIES"); do
  echo "=== tpu_retry attempt $attempt: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    SIZE0=$(stat -c %s "$LOG")
    for _ in $(seq 1 "$((STALL / 10))"); do
      sleep 10
      kill -0 "$PID" 2>/dev/null || break
    done
    kill -0 "$PID" 2>/dev/null || break
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
  if [ "$RC" = 0 ]; then
    echo "=== tpu_retry: success on attempt $attempt" >> "$LOG"
    exit 0
  fi
done
echo "=== tpu_retry: FAILED after $TRIES attempts" >> "$LOG"
exit 1
