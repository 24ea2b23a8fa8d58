#!/usr/bin/env bash
# Watch the round3i quality chain (pid $1); when it exits, run the
# weak-expert loop-value witness (CPU-only, needs the stage-9 tiny
# multitask checkpoint).  Launch detached:
#   setsid nohup bash scripts/watch_then_loopvalue.sh <pid> \
#     > /tmp/loopvalue_watch.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
PID=${1:?usage: watch_then_loopvalue.sh <round3i pid>}
echo "[$(date +%H:%M:%S)] watching pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] chain exited; running loopvalue_multitask"
bash scripts/loopvalue_multitask.sh > /tmp/loopvalue_mt.log 2>&1
echo "[$(date +%H:%M:%S)] DONE watch_then_loopvalue"
