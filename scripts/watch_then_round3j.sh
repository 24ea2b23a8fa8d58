#!/usr/bin/env bash
# Watch a pid (the loop-value witness watcher, which itself runs after
# the round3i chain); when it exits, run the round3j quality-budget
# extension.  Launch detached so it survives session restarts:
#   setsid nohup bash scripts/watch_then_round3j.sh <pid> \
#     > /tmp/round3j_watch.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
PID=${1:?usage: watch_then_round3j.sh <pid>}
echo "[$(date +%H:%M:%S)] watching pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] pid $PID exited; running round3j"
bash scripts/round3j_extend_quality.sh > /tmp/round3j.log 2>&1
echo "[$(date +%H:%M:%S)] DONE watch_then_round3j"
