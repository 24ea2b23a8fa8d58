#!/usr/bin/env bash
# Watch the round3j watcher (pid $1 — watch_then_round3j.sh runs the
# 3j chain synchronously, so its exit means 3j is done); then run the
# optional round3k extension (quality experts 48/36/36 + leak-free
# regens).  Launch detached so it survives session restarts:
#   setsid nohup bash scripts/watch_then_round3k.sh <pid> \
#     > /tmp/round3k_watch.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
PID=${1:?usage: watch_then_round3k.sh <round3j-watcher pid>}
echo "[$(date +%H:%M:%S)] watching pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] pid $PID exited; running round3k"
bash scripts/round3k_extend_more.sh > /tmp/round3k.log 2>&1
echo "[$(date +%H:%M:%S)] DONE watch_then_round3k"
