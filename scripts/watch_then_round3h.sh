#!/usr/bin/env bash
# Waits for round3g_rebuild.sh to finish (DONE marker in /tmp/round3g.log
# or its PID exiting), then runs the round-3h post-rebuild measurements
# (async-serving artifact P6.2 + b128 probe) on the now-idle TPU.
set -uo pipefail
cd "$(dirname "$0")/.."
CHAIN_PID="${1:-}"
log() { echo "[$(date +%H:%M:%S)] watcher: $*"; }

log "waiting for round3g chain (pid=${CHAIN_PID:-unknown})"
while true; do
  if grep -q "DONE round3g_rebuild" /tmp/round3g.log 2>/dev/null; then
    log "chain logged DONE"; break
  fi
  if [ -n "$CHAIN_PID" ] && ! kill -0 "$CHAIN_PID" 2>/dev/null; then
    log "chain pid exited (no DONE marker — ran to error or was killed)"
    break
  fi
  sleep 60
done

sleep 30   # let any trailing TPU work drain
log "starting round3h_post.sh"
bash scripts/round3h_post.sh
log "watcher done"
