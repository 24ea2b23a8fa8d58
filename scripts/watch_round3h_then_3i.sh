#!/usr/bin/env bash
# Waits for round3h_post.sh to log DONE (or its pid to exit), then
# launches the trimmed quality chain (round3i) on the idle TPU.
set -uo pipefail
cd "$(dirname "$0")/.."
H_PID="${1:-}"
log() { echo "[$(date +%H:%M:%S)] watcher3i: $*"; }

log "waiting for round3h (pid=${H_PID:-unknown})"
while true; do
  if grep -q "DONE round3h_post" /tmp/round3h.log 2>/dev/null; then
    log "round3h logged DONE"; break
  fi
  if [ -n "$H_PID" ] && ! kill -0 "$H_PID" 2>/dev/null; then
    log "round3h pid exited (no DONE marker)"; break
  fi
  sleep 60
done

sleep 30
log "starting round3i_quality_trimmed.sh"
bash scripts/round3i_quality_trimmed.sh >> /tmp/round3i.log 2>&1
log "watcher3i done"
