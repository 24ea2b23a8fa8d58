#!/usr/bin/env bash
# One-shot recovery entry point after a VM wipe (five wipes and
# counting in round 3): if the quality/tiny checkpoints are gone and
# no rebuild chain is running, relaunch round3g_rebuild.sh detached
# (setsid, so it survives session crashes) plus the round3k watcher
# keyed to the REAL script pid (NOT $! — that is the short-lived
# setsid parent).  Idempotent: safe to run unconditionally at session
# start; it does nothing if a chain is already alive or the quality
# checkpoints exist.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*"; }

running_pid() {  # prints the pid of a live round3 chain script, if any
  ps -eo pid,cmd | awk '/bash scripts\/(round3[a-z_]*|round3_rebuild_all)\.sh/ && !/awk/ {print $1; exit}'
}

PID=$(running_pid || true)
if [ -n "${PID:-}" ]; then
  log "chain already running (pid $PID); nothing to do"
  exit 0
fi

if [ -d checkpoints/quality/expert_models/gnn ] && \
   [ -d checkpoints/quality/retrieval_system ]; then
  log "quality checkpoints present and no chain running; nothing to do"
  exit 0
fi

log "no chain + missing checkpoints: probing relay"
probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import time, jax.numpy as jnp
x = jnp.ones((256, 256)) * (1.0 + (time.time() % 97) * 1e-6)
float((x @ x).sum())
EOF
}
for attempt in $(seq 1 60); do
  if probe; then break; fi
  log "relay stalled (attempt $attempt); sleeping 8 min"
  sleep 480
done

log "launching round3g_rebuild.sh detached"
setsid nohup bash scripts/round3g_rebuild.sh > /tmp/round3g.log 2>&1 < /dev/null &
sleep 3
GPID=$(running_pid || true)
if [ -z "${GPID:-}" ]; then
  log "FAILED to launch round3g_rebuild.sh"
  exit 1
fi
log "round3g_rebuild pid $GPID; launching round3k watcher"
setsid nohup bash scripts/watch_then_round3k.sh "$GPID" \
  > /tmp/round3k_watch.log 2>&1 < /dev/null &
sleep 2
log "done; logs: /tmp/round3g.log /tmp/round3k{,_watch}.log"
