#!/usr/bin/env bash
# Probe-gated launcher for round3_rebuild_all.sh: wait for the axon
# relay to come back (it stalls for tens of minutes some nights — a
# wedged connection hangs rather than erroring), then run the full
# rebuild chain.  Safe to re-run: every stage resumes/regens.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*"; }

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import time, jax.numpy as jnp
x = jnp.ones((256, 256)) * (1.0 + (time.time() % 97) * 1e-6)
float((x @ x).sum())
EOF
}

for attempt in $(seq 1 60); do
  log "relay probe (attempt $attempt)"
  if probe; then
    log "relay alive; starting rebuild_all"
    bash scripts/round3_rebuild_all.sh >> /tmp/rebuild_all.log 2>&1
    log "rebuild_all exited rc=$?"
    exit 0
  fi
  log "relay stalled; sleeping 8 min"
  sleep 480
done
log "relay NEVER recovered after 60 probes"
exit 1
