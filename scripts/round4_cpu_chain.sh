#!/usr/bin/env bash
# Round-4 CPU work chain (sequential — the host has ONE core):
#   1. wait for any running runbook smoke to finish
#   2. stacker proof v3 (scaler + domain-mixed fit) — refit + 6 evals
#   3. retrieval evaluation.json regen with the exact-set headline
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] cpu_chain: $*"; }

while pgrep -f "runbook_smoke.sh" > /dev/null 2>&1; do
  log "waiting for runbook smoke"
  sleep 60
done

log "stacker proof v3 (fitted scaler + --fit_shift 0.5:2000)"
bash scripts/round4_stacker_proof.sh > /tmp/r4_stacker_v3.log 2>&1 \
  || log "WARNING: stacker proof FAILED"

log "retrieval evaluation.json regen (exact-set headline, CPU)"
RADAR_PLATFORM=cpu python -m radar_tpu.cli.evaluate_retrieval_system \
  --contribution all --synthetic --tiny --synthetic_size 5120 \
  --num_queries 256 --set retrieval.capacity=5120 \
  --output_path results/evaluation.json \
  > /tmp/r4_retr_eval.log 2>&1 \
  || log "WARNING: retrieval eval FAILED"

log "DONE"
