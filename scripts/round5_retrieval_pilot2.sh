#!/usr/bin/env bash
# Round-5 verdict item 4, pilot 2 (CPU): "exact" objective + the
# image->observation head feeding the index's hybrid semantic+
# observation query score.  Pilot 1 (objective alone) moved image
# exact-set MRR only 0.676 -> 0.694: exact-set relevance needs all 13
# pathology bits right, which is a classification task — the obs head
# supplies it and embedder_meta.json lets eval auto-reconstruct.
set -uo pipefail
cd "$(dirname "$0")/.."
export RADAR_PLATFORM=cpu
log() { echo "[$(date +%H:%M:%S)] retr_pilot2: $*"; }

PILOT=./checkpoints/r5_pilot_exact_obs
log "train embedder (objective=exact + obs_head, 16 epochs, CPU)"
python -m radar_tpu.cli.train_retrieval_system --contribution 2.1 \
  --synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set retrieval.objective=exact --set retrieval.obs_head=true \
  --embedder_epochs 16 \
  --output_dir $PILOT

log "eval 2.1 at headline scale (5120 passages / 256 queries)"
python -m radar_tpu.cli.evaluate_retrieval_system --contribution 2.1 \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 --checkpoint_dir $PILOT \
  --output_path results/retrieval_pilot_exact_obs.json

log "DONE"
