#!/usr/bin/env bash
# Round-5 verdict item 4 pilot (CPU): does the "exact" embedder
# objective (duplicate-masked diagonal InfoNCE + own-pair ranking
# hinge on near-miss label sets, models/losses.exact_ranking_infonce)
# close the image-query gap at the EXACT-set relevance headline
# (image MRR 0.676 vs text 0.871, results/evaluation.json) without
# regressing text MRR?  Trains ONLY the embedder (--contribution 2.1)
# into a throwaway dir and evaluates 2.1 at the headline scale.
set -uo pipefail
cd "$(dirname "$0")/.."
export RADAR_PLATFORM=cpu
log() { echo "[$(date +%H:%M:%S)] retr_pilot: $*"; }

PILOT=./checkpoints/r5_pilot_exact
log "train embedder (objective=exact, 16 epochs, CPU)"
python -m radar_tpu.cli.train_retrieval_system --contribution 2.1 \
  --synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set retrieval.objective=exact --embedder_epochs 16 \
  --output_dir $PILOT

log "eval 2.1 at headline scale (5120 passages / 256 queries)"
python -m radar_tpu.cli.evaluate_retrieval_system --contribution 2.1 \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 --checkpoint_dir $PILOT \
  --output_path results/retrieval_pilot_exact.json

log "DONE"
