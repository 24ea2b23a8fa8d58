#!/usr/bin/env bash
# Round-5 verdict item 5: refit both targeting stackers with the v3
# shift-invariant rank features AND the minimax tau sweep (--fit_tau:
# worst-domain micro-F1 subject to per-domain precision >= hand veto),
# then re-run the four stacker grid cells.  Veto baselines unchanged.
set -uo pipefail
cd "$(dirname "$0")/.."
export RADAR_PLATFORM=cpu

ENS="--ensemble_expert uncertainty:./checkpoints/expert_models/uncertainty \
  --ensemble_expert contrastive:./checkpoints/expert_models/contrastive"
PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type gnn \
  --expert_checkpoint ./checkpoints/expert_models/gnn"

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "fit ensemble stacker (fit_tau)"
python -m radar_tpu.cli.fit_targeting_stacker $PIPE $ENS --leakage_free \
  --val_seed 55 --fit_shift 0.5:2000 --fit_tau \
  --output ./checkpoints/targeting_stacker.json
log "fit gnn-solo stacker (fit_tau)"
python -m radar_tpu.cli.fit_targeting_stacker $PIPE --leakage_free \
  --val_seed 55 --fit_shift 0.5:2000 --fit_tau \
  --output ./checkpoints/targeting_stacker_gnnsolo.json

ST="--targeting_stacker ./checkpoints/targeting_stacker.json"
STS="--targeting_stacker ./checkpoints/targeting_stacker_gnnsolo.json"
SHIFT="--synthetic_noise 0.5 --synthetic_shift_seed 1000"

log "eval: ensemble stacker, natural"
python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free $ST \
  --output_path results/pipeline_evaluation_leakfree_stacker.json
log "eval: ensemble stacker, shifted"
python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free $ST \
  $SHIFT \
  --output_path results/pipeline_evaluation_leakfree_stacker_shifted.json
log "eval: gnn-solo stacker, natural"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free $STS \
  --output_path results/pipeline_evaluation_leakfree_gnnsolo_stacker.json
log "eval: gnn-solo stacker, shifted"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free $STS \
  $SHIFT \
  --output_path \
  results/pipeline_evaluation_leakfree_gnnsolo_stacker_shifted.json
log "done"
