#!/usr/bin/env bash
# Round-4 verdict item 3: prove the targeting stacker end-to-end.
# Fit on the held-out leak-free val split (seed 55), then run the full
# leak-free pipeline eval with --targeting_stacker on natural AND
# shifted triads, for the shipping 3-expert ensemble AND the gnn-solo
# config.  Baselines to beat (hand veto): pipeline_evaluation_leakfree
# {,_shifted,_gnnsolo}.json.  Runs entirely on CPU — the TPU relay
# stays with the quality-preset rebuild chain.
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

# domain-mixed fit: natural val (seed 55) + a shifted family (noise
# 0.5, shift seed 2000 — DISJOINT from the eval shift seed 1000) so
# the keep-rule is robust to score/vote scale shift
log "fit ensemble stacker"
python -m radar_tpu.cli.fit_targeting_stacker $PIPE $ENS --leakage_free \
  --val_seed 55 --fit_shift 0.5:2000 \
  --output ./checkpoints/targeting_stacker.json
log "fit gnn-solo stacker"
python -m radar_tpu.cli.fit_targeting_stacker $PIPE --leakage_free \
  --val_seed 55 --fit_shift 0.5:2000 \
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
log "eval: gnn-solo veto baseline, shifted (missing round-3 comparator)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free $SHIFT \
  --output_path \
  results/pipeline_evaluation_leakfree_gnnsolo_shifted.json
log "done"
