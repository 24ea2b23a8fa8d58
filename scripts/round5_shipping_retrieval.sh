#!/usr/bin/env bash
# Round-5 verdict item 4 promotion: retrain the SHIPPING tiny
# retrieval system with the pilot-3 recipe (objective=exact +
# obs_head, weight 2.0, 32 embedder epochs — image exact-set MRR
# 0.8191 vs 0.676 shipping, text unchanged 0.871), then regenerate
# every artifact the embedder feeds:
#   * results/evaluation.json           (retrieval headline, alpha .9)
#   * targeting stackers                (fitted on embedder votes)
#   * the 9-cell leak-free pipeline grid (veto baselines + stacker)
#   * pipeline_evaluation{,_grounded,_verified}.json (TPU, fast)
# Full retrain (not embedder-only): fusion trains on embedder text
# features and the decoder trains on embedder image prefixes — both
# would silently break train/serve parity under an embedder swap.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] r5ship: $*"; }

RECIPE="--set retrieval.objective=exact --set retrieval.obs_head=true \
  --set retrieval.obs_head_weight=2.0"
TINY="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

log "retrain shipping retrieval system (TPU, pilot-3 recipe)"
bash $R /tmp/r5_ship_retr.log 900 4 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TINY $RECIPE --epochs 3 --embedder_epochs 32 --lm_epochs 12 \
  --output_dir ./checkpoints/retrieval_system || exit 1

log "retrieval headline eval (alpha 0.9 hybrid image queries)"
bash $R /tmp/r5_ship_eval.log 900 3 \
  python -m radar_tpu.cli.evaluate_retrieval_system --contribution all \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 --set retrieval.hybrid_alpha=0.9 \
  --output_path results/evaluation.json || log "WARNING: eval FAILED"

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type gnn --expert_checkpoint ./checkpoints/expert_models/gnn"
ENS="--ensemble_expert uncertainty:./checkpoints/expert_models/uncertainty \
  --ensemble_expert contrastive:./checkpoints/expert_models/contrastive"

log "pipeline evals against the new retrieval system (TPU)"
bash $R /tmp/r5_ship_pe.log 1200 2 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS \
  --output_path results/pipeline_evaluation.json \
  || log "WARNING: pipeline_evaluation FAILED"
bash $R /tmp/r5_ship_pe_g.log 1200 2 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --grounding \
  --output_path results/pipeline_evaluation_grounded.json \
  || log "WARNING: pipeline_evaluation_grounded FAILED"

log "CPU regen: stackers + 9-cell leak-free grid"
RADAR_PLATFORM=cpu bash scripts/round4_stacker_proof.sh \
  > /tmp/r5_ship_grid.log 2>&1 || log "WARNING: grid regen FAILED"
log "CPU regen: veto baselines (natural + shifted + singlepass)"
(
  export RADAR_PLATFORM=cpu
  SHIFT="--synthetic_noise 0.5 --synthetic_shift_seed 1000"
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free \
    --output_path results/pipeline_evaluation_leakfree.json
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free \
    $SHIFT --output_path results/pipeline_evaluation_leakfree_shifted.json
  python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
    --output_path results/pipeline_evaluation_leakfree_gnnsolo.json
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free \
    --max_iterations 1 \
    --output_path results/pipeline_evaluation_leakfree_singlepass.json
) > /tmp/r5_ship_veto.log 2>&1 || log "WARNING: veto regen FAILED"

log "DONE round5_shipping_retrieval"
