#!/usr/bin/env bash
# CPU variant of round5_shipping_retrieval.sh — runs the full shipping
# tiny-retrieval retrain + every CPU-side regen in parallel with the
# TPU quality chain (relay stalls pushed the serial plan past the
# round window).  The two TPU pipeline evals it omits are appended to
# scripts/round5_tpu_post_chain.sh instead.
set -uo pipefail
cd "$(dirname "$0")/.."
export RADAR_PLATFORM=cpu
log() { echo "[$(date +%H:%M:%S)] r5ship-cpu: $*"; }

RECIPE="--set retrieval.objective=exact --set retrieval.obs_head=true \
  --set retrieval.obs_head_weight=2.0"
TINY="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

log "retrain shipping retrieval system (CPU, pilot-3 recipe)"
python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TINY $RECIPE --epochs 3 --embedder_epochs 32 --lm_epochs 12 \
  --output_dir ./checkpoints/retrieval_system \
  > /tmp/r5_ship_retr.log 2>&1 || exit 1
touch checkpoints/.stamps/tiny_retrieval.done

log "retrieval headline eval (alpha 0.9 hybrid image queries)"
python -m radar_tpu.cli.evaluate_retrieval_system --contribution all \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 --set retrieval.hybrid_alpha=0.9 \
  --output_path results/evaluation.json \
  > /tmp/r5_ship_eval.log 2>&1 || log "WARNING: eval FAILED"

log "stackers + 9-cell leak-free grid (fits + stacker cells)"
bash scripts/round4_stacker_proof.sh > /tmp/r5_ship_grid.log 2>&1 \
  || log "WARNING: grid regen FAILED"

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type gnn --expert_checkpoint ./checkpoints/expert_models/gnn"
ENS="--ensemble_expert uncertainty:./checkpoints/expert_models/uncertainty \
  --ensemble_expert contrastive:./checkpoints/expert_models/contrastive"
SHIFT="--synthetic_noise 0.5 --synthetic_shift_seed 1000"

log "veto baselines (natural + shifted + gnnsolo + singlepass)"
(
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

log "DONE round5_shipping_retrieval_cpu"
