#!/usr/bin/env bash
# Round-3k (optional, time-permitting): push the quality experts past
# the round-3 32/24/24 budget — val macro-F1 was still climbing at the
# old ceiling (0.653@16 -> 0.671@19, quality_ensemble_round3.sh), and
# the quality-preset LEAK-FREE pipeline (micro-F1 0.576 at 32/24/24)
# trails the tiny preset (0.803) precisely because leak-free mode
# leans on the image pathway the extra epochs train.  Extends to
# 48/36/36 with per-epoch resume, then regens the leak-free artifacts
# (informative metrics are leak-dominated and barely move).
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] $*"; }

TRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"
OUT=./checkpoints/quality/expert_models

log "stage A: quality experts -> extended budget (unc 48, gnn 36, con 36)"
bash $R /tmp/qk_unc.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $TRAIN --epochs 48 --resume --output_dir $OUT \
  || log "WARNING: uncertainty extend FAILED"
bash $R /tmp/qk_gnn.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type gnn \
  $TRAIN --epochs 36 --resume --output_dir $OUT \
  || log "WARNING: gnn extend FAILED"
bash $R /tmp/qk_con.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type contrastive \
  $TRAIN --epochs 36 --pretrain --pretrain_epochs 4 --resume \
  --output_dir $OUT \
  || log "WARNING: contrastive extend FAILED"

log "stage B: quality expert comparison (leak-free)"
bash $R /tmp/qk_cmp.log 1200 3 \
  python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --synthetic_size 4096 --context_leak_fraction 0.0 \
  --set train.eval_batch_size=128 --checkpoint_dir $OUT \
  --output_path results/expert_model_comparison_quality_leakfree.json \
  || log "WARNING: comparison FAILED"

ENS="--ensemble_expert uncertainty:$OUT/uncertainty \
  --ensemble_expert contrastive:$OUT/contrastive"
PIPE="--synthetic --synthetic_size 1024 --num_samples 64 \
  --passages 1024 --set retrieval.capacity=1024 \
  --model_type gnn --expert_checkpoint $OUT/gnn \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system"

run_pipe() {
  local name=$1; shift
  log "stage C: quality pipeline eval: $name"
  bash $R "/tmp/qk_pipe_$name.log" 1800 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS "$@" \
    --output_path "results/pipeline_evaluation_$name.json" \
    || log "WARNING: pipeline eval $name FAILED"
}

run_pipe quality
run_pipe quality_leakfree --leakage_free
run_pipe quality_leakfree_grounded --leakage_free --grounding

log "DONE round3k_extend_more"
