#!/usr/bin/env bash
# Round-3j: extend the post-wipe trimmed quality experts back to the
# full round-3 budget (uncertainty 32 ep, gnn 24, contrastive 24+4 —
# scripts/quality_ensemble_round3.sh), then regen the quality-preset
# artifacts.  The 08:43 wipe forced a trimmed 16/12/12+3 rebuild
# (scripts/round3i_quality_trimmed.sh) whose leak-free pipeline micro-F1
# regressed 0.576 -> 0.452; every trainer resumes per-epoch, so this
# just continues.  Retrieval checkpoints reproduced bit-exact in 3i
# (informative metrics identical) — stage 5 is NOT rerun.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] $*"; }

TRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"
OUT=./checkpoints/quality/expert_models

log "stage A: quality experts -> full budget (unc 32, gnn 24, con 24+4)"
bash $R /tmp/qj_unc.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $TRAIN --epochs 32 --resume --output_dir $OUT \
  || log "WARNING: uncertainty extend FAILED"
bash $R /tmp/qj_gnn.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type gnn \
  $TRAIN --epochs 24 --resume --output_dir $OUT \
  || log "WARNING: gnn extend FAILED"
bash $R /tmp/qj_con.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type contrastive \
  $TRAIN --epochs 24 --pretrain --pretrain_epochs 4 --resume \
  --output_dir $OUT \
  || log "WARNING: contrastive extend FAILED"

log "stage B: quality expert comparison (leak-free)"
bash $R /tmp/qj_cmp.log 1200 3 \
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
  bash $R "/tmp/qj_pipe_$name.log" 1800 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS "$@" \
    --output_path "results/pipeline_evaluation_$name.json" \
    || log "WARNING: pipeline eval $name FAILED"
}

run_pipe quality
run_pipe quality_leakfree --leakage_free
run_pipe quality_leakfree_grounded --leakage_free --grounding

log "stage D: quality serving throughput (ensemble)"
bash $R /tmp/qj_serving.log 1800 3 \
  python -m radar_tpu.cli.bench_serving --synthetic --synthetic_size 1024 \
  --model_type gnn --expert_checkpoint $OUT/gnn $ENS \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system \
  --passages 1024 --serve_batch 64 --num_batches 3 \
  --output results/serving_throughput_quality.json \
  || log "WARNING: quality serving FAILED"

log "DONE round3j_extend_quality"
