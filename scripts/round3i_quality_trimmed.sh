#!/usr/bin/env bash
# Round-3i: trimmed quality chain for the post-08:43-wipe rebuild.
# round3g's stage-4 budget (uncertainty 32ep) measured ~9 min/epoch
# fresh — the full 32/16/16+4 chain would run ~10 h and starve stages
# 5-8.  This trims to 16/12/12+3 (every trainer stage resumes
# per-epoch, so a later session can extend), then runs the quality
# retrieval system, leak-free comparison, the three pipeline evals and
# the ensemble serving bench — now on the dispatch-fused serving path
# (fused ensemble forward, batched conflict filter, shared neighbour
# search), so the regenerated latency breakdowns reflect shipping code.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] $*"; }

QTRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"
OUT=./checkpoints/quality/expert_models

log "stage 4 (trimmed): quality experts (uncertainty 16ep resume, gnn 12, contrastive 12+3)"
bash $R /tmp/qg_unc.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $QTRAIN --epochs 16 --resume --output_dir $OUT \
  || log "WARNING: quality uncertainty FAILED"
bash $R /tmp/qg_gnn.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type gnn \
  $QTRAIN --epochs 12 --resume --output_dir $OUT \
  || log "WARNING: quality gnn FAILED"
bash $R /tmp/qg_con.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type contrastive \
  $QTRAIN --epochs 12 --pretrain --pretrain_epochs 3 --resume \
  --output_dir $OUT \
  || log "WARNING: quality contrastive FAILED"

log "stage 5: quality retrieval system"
bash $R /tmp/qg_retr.log 1200 4 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $QTRAIN --epochs 3 --embedder_epochs 12 --lm_epochs 10 \
  --output_dir ./checkpoints/quality/retrieval_system \
  || log "WARNING: quality retrieval FAILED"

log "stage 6: quality expert comparison (leak-free)"
bash $R /tmp/qg_cmp.log 1200 3 \
  python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --synthetic_size 4096 --context_leak_fraction 0.0 \
  --set train.eval_batch_size=128 --checkpoint_dir $OUT \
  --output_path results/expert_model_comparison_quality_leakfree.json \
  || log "WARNING: quality comparison FAILED"

ENS="--ensemble_expert uncertainty:$OUT/uncertainty \
  --ensemble_expert contrastive:$OUT/contrastive"
PIPE="--synthetic --synthetic_size 1024 --num_samples 64 \
  --passages 1024 --set retrieval.capacity=1024 \
  --model_type gnn --expert_checkpoint $OUT/gnn \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system"

run_pipe() {  # run_pipe <name> <extra args...>
  local name=$1; shift
  log "stage 7: quality pipeline eval: $name"
  bash $R "/tmp/qg_pipe_$name.log" 1800 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS "$@" \
    --output_path "results/pipeline_evaluation_$name.json" \
    || log "WARNING: pipeline eval $name FAILED"
}

run_pipe quality
run_pipe quality_leakfree --leakage_free
run_pipe quality_leakfree_grounded --leakage_free --grounding

log "stage 8: quality serving throughput (ensemble)"
bash $R /tmp/qg_serving.log 1800 3 \
  python -m radar_tpu.cli.bench_serving --synthetic --synthetic_size 1024 \
  --model_type gnn --expert_checkpoint $OUT/gnn $ENS \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system \
  --passages 1024 --serve_batch 64 --num_batches 3 \
  --output results/serving_throughput_quality.json \
  || log "WARNING: quality serving FAILED"

log "stage 9 (if time allowed): tiny baseline/multitask + comparison regens + temporal"
TINY="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"
for m in baseline multitask; do
  bash $R "/tmp/rg_exp_$m.log" 420 4 \
    python -m radar_tpu.cli.train_expert_models --model_type "$m" \
    $TINY --epochs 16 --resume || log "WARNING: $m FAILED"
done
CMP="--test_all --synthetic --tiny --synthetic_size 4096 \
  --set train.eval_batch_size=256"
bash $R /tmp/rg_cmp.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models $CMP \
  --output_path results/expert_model_comparison.json \
  || log "WARNING: comparison (leaky) FAILED"
bash $R /tmp/rg_cmp_lf.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models $CMP \
  --context_leak_fraction 0.0 \
  --output_path results/expert_model_comparison_leakfree.json \
  || log "WARNING: comparison (leak-free) FAILED"
bash $R /tmp/rg_temporal.log 600 3 \
  python -m radar_tpu.cli.train_temporal --synthetic --tiny \
  --synthetic_size 4096 --epochs 16 --eval_natural_rates \
  --output_path results/temporal_evaluation.json \
  || log "WARNING: temporal FAILED"

log "DONE round3i_quality_trimmed"
