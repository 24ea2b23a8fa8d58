#!/usr/bin/env bash
# Trimmed continuation of quality_ensemble_round3.sh, taken over
# mid-chain when per-epoch relay time (~8 min/epoch at 23:00) made the
# full 24/28-epoch gnn+contrastive budget overrun the round: 16-epoch
# gnn and 16+4 contrastive still give the quality-preset ensemble a
# production-scale witness, and every stage resumes, so a later round
# can extend the epoch budget with --resume and regen.
#
# Run AFTER the uncertainty 32-epoch resume has finished (it is the
# known-good trajectory: deterministic pilot hit macro-F1 0.768@32).
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] $*"; }

TRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"
OUT=./checkpoints/quality/expert_models

log "gnn (16 epochs)"
bash $R /tmp/qe_gnn.log 1200 3 \
  python -m radar_tpu.cli.train_expert_models --model_type gnn \
  $TRAIN --epochs 16 --resume --output_dir $OUT \
  || log "WARNING: gnn FAILED"

log "contrastive (16 + 4 pretrain)"
bash $R /tmp/qe_con.log 1200 3 \
  python -m radar_tpu.cli.train_expert_models --model_type contrastive \
  $TRAIN --epochs 16 --pretrain --pretrain_epochs 4 --resume \
  --output_dir $OUT \
  || log "WARNING: contrastive FAILED"

log "quality expert comparison (leak-free)"
bash $R /tmp/qe_cmp.log 1200 3 \
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

run_pipe() {  # run_pipe <name> <extra args...>
  local name=$1; shift
  log "quality pipeline eval: $name"
  bash $R "/tmp/qe_pipe_$name.log" 1800 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS "$@" \
    --output_path "results/pipeline_evaluation_$name.json" \
    || log "WARNING: pipeline eval $name FAILED"
}

run_pipe quality
run_pipe quality_leakfree --leakage_free
run_pipe quality_leakfree_grounded --leakage_free --grounding

log "quality serving throughput (ensemble)"
bash $R /tmp/qe_serving.log 1800 3 \
  python -m radar_tpu.cli.bench_serving --synthetic --synthetic_size 1024 \
  --model_type gnn --expert_checkpoint $OUT/gnn $ENS \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system \
  --passages 1024 --serve_batch 64 --num_batches 3 \
  --output results/serving_throughput_quality.json \
  || log "WARNING: serving FAILED"

log "stage 6 consistency regens (tiny baseline/multitask + comparisons + temporal)"
TINY="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"
for m in baseline multitask; do
  bash $R "/tmp/rb_exp_$m.log" 420 4 \
    python -m radar_tpu.cli.train_expert_models --model_type "$m" \
    $TINY --epochs 16 --resume || log "WARNING: $m FAILED"
done
CMP="--test_all --synthetic --tiny --synthetic_size 4096 \
  --set train.eval_batch_size=256"
bash $R /tmp/rb_cmp.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models $CMP \
  --output_path results/expert_model_comparison.json \
  || log "WARNING: comparison (leaky) FAILED"
bash $R /tmp/rb_cmp_lf.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models $CMP \
  --context_leak_fraction 0.0 \
  --output_path results/expert_model_comparison_leakfree.json \
  || log "WARNING: comparison (leak-free) FAILED"
bash $R /tmp/rb_cmp_shift.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models $CMP \
  --context_leak_fraction 0.0 \
  --synthetic_noise 0.5 --synthetic_shift_seed 1000 \
  --output_path results/expert_model_comparison_shifted.json \
  || log "WARNING: comparison (shifted) FAILED"
bash $R /tmp/rb_temporal.log 600 3 \
  python -m radar_tpu.cli.train_temporal --synthetic --tiny \
  --synthetic_size 4096 --epochs 16 --eval_natural_rates \
  --output_path results/temporal_evaluation.json \
  || log "WARNING: temporal FAILED"

log "DONE quality_ensemble_trimmed"
