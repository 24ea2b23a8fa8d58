#!/usr/bin/env bash
# Round-3g rebuild (second VM wipe of round 3): re-derive checkpoints
# and finish the one chain the wipe killed mid-flight — the QUALITY
# preset at the shipping ensemble config (quality_ensemble_round3.sh
# stages).  Differences vs round3_rebuild_all.sh:
#   - skips the round-3f tiny regen (stage 4): those artifacts are
#     checked in and the previous post-wipe rebuild verified that the
#     deterministic recipe reproduces them;
#   - quality gnn/contrastive use the trimmed 16/16+4 epoch budget
#     (quality_ensemble_trimmed.sh rationale) so the whole chain fits
#     a single session even on a slow relay night; every train stage
#     resumes per-epoch, so a later session can extend with --resume.
# Order: tiny first (fast; unblocks CPU-side experiments), then the
# quality chain (the long pole), then stage-6 consistency regens.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] $*"; }

TINY="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

log "stage 1: tiny experts (gnn uncertainty contrastive)"
for m in gnn uncertainty contrastive; do
  extra=""
  [ "$m" = contrastive ] && extra="--pretrain --pretrain_epochs 4"
  log "  train $m"
  bash $R "/tmp/rg_exp_$m.log" 420 6 \
    python -m radar_tpu.cli.train_expert_models --model_type "$m" \
    $TINY --epochs 16 $extra --resume || log "WARNING: $m FAILED"
done

log "stage 2: tiny retrieval system"
bash $R /tmp/rg_retr.log 600 4 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TINY --set retrieval.objective=diagonal \
  --epochs 3 --embedder_epochs 16 --lm_epochs 12 \
  || log "WARNING: retrieval train FAILED"

log "stage 3: retrieval evaluation.json"
bash $R /tmp/rg_retr_eval.log 600 3 \
  python -m radar_tpu.cli.evaluate_retrieval_system --contribution all \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 \
  --output_path results/evaluation.json \
  || log "WARNING: retrieval eval FAILED"

QTRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"
OUT=./checkpoints/quality/expert_models

log "stage 4: quality experts (uncertainty 32ep, gnn 16ep, contrastive 16+4)"
bash $R /tmp/qg_unc.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $QTRAIN --epochs 32 --resume --output_dir $OUT \
  || log "WARNING: quality uncertainty FAILED"
bash $R /tmp/qg_gnn.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type gnn \
  $QTRAIN --epochs 16 --resume --output_dir $OUT \
  || log "WARNING: quality gnn FAILED"
bash $R /tmp/qg_con.log 1200 6 \
  python -m radar_tpu.cli.train_expert_models --model_type contrastive \
  $QTRAIN --epochs 16 --pretrain --pretrain_epochs 4 --resume \
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

log "stage 9: tiny baseline/multitask + comparison artifacts + temporal"
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
bash $R /tmp/rg_cmp_shift.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models $CMP \
  --context_leak_fraction 0.0 \
  --synthetic_noise 0.5 --synthetic_shift_seed 1000 \
  --output_path results/expert_model_comparison_shifted.json \
  || log "WARNING: comparison (shifted) FAILED"
bash $R /tmp/rg_temporal.log 600 3 \
  python -m radar_tpu.cli.train_temporal --synthetic --tiny \
  --synthetic_size 4096 --epochs 16 --eval_natural_rates \
  --output_path results/temporal_evaluation.json \
  || log "WARNING: temporal FAILED"

log "DONE round3g_rebuild"
