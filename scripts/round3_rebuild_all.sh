#!/usr/bin/env bash
# Round-3 full rebuild: the session VM restart wiped ./checkpoints/
# (gitignored) and the jax compile cache, so every TPU artifact chain
# has to re-derive its checkpoints before the two pending stages
# (round-3f ensemble regen + P5.1 quality preset) can run.
#
# Serial on the one v5e chip, highest-value first:
#   1. tiny experts the round-3f ensemble needs (gnn, uncertainty,
#      contrastive) at the 4096x16 leak-0.25 budget
#   2. tiny retrieval system (round-3d recipe: diagonal objective,
#      embedder 16 / LM 12 epochs)
#   3. retrieval evaluation.json (ties the artifact to these ckpts)
#   4. round-3f regen (ensemble headline + gnn-solo loop ablation +
#      shifted witness + b64 serving)
#   5. quality-preset chain (P5.1 — the VERDICT r2 "missing #3" item)
#   6. remaining experts (baseline, multitask) + the three comparison
#      artifacts + temporal comparator (consistency regens; the
#      checked-in versions came from the identical recipe)
# Every train stage resumes per-epoch, so tpu_retry watchdog kills on
# relay stalls are cheap.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] $*"; }

TRAIN="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

log "stage 1: tiny experts (gnn uncertainty contrastive)"
for m in gnn uncertainty contrastive; do
  extra=""
  [ "$m" = contrastive ] && extra="--pretrain --pretrain_epochs 4"
  log "  train $m"
  bash $R "/tmp/rb_exp_$m.log" 420 6 \
    python -m radar_tpu.cli.train_expert_models --model_type "$m" \
    $TRAIN --epochs 16 $extra --resume || log "WARNING: $m FAILED"
done

log "stage 2: tiny retrieval system"
bash $R /tmp/rb_retr.log 600 4 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TRAIN --set retrieval.objective=diagonal \
  --epochs 3 --embedder_epochs 16 --lm_epochs 12 \
  || log "WARNING: retrieval train FAILED"

log "stage 3: retrieval evaluation.json"
bash $R /tmp/rb_retr_eval.log 600 3 \
  python -m radar_tpu.cli.evaluate_retrieval_system --contribution all \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 \
  --output_path results/evaluation.json \
  || log "WARNING: retrieval eval FAILED"

log "stage 4: round-3f regen"
bash scripts/regen_round3f_pipeline.sh >> /tmp/rb_r3f.log 2>&1 \
  || log "WARNING: round-3f regen FAILED"

log "stage 5: quality preset (P5.1)"
bash scripts/quality_pipeline_round3.sh >> /tmp/rb_quality.log 2>&1 \
  || log "WARNING: quality chain FAILED"

log "stage 5b: quality ensemble (round-3 serving config at quality)"
bash scripts/quality_ensemble_round3.sh >> /tmp/rb_quality_ens.log 2>&1 \
  || log "WARNING: quality ensemble chain FAILED"

log "stage 6: remaining experts + comparison artifacts + temporal"
for m in baseline multitask; do
  bash $R "/tmp/rb_exp_$m.log" 420 4 \
    python -m radar_tpu.cli.train_expert_models --model_type "$m" \
    $TRAIN --epochs 16 --resume || log "WARNING: $m FAILED"
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

log "DONE round3_rebuild_all"
