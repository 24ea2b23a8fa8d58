#!/usr/bin/env bash
# Round-5 final TPU sequence: bring the QUALITY retrieval system up to
# the round-5 recipe and re-evidence the quality preset.
#
# Diagnosis (results/pipeline_evaluation_quality_leakfree.json, fresh
# 02:41 regen): quality leak-free micro-F1 0.620 / halluc 0.238 with
# the loop never firing — while the quality EXPERTS now sit at
# 0.87-0.94 leak-free macro-F1.  The tiny preset had the same shape
# until the round-5 retrieval rebuild (exact objective + obs head)
# lifted leak-free 0.803 -> 0.845 and halluc 0.105 -> 0.060: weak
# image neighbours starve the corroboration channel and the mention
# veto.  The quality retrieval system still runs the OLD recipe
# (diagonal, 12 embedder epochs, no obs head) — upgrade it, longer LM.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] r5qup: $*"; }

RECIPE="--set retrieval.objective=exact --set retrieval.obs_head=true \
  --set retrieval.obs_head_weight=2.0"
QTRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"
QOUT=./checkpoints/quality/retrieval_system

log "retrain quality retrieval system (round-5 recipe)"
bash $R /tmp/r5_qup_retr.log 1200 4 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $QTRAIN $RECIPE --epochs 3 --embedder_epochs 24 --lm_epochs 14 \
  --output_dir $QOUT || exit 1
touch checkpoints/.stamps/quality_retrieval.done

QEXP=./checkpoints/quality/expert_models
ENS="--ensemble_expert uncertainty:$QEXP/uncertainty \
  --ensemble_expert contrastive:$QEXP/contrastive"
PIPE="--synthetic --synthetic_size 1024 --num_samples 64 \
  --passages 1024 --set retrieval.capacity=1024 \
  --model_type gnn --expert_checkpoint $QEXP/gnn \
  --retrieval_checkpoint $QOUT"

log "quality pipeline evals (leak-free + grounded + blind)"
bash $R /tmp/r5_qup_lf.log 1800 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free \
  --output_path results/pipeline_evaluation_quality_leakfree.json \
  || log "WARNING: quality_leakfree FAILED"
bash $R /tmp/r5_qup_lfg.log 1800 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free \
  --grounding \
  --output_path results/pipeline_evaluation_quality_leakfree_grounded.json \
  || log "WARNING: quality_leakfree_grounded FAILED"
bash $R /tmp/r5_qup_blind.log 1800 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS \
  --output_path results/pipeline_evaluation_quality.json \
  || log "WARNING: quality blind FAILED"

log "quality serving throughput (round-5 stage attribution)"
bash $R /tmp/r5_qup_serv.log 1800 3 \
  python -m radar_tpu.cli.bench_serving --synthetic --synthetic_size 1024 \
  --model_type gnn --expert_checkpoint $QEXP/gnn $ENS \
  --retrieval_checkpoint $QOUT \
  --passages 1024 --serve_batch 64 --num_batches 3 \
  --output results/serving_throughput_quality.json \
  || log "WARNING: quality serving FAILED"

log "async-serving latency sweep (tiny ensemble, round-5 warmup API)"
EXP=./checkpoints/expert_models
TENS="--ensemble_expert uncertainty:$EXP/uncertainty \
  --ensemble_expert contrastive:$EXP/contrastive"
bash $R /tmp/r5_async.log 2400 2 \
  python -m radar_tpu.cli.bench_async_serving \
  --synthetic --tiny --synthetic_size 5120 --passages 5120 \
  --set retrieval.capacity=5120 \
  --model_type gnn --expert_checkpoint $EXP/gnn $TENS \
  --retrieval_checkpoint ./checkpoints/retrieval_system \
  --serve_batch 64 --max_wait_ms 200 --max_queue 256 \
  --offered_load 8,48,72,96 --requests_per_load 224 \
  --output results/serving_async.json \
  || log "WARNING: async bench FAILED"

log "MFU: fused QKV at quality config"
bash $R /tmp/r5_mfu_fqkv.log 900 2 \
  python -m radar_tpu.cli.bench_ablate --fused_qkv \
  --output results/mfu_fused_qkv.json \
  || log "WARNING: fused-qkv MFU FAILED"

log "DONE round5_quality_retrieval_upgrade"
