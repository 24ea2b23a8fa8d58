#!/usr/bin/env bash
# Round-5 TPU measurements — run AFTER scripts/round5_quality_chain.sh
# finishes (it owns the relay until then).  Ordered by value so a
# short window still lands the important evidence:
#   1. pipeline evals against the round-5 shipping retrieval system
#      (artifact coherence: the embedder swap changed the loop inputs)
#   2. async-serving sweep re-measure with the round-5 warmup API
#      (verdict item 6: light-load p95 tail; warmup rows now excluded
#      from aggregate stats, relay replay cache primed)
#   3. fused-QKV MFU experiment at the quality config (verdict item 7)
#   4. QUALITY-preset async sweep (north star: <2 s p50 end-to-end,
#      BASELINE.md row 21)
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] r5post: $*"; }

EXP=./checkpoints/expert_models
ENS="--ensemble_expert uncertainty:$EXP/uncertainty \
  --ensemble_expert contrastive:$EXP/contrastive"
COMMON="--synthetic --tiny --synthetic_size 5120 --passages 5120 \
  --set retrieval.capacity=5120 \
  --model_type gnn --expert_checkpoint $EXP/gnn \
  --retrieval_checkpoint ./checkpoints/retrieval_system"
PIPE5="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type gnn --expert_checkpoint $EXP/gnn"

log "pipeline evals against the round-5 shipping retrieval system"
bash $R /tmp/r5_ship_pe.log 1200 2 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE5 $ENS \
  --output_path results/pipeline_evaluation.json \
  || log "WARNING: pipeline_evaluation FAILED"
bash $R /tmp/r5_ship_pe_g.log 1200 2 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE5 $ENS --grounding \
  --output_path results/pipeline_evaluation_grounded.json \
  || log "WARNING: pipeline_evaluation_grounded FAILED"

log "async-serving latency sweep (round-4 settings, round-5 warmup)"
bash $R /tmp/r5_async.log 2400 3 \
  python -m radar_tpu.cli.bench_async_serving $COMMON $ENS \
  --serve_batch 64 --max_wait_ms 200 --max_queue 256 \
  --offered_load 8,48,72,96 --requests_per_load 224 \
  --output results/serving_async.json \
  || log "WARNING: async bench FAILED"

log "MFU: fused QKV at quality config"
bash $R /tmp/r5_mfu_fqkv.log 900 2 \
  python -m radar_tpu.cli.bench_ablate --fused_qkv \
  --output results/mfu_fused_qkv.json \
  || log "WARNING: fused-qkv MFU FAILED"

QEXP=./checkpoints/quality/expert_models
QENS="--ensemble_expert uncertainty:$QEXP/uncertainty \
  --ensemble_expert contrastive:$QEXP/contrastive"
QCOMMON="--synthetic --synthetic_size 1024 --passages 1024 \
  --set retrieval.capacity=1024 \
  --model_type gnn --expert_checkpoint $QEXP/gnn \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system"

log "async-serving latency sweep at the QUALITY preset (north star:"
log "  <2 s p50 end-to-end at parity quality, BASELINE.md row 21)"
bash $R /tmp/r5_async_quality.log 2400 3 \
  python -m radar_tpu.cli.bench_async_serving $QCOMMON $QENS \
  --serve_batch 64 --max_wait_ms 200 --max_queue 256 \
  --offered_load 8,24,48 --requests_per_load 128 \
  --output results/serving_async_quality.json \
  || log "WARNING: quality async bench FAILED"

log "MFU: fused QKV + 128-wide heads"
bash $R /tmp/r5_mfu_fqkv_h.log 900 2 \
  python -m radar_tpu.cli.bench_ablate --fused_qkv --vision_heads 6 \
  --output results/mfu_fused_qkv_heads.json \
  || log "WARNING: fused-qkv+heads MFU FAILED"

log "DONE round5_tpu_post_chain"
