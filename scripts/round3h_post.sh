#!/usr/bin/env bash
# Round-3h post-rebuild TPU measurements (run AFTER round3g_rebuild.sh):
#   1. async-serving latency artifact at the shipping ensemble config
#      (P6.2 — the queueing/latency witness the fixed-batch bench
#      cannot produce)
#   2. batched-serving batch-size probe (b128 vs the b64 headline)
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
log() { echo "[$(date +%H:%M:%S)] $*"; }

EXP=./checkpoints/expert_models
ENS="--ensemble_expert uncertainty:$EXP/uncertainty \
  --ensemble_expert contrastive:$EXP/contrastive"
COMMON="--synthetic --tiny --synthetic_size 5120 --passages 5120 \
  --set retrieval.capacity=5120 \
  --model_type gnn --expert_checkpoint $EXP/gnn \
  --retrieval_checkpoint ./checkpoints/retrieval_system"

log "async-serving latency sweep (ensemble serving config)"
bash $R /tmp/r3h_async.log 1800 3 \
  python -m radar_tpu.cli.bench_async_serving $COMMON $ENS \
  --serve_batch 16 --max_wait_ms 50 \
  --offered_load 4,16,64 --requests_per_load 96 \
  --output results/serving_async.json \
  || log "WARNING: async bench FAILED"

log "batched-serving b128 probe"
bash $R /tmp/r3h_b128.log 1800 3 \
  python -m radar_tpu.cli.bench_serving $COMMON $ENS \
  --serve_batch 128 --num_batches 3 \
  --output results/serving_throughput_b128.json \
  || log "WARNING: b128 probe FAILED"

log "DONE round3h_post"
