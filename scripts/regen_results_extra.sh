#!/usr/bin/env bash
# Round-2 additions to regen_results.sh (kept separate so they can run
# after the main regen without re-training): the stochastic N-sample
# verification artifact and the 64k-passage retrieval-QPS artifact.
set -euo pipefail
cd "$(dirname "$0")/.."

PIPE="--synthetic --tiny --synthetic_size 5120 --passages 5120 \
  --set retrieval.capacity=5120 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/expert_models/uncertainty"

echo "=== pipeline eval: 3-sample verification at temperature 0.7"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --num_samples 32 \
  --verify_samples 3 --temperature 0.7 \
  --output_path results/pipeline_evaluation_verified.json

echo "=== retrieval index throughput (64k rows, b256 queries)"
python -m radar_tpu.cli.bench_retrieval --capacity 65536 \
  --query_batch 256 --output results/retrieval_throughput.json
