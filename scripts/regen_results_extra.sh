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

echo "=== contribution 3.3: grounding/hallucination ablation"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --num_samples 128 \
  --grounding \
  --output_path results/pipeline_evaluation_grounded.json

echo "=== contribution 3.2: multi-task expert (train + comparison row)"
python -m radar_tpu.cli.train_expert_models --model_type multitask \
  --synthetic --tiny --synthetic_size 1024 --context_leak_fraction 0.5 \
  --set train.eval_batch_size=256 --epochs 6
python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --tiny --synthetic_size 4096 \
  --set train.eval_batch_size=256 \
  --output_path results/expert_model_comparison.json

echo "=== contribution 3.1: temporal comparator (train + eval)"
python -m radar_tpu.cli.train_temporal --synthetic --tiny \
  --synthetic_size 1024 --epochs 6 \
  --output_path results/temporal_evaluation.json
