#!/usr/bin/env bash
# Round-2 extras not covered by retune_lm.sh: the 64k-row index QPS
# artifact and the contribution 3.1/3.2 training + eval artifacts.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== retrieval index throughput (64k rows, b256 queries)"
python -m radar_tpu.cli.bench_retrieval --capacity 65536 \
  --query_batch 256 --output results/retrieval_throughput.json

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

ls -la results/
