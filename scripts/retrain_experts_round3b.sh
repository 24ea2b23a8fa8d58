#!/usr/bin/env bash
# Continuation of retrain_experts_round3.sh after a relay compile
# stall killed the multitask stage: multitask + contrastive retrains,
# then both comparison artifacts.
set -euo pipefail
cd "$(dirname "$0")/.."

TRAIN="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

for m in multitask contrastive; do
  extra=""
  [ "$m" = contrastive ] && extra="--pretrain --pretrain_epochs 4"
  echo "=== train expert (round-3b): $m"
  python -m radar_tpu.cli.train_expert_models --model_type "$m" \
    $TRAIN --epochs 16 $extra
done

echo "=== evaluate experts: leaky contexts (leak 1.0)"
python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --tiny --synthetic_size 4096 \
  --set train.eval_batch_size=256 \
  --output_path results/expert_model_comparison.json

echo "=== evaluate experts: leak-free contexts"
python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --tiny --synthetic_size 4096 \
  --context_leak_fraction 0.0 \
  --set train.eval_batch_size=256 \
  --output_path results/expert_model_comparison_leakfree.json

echo "=== DONE retrain_experts_round3b"
