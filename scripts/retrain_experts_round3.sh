#!/usr/bin/env bash
# Round-3 leak-free expert closing pass (VERDICT r2 next-round #2):
# retrain baseline/gnn/contrastive/multitask at the 4096x16 budget that
# took uncertainty's leak-free macro-F1 0.35 -> 0.91, with the round-3
# recipe fixes: image<->REPORT contrastive pretraining (the context is
# generic in 75% of leak-0.25 samples, so context-paired InfoNCE had
# nothing label-bearing to align) and universal val-fitted per-class
# decision thresholds (calibration.json).  Then regenerate both expert
# comparison artifacts (leaky + leak-free).
set -euo pipefail
cd "$(dirname "$0")/.."

TRAIN="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

for m in baseline gnn multitask contrastive; do
  extra=""
  [ "$m" = contrastive ] && extra="--pretrain --pretrain_epochs 4"
  echo "=== train expert (round-3): $m"
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

echo "=== DONE retrain_experts_round3"
