#!/usr/bin/env bash
# Final leg of the round-3 expert retrains, stall-tolerant: resume the
# contrastive run (relay wedged it at epoch 5/16), then regenerate both
# comparison artifacts, then chain the retrieval+pipeline regen.
set -euo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

TRAIN="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

bash $R /tmp/r3c_contrastive.log 420 4 \
  python -m radar_tpu.cli.train_expert_models --model_type contrastive \
  $TRAIN --epochs 16 --pretrain --pretrain_epochs 4 --resume

bash $R /tmp/r3c_cmp.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --tiny --synthetic_size 4096 \
  --set train.eval_batch_size=256 \
  --output_path results/expert_model_comparison.json

bash $R /tmp/r3c_cmp_leakfree.log 600 3 \
  python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --tiny --synthetic_size 4096 \
  --context_leak_fraction 0.0 \
  --set train.eval_batch_size=256 \
  --output_path results/expert_model_comparison_leakfree.json

echo "=== DONE retrain_experts_round3c"
