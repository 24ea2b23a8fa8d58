#!/usr/bin/env bash
# Regenerate every measured artifact in results/ (round-2 scales).
#
# Scales (VERDICT round-1 asked for eval sets ~2 orders larger than the
# round-1 toys): expert eval 1024 held-out studies, retrieval eval 5120
# passages / 256 queries, pipeline eval 128 studies over a 5120-passage
# index, plus single-pass and leakage-free ablations.
#
# Runs on whatever jax.devices() offers (the real TPU chip on this
# host). End-to-end ~15-30 min, dominated by first compiles.
set -euo pipefail
cd "$(dirname "$0")/.."

# Relay note: steady-state tiny-config steps are ~90 ms at bs=8 (the
# slow part is the first compile, not the per-step RPC); keep the
# small batch — quality tracks step count — and speed up only eval.
TRAIN="--synthetic --tiny --synthetic_size 1024 --context_leak_fraction 0.5 \
  --set train.eval_batch_size=256"

for m in baseline uncertainty gnn contrastive; do
  extra=""
  [ "$m" = contrastive ] && extra="--pretrain --pretrain_epochs 2"
  echo "=== train expert: $m"
  python -m radar_tpu.cli.train_expert_models --model_type "$m" \
    $TRAIN --epochs 6 $extra
done

echo "=== evaluate experts (1024 held-out studies)"
python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --tiny --synthetic_size 4096 \
  --set train.eval_batch_size=256 \
  --output_path results/expert_model_comparison.json

echo "=== train retrieval system (embedder + fusion + decoder LM)"
python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TRAIN --epochs 3

echo "=== evaluate retrieval (5120 passages, 256 queries)"
python -m radar_tpu.cli.evaluate_retrieval_system --contribution all \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 \
  --output_path results/evaluation.json

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/expert_models/uncertainty"

echo "=== pipeline eval: blind"
python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation.json
echo "=== pipeline eval: reference-guided"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --use_reference \
  --output_path results/pipeline_evaluation_guided.json
echo "=== pipeline eval: single-pass ablation"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --max_iterations 1 \
  --output_path results/pipeline_evaluation_singlepass.json
echo "=== pipeline eval: leakage-free contexts"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --output_path results/pipeline_evaluation_leakfree.json

bash scripts/regen_results_extra.sh

echo "=== done; results/:"
ls -la results/
