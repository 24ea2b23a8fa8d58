#!/usr/bin/env bash
# Retrain the report decoder LM (longer budget + image-prefix
# conditioning) and regenerate every pipeline artifact that depends on
# it. Run after regen_results.sh; reuses the embedder/fusion/expert
# checkpoints already on disk.
set -euo pipefail
cd "$(dirname "$0")/.."

TRAIN="--synthetic --tiny --synthetic_size 1024 --context_leak_fraction 0.5 \
  --set train.eval_batch_size=256"

echo "=== retrain decoder LM (24 epochs, image prefixes)"
python -m radar_tpu.cli.train_retrieval_system --contribution 2.3 \
  $TRAIN --epochs 3 --lm_epochs 24

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
echo "=== pipeline eval: grounding ablation"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --grounding \
  --output_path results/pipeline_evaluation_grounded.json
echo "=== pipeline eval: 3-sample verification (temperature 0.7)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --num_samples 32 \
  --verify_samples 3 --temperature 0.7 \
  --output_path results/pipeline_evaluation_verified.json

ls -la results/
