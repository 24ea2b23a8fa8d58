#!/usr/bin/env bash
# Round-2b decoder retune: noise-matched validated-observation lines
# (make_pipeline_lm_examples obs_drop/obs_add), 4x the training metas
# and leak fraction 0.25, so the decoder LEARNS to write the expert's
# validated observations instead of memorizing leaky contexts (the
# round-2 leak-free failure: pipeline obs-F1 0.22 while the expert
# gate ran at 0.6 — the decoder ignored the validated line
# off-distribution).  Then regenerate every pipeline artifact.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== retrain decoder LM (noisy validated lines, 4096 metas)"
python -m radar_tpu.cli.train_retrieval_system --contribution 2.3 \
  --synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256 --epochs 3 --lm_epochs 12

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/expert_models/uncertainty"

echo "=== pipeline eval: blind"
python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation.json
echo "=== pipeline eval: leakage-free contexts"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --output_path results/pipeline_evaluation_leakfree.json
echo "=== pipeline eval: grounding"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --grounding \
  --output_path results/pipeline_evaluation_grounded.json
echo "=== pipeline eval: single-pass ablation"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --max_iterations 1 \
  --output_path results/pipeline_evaluation_singlepass.json
echo "=== pipeline eval: reference-guided"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --use_reference \
  --output_path results/pipeline_evaluation_guided.json
echo "=== pipeline eval: 3-sample verification (temperature 0.7)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --num_samples 32 \
  --verify_samples 3 --temperature 0.7 \
  --output_path results/pipeline_evaluation_verified.json

echo "=== DONE retune_lm_noisy"
