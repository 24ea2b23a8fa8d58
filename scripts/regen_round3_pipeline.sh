#!/usr/bin/env bash
# Round-3 retrieval + pipeline artifact regen (runs after
# retrain_experts_round3.sh; TPU).
#
# - retrain the retrieval system with the round-3 objectives: embedder
#   image<->REPORT InfoNCE (image-query parity, VERDICT #5), decoder LM
#   on the new prompt contract (validated line inside regeneration
#   prompts + Findings: marker);
# - regenerate evaluation.json under the Jaccard>=0.5 relevance;
# - regenerate every pipeline artifact, including the previously
#   missing leak-free single-pass ablation (VERDICT #1) and leak-free
#   grounded run (VERDICT #4).
set -euo pipefail
cd "$(dirname "$0")/.."

TRAIN="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

echo "=== train retrieval system (embedder + fusion + decoder LM)"
python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TRAIN --epochs 3 --lm_epochs 12

echo "=== evaluate retrieval (5120 passages, 256 queries, Jaccard relevance)"
python -m radar_tpu.cli.evaluate_retrieval_system --contribution all \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 \
  --output_path results/evaluation.json

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/expert_models/uncertainty"

echo "=== pipeline eval: LEAK-FREE single-pass (the missing ablation)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --max_iterations 1 \
  --output_path results/pipeline_evaluation_leakfree_singlepass.json
echo "=== pipeline eval: leak-free loop"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --output_path results/pipeline_evaluation_leakfree.json
echo "=== pipeline eval: leak-free + grounding"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free --grounding \
  --output_path results/pipeline_evaluation_leakfree_grounded.json
echo "=== pipeline eval: blind (informative contexts)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation.json
echo "=== pipeline eval: informative single-pass"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --max_iterations 1 \
  --output_path results/pipeline_evaluation_singlepass.json
echo "=== pipeline eval: reference-guided"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --use_reference \
  --output_path results/pipeline_evaluation_guided.json
echo "=== pipeline eval: grounding (informative)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --grounding \
  --output_path results/pipeline_evaluation_grounded.json
echo "=== pipeline eval: 3-sample verification (temperature 0.7)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --num_samples 32 \
  --verify_samples 3 --temperature 0.7 \
  --output_path results/pipeline_evaluation_verified.json

echo "=== contribution 3.1: temporal comparator (round-3 budget)"
python -m radar_tpu.cli.train_temporal --synthetic --tiny \
  --synthetic_size 4096 --epochs 16 --eval_natural_rates \
  --output_path results/temporal_evaluation.json

echo "=== DONE regen_round3_pipeline"
