#!/usr/bin/env bash
# Round-3 retrieval + pipeline artifact regen (runs after the expert
# retrains; TPU; stall-tolerant via tpu_retry.sh — the axon relay
# sometimes wedges a long-lived connection and the stage must restart
# in a fresh process).
#
# - retrain the retrieval system with the round-3 objectives: embedder
#   image<->REPORT InfoNCE (image-query parity, VERDICT #5), decoder LM
#   on the new prompt contract (validated line inside regeneration
#   prompts, left-truncated, Findings: marker);
# - regenerate evaluation.json under the Jaccard>=0.5 relevance;
# - regenerate every pipeline artifact, including the previously
#   missing leak-free single-pass ablation (VERDICT #1) and leak-free
#   grounded run (VERDICT #4).
set -euo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

TRAIN="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256"

echo "=== train retrieval system (embedder + fusion + decoder LM)"
bash $R /tmp/r3_retr_train.log 600 3 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TRAIN --epochs 3 --lm_epochs 12

echo "=== evaluate retrieval (5120 passages, 256 queries, Jaccard relevance)"
bash $R /tmp/r3_retr_eval.log 600 3 \
  python -m radar_tpu.cli.evaluate_retrieval_system --contribution all \
  --synthetic --tiny --synthetic_size 5120 --num_queries 256 \
  --set retrieval.capacity=5120 \
  --output_path results/evaluation.json

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/expert_models/uncertainty"

run_pipe() {  # run_pipe <name> <extra args...>
  local name=$1; shift
  echo "=== pipeline eval: $name"
  bash $R "/tmp/r3_pipe_$name.log" 900 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE "$@" \
    --output_path "results/pipeline_evaluation_$name.json"
}

run_pipe leakfree_singlepass --leakage_free --max_iterations 1
run_pipe leakfree --leakage_free
run_pipe leakfree_grounded --leakage_free --grounding
run_pipe singlepass --max_iterations 1
run_pipe guided --use_reference
run_pipe grounded --grounding
run_pipe verified --num_samples 32 --verify_samples 3 --temperature 0.7
echo "=== pipeline eval: blind (informative)"
bash $R /tmp/r3_pipe_blind.log 900 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation.json

echo "=== contribution 3.1: temporal comparator (round-3 budget)"
bash $R /tmp/r3_temporal.log 600 3 \
  python -m radar_tpu.cli.train_temporal --synthetic --tiny \
  --synthetic_size 4096 --epochs 16 --eval_natural_rates \
  --output_path results/temporal_evaluation.json

echo "=== DONE regen_round3_pipeline"
