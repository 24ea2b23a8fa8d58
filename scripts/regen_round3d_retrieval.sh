#!/usr/bin/env bash
# Round-3d: retrain the retrieval system with WORKING cosine schedules
# (the r3c chain trained embedder/decoder with lr~0 after ~2.3 epochs —
# see lm_training.py/retrieval/training.py schedule fixes) and the
# pilot-selected embedder objective, then regenerate every downstream
# artifact: evaluation.json (Jaccard relevance) + all pipeline runs.
set -euo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

OBJ=${RADAR_EMB_OBJECTIVE:-diagonal}
EMB_EPOCHS=${RADAR_EMB_EPOCHS:-16}

TRAIN="--synthetic --tiny --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=256 --set retrieval.objective=$OBJ"

echo "=== train retrieval system (objective=$OBJ, embedder_epochs=$EMB_EPOCHS)"
bash $R /tmp/r3d_retr_train.log 600 3 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TRAIN --epochs 3 --embedder_epochs "$EMB_EPOCHS" --lm_epochs 12

echo "=== evaluate retrieval (5120 passages, 256 queries, Jaccard relevance)"
bash $R /tmp/r3d_retr_eval.log 600 3 \
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
  bash $R "/tmp/r3d_pipe_$name.log" 900 3 \
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
bash $R /tmp/r3d_pipe_blind.log 900 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation.json

echo "=== DONE regen_round3d_retrieval"
