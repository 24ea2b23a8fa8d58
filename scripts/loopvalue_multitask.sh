#!/usr/bin/env bash
# Loop-value-vs-expert-strength witness (round-3, VERDICT r2 #1).
#
# DESIGN.md's ceiling analysis argues the RAG loop's gain over
# single-pass is bounded by the EXPERT'S MISSES (the corroboration
# channel can only rescue observations the expert stage failed to
# surface).  The checked-in witnesses so far measure progressively
# stronger experts: 3-expert ensemble +1.3pp micro-F1, gnn-solo
# +0.9pp.  This script adds the weak-end data point: the multitask
# expert (leak-free macro-F1 0.817, weakest of the five —
# expert_model_comparison_leakfree.json), solo, leak-free, loop vs
# single-pass.  If the ceiling analysis is right the gap widens here.
#
# Runs on CPU (RADAR_PLATFORM=cpu) so it never contends with TPU
# chains; needs the tiny multitask checkpoint from stage 9 of
# scripts/round3i_quality_trimmed.sh (or round3_rebuild_all.sh).
set -uo pipefail
cd "$(dirname "$0")/.."
export RADAR_PLATFORM=cpu

CKPT=./checkpoints/expert_models/multitask
if [ ! -d "$CKPT" ]; then
  echo "missing $CKPT — run the tiny multitask training first" >&2
  exit 1
fi

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type multitask --expert_checkpoint $CKPT"

python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --output_path results/pipeline_evaluation_leakfree_mtsolo.json
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --max_iterations 1 \
  --output_path results/pipeline_evaluation_leakfree_mtsolo_singlepass.json

python - <<'EOF'
import json
for n in ("leakfree_mtsolo_singlepass", "leakfree_mtsolo"):
    d = json.load(open(f"results/pipeline_evaluation_{n}.json"))
    print(f"{n:32s} bleu4={d['bleu_4']:.4f} "
          f"microF1={d['observation_micro_f1']:.4f} "
          f"halluc={d['hallucination_rate']:.3f}")
EOF
echo "DONE loopvalue_multitask"
