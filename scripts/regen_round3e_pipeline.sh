#!/usr/bin/env bash
# Round-3e: regenerate every pipeline artifact after (a) the
# mention-level cross-modal veto in the grounding pass, (b) decision
# veto defaults 0.6/7 -> 0.7/6, (c) the greedy-anchored verification
# pool.  Checkpoints are unchanged — evals only.
set -euo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/expert_models/uncertainty"

run_pipe() {  # run_pipe <name> <extra args...>
  local name=$1; shift
  echo "=== pipeline eval: $name"
  bash $R "/tmp/r3e_pipe_$name.log" 900 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE "$@" \
    --output_path "results/pipeline_evaluation_$name.json"
}

run_pipe leakfree_grounded --leakage_free --grounding
run_pipe leakfree --leakage_free
run_pipe leakfree_singlepass --leakage_free --max_iterations 1
run_pipe grounded --grounding
run_pipe singlepass --max_iterations 1
run_pipe guided --use_reference
run_pipe verified --num_samples 32 --verify_samples 3 --temperature 0.7
echo "=== pipeline eval: blind (informative)"
bash $R /tmp/r3e_pipe_blind.log 900 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation.json

python - <<'EOF'
import json
for n in ("leakfree_singlepass","leakfree","leakfree_grounded",
          "singlepass","","guided","grounded","verified"):
    f = f"results/pipeline_evaluation{'_'+n if n else ''}.json"
    d = json.load(open(f))
    print(f"{n or 'blind':22s} bleu4={d['bleu_4']:.4f} "
          f"microF1={d['observation_micro_f1']:.4f} "
          f"halluc={d['hallucination_rate']:.3f}")
EOF
echo "=== DONE regen_round3e_pipeline"
