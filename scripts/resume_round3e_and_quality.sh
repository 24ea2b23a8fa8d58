#!/usr/bin/env bash
# Resume round-3e regen (informative-mode evals that the prior session
# lost mid-run) and then chain the P5.1 quality-preset pipeline, so
# the single TPU chip is used serially end-to-end.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/expert_models/uncertainty"

run_pipe() {  # run_pipe <name> <extra args...>
  local name=$1; shift
  echo "=== pipeline eval: $name  ($(date))"
  bash $R "/tmp/r3e_pipe_$name.log" 900 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE "$@" \
    --output_path "results/pipeline_evaluation_$name.json"
}

run_pipe grounded --grounding
run_pipe singlepass --max_iterations 1
run_pipe guided --use_reference
run_pipe verified --num_samples 32 --verify_samples 3 --temperature 0.7
echo "=== pipeline eval: blind (informative)  ($(date))"
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
          f"halluc={d.get('hallucination_rate', float('nan')):.3f}")
EOF
echo "=== DONE round-3e remainder ($(date)); starting quality preset"

bash scripts/quality_pipeline_round3.sh
echo "=== DONE resume_round3e_and_quality ($(date))"
