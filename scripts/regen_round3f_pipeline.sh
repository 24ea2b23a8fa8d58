#!/usr/bin/env bash
# Round-3f: final pipeline artifact regen at the round-3 serving
# config — 3-expert probability-averaged ensemble (gnn primary +
# uncertainty + contrastive) with precision-tuned corroboration
# defaults (10/6/0.35).  Also checks in a gnn-solo loop-vs-singlepass
# ablation pair: the VERDICT-#1 witness that the RAG loop beats
# single-pass leak-free, at the expert strength where the channel has
# the most to rescue.
set -uo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

ENS="--ensemble_expert uncertainty:./checkpoints/expert_models/uncertainty \
  --ensemble_expert contrastive:./checkpoints/expert_models/contrastive"

PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type gnn \
  --expert_checkpoint ./checkpoints/expert_models/gnn"

run_pipe() {  # run_pipe <name> <extra args...>
  local name=$1; shift
  echo "=== pipeline eval: $name  ($(date))"
  bash $R "/tmp/r3f_pipe_$name.log" 900 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS "$@" \
    --output_path "results/pipeline_evaluation_$name.json"
}

run_pipe leakfree_grounded --leakage_free --grounding
run_pipe leakfree --leakage_free
run_pipe leakfree_singlepass --leakage_free --max_iterations 1
run_pipe grounded --grounding
run_pipe singlepass --max_iterations 1
run_pipe guided --use_reference
run_pipe verified --num_samples 32 --verify_samples 3 --temperature 0.7
echo "=== pipeline eval: blind  ($(date))"
bash $R /tmp/r3f_pipe_blind.log 900 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS \
  --output_path results/pipeline_evaluation.json

# distribution-shift robustness witness (noise 0.5 vs trained 0.35,
# unseen seed family): end-to-end leak-free + grounding under shift
run_pipe leakfree_grounded_shifted --leakage_free --grounding \
  --synthetic_noise 0.5 --synthetic_shift_seed 1000

# shifted loop-vs-singlepass ablation: under shift the experts are
# weaker (0.75-0.87 macro-F1, expert_model_comparison_shifted.json),
# so this is where the retrieval channel has the most to rescue —
# the strongest loop-value witness
run_pipe leakfree_shifted --leakage_free \
  --synthetic_noise 0.5 --synthetic_shift_seed 1000
run_pipe leakfree_shifted_singlepass --leakage_free --max_iterations 1 \
  --synthetic_noise 0.5 --synthetic_shift_seed 1000

# gnn-solo loop ablation pair (no ensemble): the loop-value witness
echo "=== pipeline eval: gnn-solo loop ablation  ($(date))"
bash $R /tmp/r3f_pipe_abl_loop.log 900 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --output_path results/pipeline_evaluation_leakfree_gnnsolo.json
bash $R /tmp/r3f_pipe_abl_sp.log 900 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --max_iterations 1 \
  --output_path results/pipeline_evaluation_leakfree_gnnsolo_singlepass.json

# batched serving throughput at the ensemble config
echo "=== serving throughput (ensemble)  ($(date))"
bash $R /tmp/r3f_serving.log 900 3 \
  python -m radar_tpu.cli.bench_serving --synthetic --tiny \
  --synthetic_size 5120 --model_type gnn \
  --expert_checkpoint ./checkpoints/expert_models/gnn $ENS \
  --passages 5120 --set retrieval.capacity=5120 \
  --serve_batch 64 --num_batches 3 \
  --output results/serving_throughput_b64.json

python - <<'EOF'
import json
rows = [("leakfree_singlepass",), ("leakfree",), ("leakfree_grounded",),
        ("singlepass",), ("",), ("guided",), ("grounded",), ("verified",),
        ("leakfree_grounded_shifted",),
        ("leakfree_shifted_singlepass",), ("leakfree_shifted",),
        ("leakfree_gnnsolo_singlepass",), ("leakfree_gnnsolo",)]
for (n,) in rows:
    f = f"results/pipeline_evaluation{'_'+n if n else ''}.json"
    d = json.load(open(f))
    print(f"{n or 'blind':30s} bleu4={d['bleu_4']:.4f} "
          f"microF1={d['observation_micro_f1']:.4f} "
          f"halluc={d.get('hallucination_rate', float('nan')):.3f}")
EOF
echo "=== DONE regen_round3f_pipeline ($(date))"
