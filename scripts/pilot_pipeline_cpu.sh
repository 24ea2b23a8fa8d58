#!/usr/bin/env bash
# CPU pilot of the round-3 pipeline changes (small budget, /tmp
# checkpoints): verifies the leak-free RAG loop beats single-pass and
# guided >= blind BEFORE committing TPU hours to the full regen.
set -euo pipefail
cd "$(dirname "$0")/.."
export XLA_FLAGS=--xla_force_host_platform_device_count=8
export RADAR_PLATFORM=cpu

CKPT=${CKPT:-/tmp/r3_pilot}
mkdir -p "$CKPT"
TRAIN="--synthetic --tiny --synthetic_size 1024 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128"

python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $TRAIN --epochs 6 --output_dir "$CKPT/experts"

python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TRAIN --epochs 3 --lm_epochs 8 --output_dir "$CKPT/retrieval"

PIPE="--synthetic --tiny --synthetic_size 2048 --num_samples 48 \
  --passages 2048 --set retrieval.capacity=2048 \
  --model_type uncertainty \
  --expert_checkpoint $CKPT/experts/uncertainty \
  --retrieval_checkpoint $CKPT/retrieval"

python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --max_iterations 1 --output_path "$CKPT/pilot_leakfree_singlepass.json"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --output_path "$CKPT/pilot_leakfree_loop.json"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free --grounding \
  --output_path "$CKPT/pilot_leakfree_grounded.json"
python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path "$CKPT/pilot_blind.json"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --use_reference \
  --output_path "$CKPT/pilot_guided.json"

python - <<'EOF'
import json
for name in ("leakfree_singlepass", "leakfree_loop", "leakfree_grounded",
             "blind", "guided"):
    d = json.load(open(f"/tmp/r3_pilot/pilot_{name}.json"))
    print(f"{name:22s} bleu4={d['bleu_4']:.4f} "
          f"obsF1={d['observation_micro_f1']:.4f} "
          f"halluc={d['hallucination_rate']:.3f} "
          f"iters={d['average_iterations']:.2f}")
EOF
echo "=== DONE pilot"
