#!/usr/bin/env bash
# Round-3 P5.1 (VERDICT r2 missing #3 / next #6): train the pipeline
# stack at the QUALITY preset (ViT-B/16 towers, 6-layer text, 6x512
# decoder, 224px synthetic studies) and produce a non-tiny end-to-end
# pipeline artifact with latency + quality, so the "<2 s p50" north
# star has a production-scale witness.
#
# Budget: 4096 studies x 12 epochs expert (the tiny-preset leak-robust
# recipe), embedder 12 / LM 10 epochs.  ~2-3 h on the v5e chip.
set -euo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

TRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"

echo "=== quality expert (uncertainty)"
# 20 epochs: ViT-B/16 from scratch underfits at 12 (val macro-F1 0.46
# at epoch 6); per-epoch resume makes relay-stall retries cheap
bash $R /tmp/q_expert.log 1200 3 \
  python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $TRAIN --epochs 20 --resume \
  --output_dir ./checkpoints/quality/expert_models

echo "=== quality retrieval system"
bash $R /tmp/q_retr.log 1200 3 \
  python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $TRAIN --epochs 3 --embedder_epochs 12 --lm_epochs 10 \
  --output_dir ./checkpoints/quality/retrieval_system

# NOTE: the uncertainty-solo pipeline/serving evals that used to live
# here were dropped — scripts/quality_ensemble_round3.sh regenerates
# the same artifact filenames at the shipping ensemble config right
# after, so the solo evals were ~1 h of chip time thrown away.

echo "=== DONE quality_pipeline_round3 (training only; evals in quality_ensemble_round3.sh)"
