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

PIPE="--synthetic --synthetic_size 1024 --num_samples 64 \
  --passages 1024 --set retrieval.capacity=1024 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/quality/expert_models/uncertainty \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system"

echo "=== quality pipeline eval (blind informative)"
bash $R /tmp/q_pipe.log 1800 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation_quality.json

echo "=== quality pipeline eval (leak-free)"
bash $R /tmp/q_pipe_lf.log 1800 3 \
  python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free \
  --output_path results/pipeline_evaluation_quality_leakfree.json

echo "=== quality batched serving throughput (reports/sec)"
bash $R /tmp/q_serving.log 1800 3 \
  python -m radar_tpu.cli.bench_serving --synthetic --synthetic_size 1024 \
  --model_type uncertainty \
  --expert_checkpoint ./checkpoints/quality/expert_models/uncertainty \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system \
  --passages 1024 --serve_batch 64 --num_batches 3 \
  --output results/serving_throughput_quality.json

echo "=== DONE quality_pipeline_round3"
