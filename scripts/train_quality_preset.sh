#!/usr/bin/env bash
# VERDICT r2 #6: one end-to-end pipeline artifact at the QUALITY preset
# (default RadarConfig: ViT-B/16 224px vision + 6-layer/768 text,
# 512/6-layer decoder with 8k vocab, 512-token budget) — every round-2
# pipeline number was measured at --tiny.  Trains the uncertainty
# expert + retrieval system at the quality preset on synthetic 224px
# studies, then measures the full pipeline (p50 latency, BLEU/obs-F1)
# and batched serving throughput.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=checkpoints/quality
mkdir -p "$OUT"
# MXU-friendly sequence padding for the 197-token ViT (measured in
# results/mfu_analysis.json)
Q="--synthetic --synthetic_size 2048 --context_leak_fraction 0.25 \
  --set vision.seq_pad_to=256 --set train.eval_batch_size=128 \
  --set train.batch_size=32"

echo "=== quality: train uncertainty expert"
python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $Q --epochs 10 --output_dir "$OUT/experts"

echo "=== quality: train retrieval system (embedder + fusion + decoder)"
python -m radar_tpu.cli.train_retrieval_system --contribution all \
  $Q --epochs 2 --lm_epochs 8 --output_dir "$OUT/retrieval"

PIPE="--synthetic --synthetic_size 2048 --num_samples 64 \
  --passages 2048 --set retrieval.capacity=2048 \
  --set vision.seq_pad_to=256 \
  --model_type uncertainty \
  --expert_checkpoint $OUT/experts/uncertainty \
  --retrieval_checkpoint $OUT/retrieval"

echo "=== quality: pipeline eval (leak-free + grounding)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE --leakage_free --grounding \
  --output_path results/pipeline_evaluation_quality_leakfree.json
echo "=== quality: pipeline eval (informative)"
python -m radar_tpu.cli.evaluate_pipeline $PIPE \
  --output_path results/pipeline_evaluation_quality.json

echo "=== quality: batched serving throughput"
python -m radar_tpu.cli.bench_serving --serve_batch 16 --num_batches 3 \
  --synthetic --synthetic_size 2048 --passages 2048 \
  --set retrieval.capacity=2048 --set vision.seq_pad_to=256 \
  --model_type uncertainty \
  --expert_checkpoint "$OUT/experts/uncertainty" \
  --retrieval_checkpoint "$OUT/retrieval" \
  --output results/serving_throughput_quality.json

echo "=== DONE train_quality_preset"
