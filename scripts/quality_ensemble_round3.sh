#!/usr/bin/env bash
# Round-3 P5.1 follow-up: bring the QUALITY preset (ViT-B/16, 224px)
# up to the round-3 SERVING config — the 3-expert probability-averaged
# ensemble (gnn primary + uncertainty + contrastive, corroboration
# 10/6/0.35) — so the production-scale witness measures the config we
# actually ship, not an uncertainty-solo pilot.
#
# Runs AFTER scripts/quality_pipeline_round3.sh (needs its retrieval
# checkpoints).  Stages:
#   1. resume the uncertainty expert 20 -> 32 epochs (still climbing
#      at 20: val macro-F1 0.653 @16 -> 0.671 @19)
#   2. train gnn (24 ep) + contrastive (24 ep + 4 pretrain) at quality
#   3. regen pipeline_evaluation_quality{,_leakfree,_leakfree_grounded}
#      with the ensemble, plus ensemble serving throughput
set -euo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

TRAIN="--synthetic --synthetic_size 4096 --context_leak_fraction 0.25 \
  --set train.eval_batch_size=128 --set train.remat=true"
OUT=./checkpoints/quality/expert_models

echo "=== early latency witness: uncertainty-solo quality eval ($(date))"
# The checked-in pipeline_evaluation_quality{,_leakfree}.json came from
# the pre-device-pinning pilot (p50 15.1 s — the host-numpy re-upload
# bug, since fixed).  Refresh them solo FIRST, with the 20-epoch
# uncertainty ckpt that already exists, so a fixed-latency
# production-scale witness is on disk even if the ~4 h of ensemble
# training below gets cut off; the ensemble regen overwrites them with
# the shipping config afterwards.
SOLO="--synthetic --synthetic_size 1024 --num_samples 64 \
  --passages 1024 --set retrieval.capacity=1024 \
  --model_type uncertainty --expert_checkpoint $OUT/uncertainty \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system"
bash $R /tmp/qe_pipe_solo.log 1800 2 \
  python -m radar_tpu.cli.evaluate_pipeline $SOLO \
  --output_path results/pipeline_evaluation_quality.json || true
bash $R /tmp/qe_pipe_solo_lf.log 1800 2 \
  python -m radar_tpu.cli.evaluate_pipeline $SOLO --leakage_free \
  --output_path results/pipeline_evaluation_quality_leakfree.json || true

echo "=== quality expert: uncertainty resume -> 32 epochs ($(date))"
bash $R /tmp/qe_unc.log 1200 3 \
  python -m radar_tpu.cli.train_expert_models --model_type uncertainty \
  $TRAIN --epochs 32 --resume --output_dir $OUT

echo "=== quality expert: gnn ($(date))"
bash $R /tmp/qe_gnn.log 1200 3 \
  python -m radar_tpu.cli.train_expert_models --model_type gnn \
  $TRAIN --epochs 24 --resume --output_dir $OUT

echo "=== quality expert: contrastive ($(date))"
bash $R /tmp/qe_con.log 1200 3 \
  python -m radar_tpu.cli.train_expert_models --model_type contrastive \
  $TRAIN --epochs 24 --pretrain --pretrain_epochs 4 --resume \
  --output_dir $OUT

echo "=== quality expert comparison (leak-free) ($(date))"
bash $R /tmp/qe_cmp.log 1200 3 \
  python -m radar_tpu.cli.evaluate_expert_models --test_all \
  --synthetic --synthetic_size 4096 --context_leak_fraction 0.0 \
  --set train.eval_batch_size=128 --checkpoint_dir $OUT \
  --output_path results/expert_model_comparison_quality_leakfree.json

ENS="--ensemble_expert uncertainty:$OUT/uncertainty \
  --ensemble_expert contrastive:$OUT/contrastive"
PIPE="--synthetic --synthetic_size 1024 --num_samples 64 \
  --passages 1024 --set retrieval.capacity=1024 \
  --model_type gnn --expert_checkpoint $OUT/gnn \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system"

run_pipe() {  # run_pipe <name> <extra args...>
  local name=$1; shift
  echo "=== quality pipeline eval: $name ($(date))"
  bash $R "/tmp/qe_pipe_$name.log" 1800 3 \
    python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS "$@" \
    --output_path "results/pipeline_evaluation_$name.json"
}

run_pipe quality
run_pipe quality_leakfree --leakage_free
run_pipe quality_leakfree_grounded --leakage_free --grounding

echo "=== quality serving throughput (ensemble) ($(date))"
bash $R /tmp/qe_serving.log 1800 3 \
  python -m radar_tpu.cli.bench_serving --synthetic --synthetic_size 1024 \
  --model_type gnn --expert_checkpoint $OUT/gnn $ENS \
  --retrieval_checkpoint ./checkpoints/quality/retrieval_system \
  --passages 1024 --serve_batch 64 --num_batches 3 \
  --output results/serving_throughput_quality.json

python - <<'EOF'
import json
for n in ("quality", "quality_leakfree", "quality_leakfree_grounded"):
    d = json.load(open(f"results/pipeline_evaluation_{n}.json"))
    print(f"{n:28s} bleu4={d['bleu_4']:.4f} "
          f"microF1={d['observation_micro_f1']:.4f} "
          f"halluc={d.get('hallucination_rate', float('nan')):.3f} "
          f"p50={d.get('latency_p50_seconds', float('nan')):.3f}s")
s = json.load(open("results/serving_throughput_quality.json"))
print("serving:", {k: s[k] for k in list(s)[:6]})
EOF
echo "=== DONE quality_ensemble_round3 ($(date))"
