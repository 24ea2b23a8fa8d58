#!/usr/bin/env bash
# Production-preset smoke (round-4, verdict item 7): exercise
# configs/mimic_cxr.yaml END-TO-END on a synthetic raw stand-in —
# the exact RUNBOOK_MIMIC.md flow minus PHI:
#   raw CSV+images -> data_prep ETL -> real-file ExpertModelDataset
#   -> expert training (SwinV2-large 192px + ClinicalBERT geometry)
#   -> expert evaluation -> one served report through the pipeline.
# Only runtime-size knobs are overridden (batch/epochs/samples/index
# capacity/token budget); the MODEL config (architectures, widths,
# depths, seq lengths) is the production preset verbatim.
#
# Runs on CPU (~6-10 min on the 1-core host; the persistent compile
# cache in .cache/jax makes warm reruns much faster).
#   bash scripts/runbook_smoke.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
export RADAR_PLATFORM=cpu
WORK=${1:-/tmp/runbook_smoke}
N=${RUNBOOK_SMOKE_RECORDS:-20}
T0=$(date +%s)
CFG=configs/mimic_cxr.yaml
log() { echo "[$(date +%H:%M:%S)] runbook_smoke: $*"; }
# resumable: completed stages are skipped when re-run with the same
# workdir (a full cold run is ~20 min on the 1-core host)
mkdir -p "$WORK"

if [ -f "$WORK/data/annotation.json" ]; then
  log "stages 0-1: ETL outputs present; skip"
else
  log "stage 0: synthetic raw stand-in ($N records, 192px on disk)"
  python -m radar_tpu.data.synthetic_raw --output "$WORK/raw" \
    --num_records "$N" --image_size 192

  log "stage 1: data_prep ETL (CSV -> annotation/splits/context/obs)"
  python -m radar_tpu.cli.data_prep --csv "$WORK/raw/Cxr_df.csv" \
    --output "$WORK/data/"
fi

DATA="--annotation_path $WORK/data/annotation.json \
  --clinical_context_path $WORK/data/clinical_context.json \
  --observation_path $WORK/data/observation.json \
  --image_path $WORK/raw"

if [ -f "$WORK/checkpoints/baseline/best.json" ]; then
  log "stage 2: trained checkpoint present; skip"
else
  log "stage 2: train baseline expert (production geometry, 1 epoch)"
  python -m radar_tpu.cli.train_expert_models --config $CFG \
    --model_type baseline $DATA \
    --epochs 1 --set train.batch_size=2 --set train.eval_batch_size=2 \
    --set train.warmup_steps=2 --set mesh.data=1 \
    --output_dir "$WORK/checkpoints"
fi

if [ -f "$WORK/expert_eval.json" ]; then
  log "stage 3: expert eval present; skip"
else
  log "stage 3: evaluate the trained expert"
  python -m radar_tpu.cli.evaluate_expert_models --config $CFG \
    --model_type baseline --checkpoint "$WORK/checkpoints/baseline" \
    $DATA --set train.eval_batch_size=2 --set mesh.data=1 \
    --output_path "$WORK/expert_eval.json"
fi

log "stage 4: one served report through the full pipeline"
python -m radar_tpu.cli.evaluate_pipeline --config $CFG \
  --model_type baseline --expert_checkpoint "$WORK/checkpoints/baseline" \
  --retrieval_checkpoint "$WORK/no_retrieval_ckpt" \
  $DATA --num_samples 1 --passages 8 \
  --set retrieval.capacity=16 --set rag.max_new_tokens=8 \
  --set rag.max_iterations=2 --set decoder.max_length=256 \
  --set mesh.data=1 \
  --output_path "$WORK/pipeline_eval.json"

ARTIFACT=${RUNBOOK_SMOKE_ARTIFACT:-results/runbook_smoke.json} \
  RUNBOOK_SMOKE_RECORDS=$N SMOKE_T0=$T0 python - "$WORK" <<'EOF'
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from radar_tpu.utils.io import atomic_write_json
w = sys.argv[1]
e = json.load(open(f"{w}/expert_eval.json"))
p = json.load(open(f"{w}/pipeline_eval.json"))
assert p["num_samples"] == 1, p
payload = {
    "runbook_smoke": "ok",
    "config": "configs/mimic_cxr.yaml",
    "records": int(os.environ.get("RUNBOOK_SMOKE_RECORDS", 10)),
    "wall_seconds": round(time.time() - float(os.environ["SMOKE_T0"]), 1),
    "pipeline_p50_s": p["latency_p50_seconds"],
    "expert_eval_keys": sorted(e)[:6],
    "stages": ["synthetic_raw", "data_prep", "train_expert",
               "evaluate_expert", "serve_one_report"],
}
atomic_write_json(os.environ["ARTIFACT"], payload, indent=2)
print(json.dumps(payload))
EOF
log "DONE"
