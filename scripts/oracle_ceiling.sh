#!/usr/bin/env bash
# Loop-value CEILING experiment (round-3; closes the DESIGN.md
# ceiling-analysis loop opened by the --oracle_targeting diagnostic).
#
# Question: how much of the RAG loop's theoretical value does the
# real expert-seeded targeting realize?  The corroboration sweep
# argued the ceiling indirectly (the loop can only rescue expert
# misses); --oracle_targeting measures it directly by driving the
# loop's expected-observation set from ground-truth labels while
# leaving every other stage (expert, retrieval, fusion, decode)
# untouched.
#
# Design: two triads, all on CPU (RADAR_PLATFORM=cpu) so the
# comparisons are same-platform and never contend with TPU chains:
#   natural  : leak-free {oracle loop, real loop, single-pass}
#   shifted  : same three at --synthetic_noise 0.5 --shift_seed 1000
#              (weaker experts -> more headroom for the loop)
# ceiling = oracle_loop - singlepass; realized = real_loop - singlepass.
#
# Emits ONE artifact results/loop_value_ceiling.json (per-run metrics
# kept in /tmp; the TPU-headline artifacts in results/ stay untouched).
#
# Waits for the round3g rebuild to finish stages 1-3 (tiny expert +
# retrieval checkpoints) before starting.  Launch detached:
#   setsid nohup bash scripts/oracle_ceiling.sh \
#     > /tmp/oracle_ceiling.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export RADAR_PLATFORM=cpu

need() { [ -d "$1" ] || { echo "waiting: $1"; return 1; }; }
until need ./checkpoints/expert_models/gnn \
   && need ./checkpoints/expert_models/uncertainty \
   && need ./checkpoints/expert_models/contrastive \
   && need ./checkpoints/retrieval_system \
   && grep -q "stage 4" /tmp/round3g.log 2>/dev/null; do
  sleep 120
done
echo "[$(date +%H:%M:%S)] checkpoints ready; running triads"

ENS="--ensemble_expert uncertainty:./checkpoints/expert_models/uncertainty \
  --ensemble_expert contrastive:./checkpoints/expert_models/contrastive"
PIPE="--synthetic --tiny --synthetic_size 5120 --num_samples 128 \
  --passages 5120 --set retrieval.capacity=5120 \
  --model_type gnn --expert_checkpoint ./checkpoints/expert_models/gnn"
SHIFT="--synthetic_noise 0.5 --synthetic_shift_seed 1000"

run() {  # run <name> <extra args...>
  local name=$1; shift
  echo "[$(date +%H:%M:%S)] eval: $name"
  python -m radar_tpu.cli.evaluate_pipeline $PIPE $ENS --leakage_free "$@" \
    --output_path "/tmp/oracle_$name.json" \
    || echo "WARNING: $name FAILED"
}

run natural_oracle     --oracle_targeting
run natural_loop
run natural_singlepass --max_iterations 1
run shifted_oracle     --oracle_targeting $SHIFT
run shifted_loop       $SHIFT
run shifted_singlepass --max_iterations 1 $SHIFT

python - <<'EOF'
import json, os
runs = {}
for fam in ("natural", "shifted"):
    for mode in ("oracle", "loop", "singlepass"):
        p = f"/tmp/oracle_{fam}_{mode}.json"
        if not os.path.exists(p):
            print(f"missing {p}; aborting summary"); raise SystemExit(1)
        d = json.load(open(p))
        runs[f"{fam}_{mode}"] = {k: d[k] for k in (
            "bleu_4", "observation_micro_f1", "observation_macro_f1",
            "hallucination_rate", "average_iterations")}
def gap(fam, a, b, k):
    return round(runs[f"{fam}_{a}"][k] - runs[f"{fam}_{b}"][k], 4)
out = {
    "platform": "cpu",
    "config": ("tiny 3-expert ensemble (gnn+uncertainty+contrastive), "
               "leak-free, 128 studies / 5120 passages, "
               "corroboration 10/6/0.35"),
    "definition": ("ceiling = oracle-targeted loop minus single-pass; "
                   "realized = expert-seeded loop minus single-pass. "
                   "Oracle drives ONLY the loop's expected-observation "
                   "set from ground-truth labels (diagnostic; never a "
                   "headline)."),
    "runs": runs,
    "summary": {
        fam: {
            "ceiling_micro_f1": gap(fam, "oracle", "singlepass",
                                    "observation_micro_f1"),
            "realized_micro_f1": gap(fam, "loop", "singlepass",
                                     "observation_micro_f1"),
            "ceiling_bleu4": gap(fam, "oracle", "singlepass", "bleu_4"),
            "realized_bleu4": gap(fam, "loop", "singlepass", "bleu_4"),
        } for fam in ("natural", "shifted")},
}
with open("results/loop_value_ceiling.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out["summary"], indent=2))
EOF
echo "[$(date +%H:%M:%S)] DONE oracle_ceiling"
