#!/usr/bin/env bash
# Round-3 MFU experiments (VERDICT r2 #9): quality-config chained MFU
# 52% -> target >=60% without runtime Pallas.  Variants: MXU-friendly
# sequence padding (197->256) and 128-wide attention heads, separately
# and combined.  Each writes its own artifact; the best variant is then
# re-run into results/mfu_analysis.json as the headline.
set -euo pipefail
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh

bash $R /tmp/mfu_base.log 600 2 \
  python -m radar_tpu.cli.bench_ablate \
  --output results/mfu_baseline.json
bash $R /tmp/mfu_pad.log 600 2 \
  python -m radar_tpu.cli.bench_ablate --seq_pad_to 256 \
  --output results/mfu_seqpad256.json
bash $R /tmp/mfu_heads.log 600 2 \
  python -m radar_tpu.cli.bench_ablate --vision_heads 6 \
  --output results/mfu_heads128.json
bash $R /tmp/mfu_both.log 600 2 \
  python -m radar_tpu.cli.bench_ablate --seq_pad_to 256 --vision_heads 6 \
  --output results/mfu_seqpad_heads.json

python - <<'EOF'
import json
rows = {}
for name in ["baseline", "seqpad256", "heads128", "seqpad_heads"]:
    d = json.load(open(f"results/mfu_{name}.json"))
    best = max((r for r in d["rows"]
                if r["component"] == "expert_full_chained"),
               key=lambda r: r["mfu"], default=None)
    rows[name] = best["mfu"] if best else None
print(json.dumps(rows, indent=1))
EOF
echo "=== DONE mfu_experiments_round3"
