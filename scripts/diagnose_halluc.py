"""Round-3 diagnostic: attribute leak-free FP mentions in the FINAL
report to their source channel, and simulate final-stage scrub rules.

Channels per FP pathology mention (final text, label negative):
  expert       in the veto-gated expert confident set (stage-1 prompt)
  corroborated in the image-neighbour corroborated candidate set
  accrued      in the RAG loop's cumulative detected set
  evidence     mentioned by a retrieved evidence passage
  invented     none of the above (decoder prior)

Also records expert prob + neighbour votes for every mention (FP and
TP) so candidate mention-level scrub rules can be scored offline.

Usage (CPU, real checkpoints):
  RADAR_PLATFORM=cpu python scripts/diagnose_halluc.py --num 48
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from radar_tpu.cli.evaluate_pipeline import (build_parser,
                                             build_pipeline_from_args)
from radar_tpu.cli.common import (make_tokenizer, build_datasets,
                                  load_config)
from radar_tpu.cli.evaluate_retrieval_system import _normalized_image
from radar_tpu.core.constants import OBSERVATION_NAMES
from radar_tpu.eval.pipeline_eval import observations_to_multihot
from radar_tpu.pipeline.observations import ObservationDetector

ap = argparse.ArgumentParser()
ap.add_argument("--num", type=int, default=48)
ap.add_argument("--size", type=int, default=5120)
ap.add_argument("--grounding", action="store_true", default=True)
ap.add_argument("--model_type", type=str, default="uncertainty")
ap.add_argument("--expert_checkpoint", type=str,
                default="./checkpoints/expert_models/uncertainty")
ap.add_argument("--ensemble_expert", action="append", default=[])
ap.add_argument("--out", type=str, default="/tmp/halluc_attribution.json")
d = ap.parse_args()

argv = (f"--synthetic --tiny --synthetic_size {d.size} "
        f"--num_samples {d.num} --passages {d.size} "
        f"--set retrieval.capacity={d.size} "
        f"--model_type {d.model_type} "
        f"--expert_checkpoint {d.expert_checkpoint} "
        f"--leakage_free").split()
for spec in d.ensemble_expert:
    argv += ["--ensemble_expert", spec]
args = build_parser().parse_args(argv)
cfg = load_config(args)
tokenizer = make_tokenizer(args, cfg)
datasets = build_datasets(args, cfg, tokenizer, ("train", "test"))
train_ds, test_ds = datasets["train"], datasets["test"]
from radar_tpu.data.synthetic import SyntheticCXRDataset
test_ds = SyntheticCXRDataset(
    len(test_ds), cfg.vision.image_size, cfg.text.max_length,
    seed=101, tokenizer=tokenizer, leak_labels=False)

pipe = build_pipeline_from_args(args, cfg, tokenizer, train_ds)
det = ObservationDetector()

num = min(d.num, len(test_ds))
mentions = []   # one record per (sample, pathology mention)
t0 = time.time()
for i in range(num):
    s = test_ds[i]
    meta = test_ds.sample_meta(i)
    img = _normalized_image(s, cfg)
    out = pipe.generate_report(np.asarray(img, np.float32),
                               meta["clinical_context"],
                               verify_grounding=True)
    labels = np.asarray(meta["labels"], np.float32)
    pred = observations_to_multihot(
        det.detect_observations(out["report"]))
    # channel sets
    expert_set = set(out["expert_observations"])
    corrob = set(out["corroborated_observations"])
    accrued = set(out["rag"]["cumulative_observations"])
    evid_obs = set()
    for p in out["retrieved_passages"]:
        evid_obs |= det.detect_observations(p)
    prelim_obs = det.detect_observations(out["preliminary_findings"])
    # expert probs + neighbour votes for this sample
    eo = pipe.predict_observations(np.asarray(img, np.float32),
                                   meta["clinical_context"])
    probs = eo["probs"]
    emb = pipe.dpr.embedder.embed_images([np.asarray(img, np.float32)])
    votes = pipe._neighbour_votes(np.asarray(emb))
    votes = votes[0] if votes is not None else np.zeros_like(probs)
    from radar_tpu.pipeline.grounding import _ALIAS
    final_named = {_ALIAS.get(n, n)
                   for n in det.detect_observations(out["report"])}
    for name in sorted(final_named):
        if name not in OBSERVATION_NAMES or name == "No Finding":
            continue
        j = OBSERVATION_NAMES.index(name)
        # pathology slice is [:13] everywhere else (Support Devices at
        # 12 IS graded — the serving veto acts on it); only No Finding
        # (13, already name-skipped above) is excluded
        if j >= 13:
            continue
        is_fp = labels[j] < 0.5
        chan = []
        aliases = {name} | {a for a, c in _ALIAS.items() if c == name}
        if aliases & expert_set:
            chan.append("expert")
        if aliases & corrob:
            chan.append("corroborated")
        if aliases & accrued:
            chan.append("accrued")
        if aliases & evid_obs:
            chan.append("evidence")
        if aliases & prelim_obs:
            chan.append("preliminary")
        if not chan:
            chan = ["invented"]
        mentions.append({
            "sample": i, "name": name, "fp": bool(is_fp),
            "prob": float(probs[j]), "votes": float(votes[j]),
            "channels": chan,
        })
    if (i + 1) % 8 == 0:
        print(f"  {i+1}/{num} ({time.time()-t0:.0f}s)", flush=True)

fps = [m for m in mentions if m["fp"]]
tps = [m for m in mentions if not m["fp"]]
print(f"\n=== {len(mentions)} pathology mentions over {num} samples: "
      f"{len(fps)} FP / {len(tps)} TP "
      f"(halluc proxy {len(fps)/max(len(mentions),1):.3f})")

def chan_hist(rows):
    h = {}
    for m in rows:
        for c in m["channels"]:
            h[c] = h.get(c, 0) + 1
    return dict(sorted(h.items(), key=lambda kv: -kv[1]))

print("FP channels:", chan_hist(fps))
print("TP channels:", chan_hist(tps))
# primary attribution: first channel in priority order
prio = ["expert", "corroborated", "accrued", "evidence",
        "preliminary", "invented"]
def primary(m):
    for c in prio:
        if c in m["channels"]:
            return c
    return "invented"
ph = {}
for m in fps:
    ph[primary(m)] = ph.get(primary(m), 0) + 1
print("FP primary:", dict(sorted(ph.items(), key=lambda kv: -kv[1])))

# candidate mention-level scrub rules: remove mention unless
# (prob > P) or (votes >= V)
print("\nrule sweep: keep mention iff prob>P or votes>=V")
for P in (0.4, 0.5, 0.6, 0.7):
    for V in (6, 7, 8):
        kept_fp = sum(1 for m in fps
                      if m["prob"] > P or m["votes"] >= V)
        kept_tp = sum(1 for m in tps
                      if m["prob"] > P or m["votes"] >= V)
        kept = kept_fp + kept_tp
        print(f"  P={P} V={V}: halluc {kept_fp}/{kept}="
              f"{kept_fp/max(kept,1):.3f}  TP kept "
              f"{kept_tp}/{len(tps)}={kept_tp/max(len(tps),1):.3f}")

with open(d.out, "w") as f:
    json.dump(mentions, f, indent=1)
print("wrote", d.out)
