"""Offline sweep of the image-neighbour corroboration knobs.

The RAG loop's leak-free value rides on the corroborated candidate
set's PRECISION: every candidate the loop writes that is label-negative
is a hallucination the grounding pass must scrub, and every
label-positive one is recall the single pass missed.  This measures,
per (top_m, min_votes, prob_floor), the candidate sets' precision /
per-study count / rescued-recall against ground truth — without a
single decode, so a full grid costs minutes instead of hours.

Usage (CPU, real checkpoints):
  RADAR_PLATFORM=cpu python scripts/corroborate_sweep.py \
      --model_type gnn --expert_checkpoint ./checkpoints/expert_models/gnn
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from radar_tpu.cli.evaluate_pipeline import (build_parser,
                                             build_pipeline_from_args)
from radar_tpu.cli.common import (make_tokenizer, build_datasets,
                                  load_config)
from radar_tpu.cli.evaluate_retrieval_system import _normalized_image
from radar_tpu.core.constants import OBSERVATION_NAMES

ap = argparse.ArgumentParser()
ap.add_argument("--output", type=str, default="",
                help="optional JSON artifact path (e.g. "
                     "results/corroboration_sweep.json)")
ap.add_argument("--num", type=int, default=128)
ap.add_argument("--size", type=int, default=5120)
ap.add_argument("--model_type", type=str, default="gnn")
ap.add_argument("--expert_checkpoint", type=str,
                default="./checkpoints/expert_models/gnn")
ap.add_argument("--ensemble_expert", action="append", default=[])
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

num = min(d.num, len(test_ds))
import jax.numpy as jnp
images, contexts, labels = [], [], []
for i in range(num):
    s = test_ds[i]
    meta = test_ds.sample_meta(i)
    images.append(np.asarray(_normalized_image(s, cfg), np.float32))
    contexts.append(meta["clinical_context"])
    labels.append(np.asarray(meta["labels"], np.float32))
labels = np.stack(labels)          # [N, n_obs]

emb = np.asarray(pipe.dpr.embedder.embed_images(images))
ids_, mask_ = tokenizer.encode_batch(contexts, cfg.text.max_length)
probs = pipe._expert_probs(jnp.asarray(np.stack(images)),
                           jnp.asarray(ids_), jnp.asarray(mask_))
th = np.broadcast_to(np.asarray(pipe._thresholds(), np.float32),
                     probs.shape[-1:])

# neighbour observation-vote matrix at the LARGEST top_m we sweep
TOP_M = 20
obs_mat = np.asarray(pipe.dpr.index.observations)
_, nn_ids = pipe.dpr.index.search(emb, TOP_M)
nn_ids = np.asarray(nn_ids)

nf = OBSERVATION_NAMES.index("No Finding")
expert_pos = probs > th            # [N, n_obs]

print(f"{num} studies; expert decisions micro-precision "
      f"{(expert_pos & (labels > .5)).sum() / max(expert_pos.sum(), 1):.3f}, "
      f"missed positives (label+ & not expert+): "
      f"{((labels > .5) & ~expert_pos).sum()}")

print(f"\n{'top_m':>5} {'votes':>5} {'floor':>5} | {'cand/study':>10} "
      f"{'precision':>9} {'rescued':>8} {'rescue%':>8}")
sweep_rows = []
for top_m in (5, 10, 20):
    votes = np.zeros_like(labels)
    for r in range(num):
        valid = nn_ids[r, :top_m]
        valid = valid[(valid >= 0) & (valid < pipe.dpr.index.count)]
        votes[r] = obs_mat[valid].sum(0)
    for min_votes in {5: (3, 4, 5), 10: (6, 7, 8), 20: (12, 14, 16)}[top_m]:
        for floor in (0.15, 0.25, 0.35):
            cand = ((votes >= min_votes) & (probs > floor)
                    & (probs <= th) & ~expert_pos)
            cand[:, nf] = False
            n_cand = cand.sum()
            tp = (cand & (labels > .5)).sum()
            missed = ((labels > .5) & ~expert_pos)
            missed[:, nf] = False
            print(f"{top_m:>5} {min_votes:>5} {floor:>5.2f} | "
                  f"{n_cand / num:>10.2f} "
                  f"{tp / max(n_cand, 1):>9.3f} {tp:>8d} "
                  f"{tp / max(missed.sum(), 1):>8.3f}")
            sweep_rows.append({
                "top_m": top_m, "min_votes": min_votes, "floor": floor,
                "candidates_per_study": float(n_cand / num),
                "precision": float(tp / max(n_cand, 1)),
                "rescued": int(tp),
                "rescue_fraction": float(tp / max(missed.sum(), 1)),
            })

if d.output:
    import json
    missed_total = ((labels > .5) & ~expert_pos)
    missed_total[:, nf] = False
    with open(d.output, "w") as f:
        json.dump({
            "num_studies": int(num),
            "model_type": d.model_type,
            "ensemble": d.ensemble_expert,
            "expert_micro_precision": float(
                (expert_pos & (labels > .5)).sum()
                / max(expert_pos.sum(), 1)),
            "missed_positives": int(missed_total.sum()),
            "serving_defaults": {"top_m": 10, "min_votes": 6,
                                 "floor": 0.35},
            "rows": sweep_rows,
        }, f, indent=2)
    print(f"\nwrote {d.output}")
