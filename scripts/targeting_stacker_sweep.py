"""Offline sweep of LOOP-TARGETING channels beyond mean-prob corroboration.

The oracle-ceiling experiment (results/loop_value_ceiling.json,
docs/DESIGN.md "Oracle-targeting ceiling") showed the leak-free RAG
loop's machinery converts perfect targets into +6.7-10.7pp micro-F1,
while expert-seeded targeting realizes only +1.3pp — the bottleneck is
WHICH observations the loop seeks.  The serving corroboration rule
thresholds the ensemble's MEAN calibrated probability, discarding two
signals the pipeline already computes:

  * per-member probabilities (one confident member is buried by two
    uncertain ones: mean 0.37 < threshold even when a member says 0.9),
  * the joint shape of (mean, dissent, neighbour votes) — the hand
    rule (votes >= 6/10 AND p > 0.35) is a rectangle in a space where
    the true boundary is not axis-aligned.

This measures, without a single decode (minutes, not hours):
  1. the serving corroboration baseline (10/6/0.35),
  2. member-confident rescue rules (any/two members over their own
     calibrated thresholds, optionally gated by neighbour votes),
  3. a logistic stacker over [member probs, mean, std, max, vote
     fractions, score-weighted votes, per-observation bias] fitted on
     a held-out leak-free VALIDATION set (seed 55; the test sweep uses
     the eval seed 101) — precision/rescued as the decision threshold
     tau sweeps.

Reference: targeting role = modeling_iterative_rag.py:110-152
(TargetedRetriever); the reference has no expert-seeded targeting at
all — this channel search is net-new capability.

Usage (CPU, tiny checkpoints):
  RADAR_PLATFORM=cpu python scripts/targeting_stacker_sweep.py \
      --output results/targeting_stacker_sweep.json
"""
from __future__ import annotations

import argparse
import json
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
ap.add_argument("--output", type=str, default="")
ap.add_argument("--num", type=int, default=128)
ap.add_argument("--size", type=int, default=5120)
ap.add_argument("--model_type", type=str, default="gnn")
ap.add_argument("--expert_checkpoint", type=str,
                default="./checkpoints/expert_models/gnn")
ap.add_argument("--ensemble_expert", action="append", default=[])
ap.add_argument("--val_seed", type=int, default=55)
ap.add_argument("--test_seed", type=int, default=101)
d = ap.parse_args()
if not d.ensemble_expert:
    d.ensemble_expert = [
        "uncertainty:./checkpoints/expert_models/uncertainty",
        "contrastive:./checkpoints/expert_models/contrastive"]

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
train_ds = datasets["train"]
from radar_tpu.data.synthetic import SyntheticCXRDataset

pipe = build_pipeline_from_args(args, cfg, tokenizer, train_ds)

TOP_M = 20
NF = OBSERVATION_NAMES.index("No Finding")
N_OBS = len(OBSERVATION_NAMES)


def featurize(seed: int, num: int) -> dict:
    """Member prob stack + neighbour-vote features + labels for a
    leak-free synthetic split."""
    ds = SyntheticCXRDataset(num, cfg.vision.image_size,
                             cfg.text.max_length, seed=seed,
                             tokenizer=tokenizer, leak_labels=False)
    import jax.numpy as jnp
    images, contexts, labels = [], [], []
    for i in range(num):
        s = ds[i]
        meta = ds.sample_meta(i)
        images.append(np.asarray(_normalized_image(s, cfg), np.float32))
        contexts.append(meta["clinical_context"])
        labels.append(np.asarray(meta["labels"], np.float32))
    labels = np.stack(labels)
    emb = np.asarray(pipe.dpr.embedder.embed_images(images))
    ids_, mask_ = tokenizer.encode_batch(contexts, cfg.text.max_length)
    stack = np.asarray(pipe._ensemble_fwd(
        pipe._member_params(), jnp.asarray(np.stack(images)),
        jnp.asarray(ids_), jnp.asarray(mask_)))          # [M, N, obs]
    scores, nn_ids = pipe.dpr.index.search(emb, TOP_M)
    scores, nn_ids = np.asarray(scores), np.asarray(nn_ids)
    obs_mat = np.asarray(pipe.dpr.index.observations)
    votes = {}
    swv = {}
    for top_m in (10, 20):
        v = np.zeros_like(labels)
        sw = np.zeros_like(labels)
        for r in range(num):
            sel = nn_ids[r, :top_m]
            ok = (sel >= 0) & (sel < pipe.dpr.index.count)
            v[r] = obs_mat[sel[ok]].sum(0)
            # score-weighted votes: similarity-weighted neighbour mass
            sw[r] = (obs_mat[sel[ok]]
                     * scores[r, :top_m][ok, None]).sum(0)
        votes[top_m] = v
        swv[top_m] = sw
    return {"stack": stack, "labels": labels, "votes": votes,
            "swv": swv}


# per-member calibrated thresholds [M, n_obs]
member_th = [np.broadcast_to(np.asarray(
    pipe._member_thresholds(pipe.expert_params, pipe.expert_thresholds),
    np.float32), (N_OBS,))]
for (_, m_params, m_th) in pipe._members:
    member_th.append(np.broadcast_to(np.asarray(
        pipe._member_thresholds(m_params, m_th), np.float32), (N_OBS,)))
member_th = np.stack(member_th)                         # [M, n_obs]
mean_th = np.broadcast_to(np.asarray(pipe._thresholds(), np.float32),
                          (N_OBS,))

val = featurize(d.val_seed, d.num)
test = featurize(d.test_seed, d.num)


def build_X(f: dict) -> np.ndarray:
    """[N, n_obs, F] feature tensor for the stacker."""
    stack = f["stack"]                                   # [M, N, obs]
    mean, std = stack.mean(0), stack.std(0)
    mx, mn = stack.max(0), stack.min(0)
    n = stack.shape[1]
    feats = [mean, std, mx, mn]
    feats += [stack[m] for m in range(stack.shape[0])]
    feats += [f["votes"][10] / 10.0, f["votes"][20] / 20.0,
              f["swv"][10] / 10.0]
    X = np.stack(feats, axis=-1)                         # [N, obs, F]
    # per-observation identity (lets the stacker learn per-class bias)
    eye = np.broadcast_to(np.eye(N_OBS, dtype=np.float32),
                          (n, N_OBS, N_OBS))
    return np.concatenate([X, eye], axis=-1)


def fit_logistic(X: np.ndarray, y: np.ndarray, steps: int = 800,
                 lr: float = 0.5, l2: float = 1e-3) -> np.ndarray:
    """Plain-numpy logistic regression (deterministic, no deps).
    X [S, F], y [S] in {0,1}; returns weights [F+1] (bias last)."""
    Xb = np.concatenate([X, np.ones((len(X), 1), np.float32)], 1)
    w = np.zeros(Xb.shape[1], np.float64)
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        g = Xb.T @ (p - y) / len(y) + l2 * w
        w -= lr * g
    return w


def stacker_probs(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    Xb = np.concatenate(
        [X.reshape(-1, X.shape[-1]),
         np.ones((X.shape[0] * X.shape[1], 1), np.float32)], 1)
    return (1.0 / (1.0 + np.exp(-(Xb @ w)))).reshape(X.shape[:2])


def channel_report(name: str, cand: np.ndarray, f: dict,
                   expert_pos: np.ndarray, rows: list):
    cand = cand.copy()
    cand[:, NF] = False
    labels = f["labels"] > 0.5
    missed = labels & ~expert_pos
    missed[:, NF] = False
    n_cand, tp = int(cand.sum()), int((cand & labels).sum())
    row = {"channel": name,
           "candidates_per_study": round(n_cand / len(cand), 3),
           "precision": round(tp / max(n_cand, 1), 3),
           "rescued": tp,
           "rescue_fraction": round(tp / max(missed.sum(), 1), 3)}
    rows.append(row)
    print(f"{name:<44} {row['candidates_per_study']:>6.2f} "
          f"{row['precision']:>9.3f} {tp:>7d} "
          f"{row['rescue_fraction']:>8.3f}")


def run_sweep(f: dict, w: np.ndarray, label: str, rows: list):
    stack = f["stack"]
    mean = stack.mean(0)
    expert_pos = mean > mean_th
    labels = f["labels"] > 0.5
    missed = labels & ~expert_pos
    missed[:, NF] = False
    print(f"\n[{label}] expert(mean) micro-precision "
          f"{(expert_pos & labels).sum() / max(expert_pos.sum(), 1):.3f}"
          f", missed positives {int(missed.sum())}")
    print(f"{'channel':<44} {'cand/s':>6} {'precision':>9} "
          f"{'rescued':>7} {'rescue%':>8}")
    base = ((f["votes"][10] >= 6) & (mean > 0.35) & (mean <= mean_th))
    channel_report("serving corroboration 10/6/0.35", base, f,
                   expert_pos, rows)
    any_conf = (stack > member_th[:, None, :]).any(0) & ~expert_pos
    two_conf = ((stack > member_th[:, None, :]).sum(0) >= 2) \
        & ~expert_pos
    channel_report("any-member-confident", any_conf, f, expert_pos,
                   rows)
    for v in (2, 3, 4):
        channel_report(f"any-member-confident & votes10>={v}",
                       any_conf & (f["votes"][10] >= v), f,
                       expert_pos, rows)
    channel_report("two-members-confident", two_conf, f, expert_pos,
                   rows)
    sp = stacker_probs(build_X(f), w)
    for tau in (0.3, 0.4, 0.5, 0.6, 0.7, 0.8):
        channel_report(f"logistic stacker tau={tau}",
                       (sp > tau) & ~expert_pos, f, expert_pos, rows)
    for tau in (0.5, 0.6, 0.7):
        channel_report(f"stacker tau={tau} | corroboration union",
                       ((sp > tau) & ~expert_pos) | base, f,
                       expert_pos, rows)


def set_f1(pred: np.ndarray, labels: np.ndarray) -> tuple:
    """micro P/R/F1 of an expected-observation set vs ground truth
    (No Finding excluded — the loop never targets it)."""
    pred = pred.copy()
    pred[:, NF] = False
    lab = labels.copy() > 0.5
    lab[:, NF] = False
    tp = (pred & lab).sum()
    p = tp / max(pred.sum(), 1)
    r = tp / max(lab.sum(), 1)
    return (round(float(p), 4), round(float(r), 4),
            round(float(2 * p * r / max(p + r, 1e-9)), 4))


def run_drop_sweep(f: dict, w_pos: np.ndarray, label: str,
                   rows: list):
    """Expected-set quality under alternative VETO (drop) rules.

    The oracle ceiling's other half: the oracle not only adds missed
    positives, it removes the expert's confident FALSE positives from
    the loop's expected set.  Each rule below starts from the raw
    mean-threshold positives and drops a subset; the summary is the
    expected set's micro P/R/F1 against ground truth."""
    stack = f["stack"]
    mean = stack.mean(0)
    expert_pos = mean > mean_th
    labels = f["labels"]
    votes10 = f["votes"][10]
    n_conf = (stack > member_th[:, None, :]).sum(0)
    print(f"\n[{label}] expected-set quality under drop rules "
          f"(micro P / R / F1):")

    def report(name, keep):
        pred = expert_pos & keep
        p, r, f1 = set_f1(pred, labels)
        dropped = expert_pos & ~keep
        d_fp = int((dropped & (labels <= 0.5)).sum())
        d_tp = int((dropped & (labels > 0.5)).sum())
        rows.append({"rule": name, "precision": p, "recall": r,
                     "micro_f1": f1, "dropped_fp": d_fp,
                     "dropped_tp": d_tp})
        print(f"  {name:<46} {p:.4f} {r:.4f} {f1:.4f}   "
              f"(dropped FP {d_fp} / TP {d_tp})")

    report("no veto (raw mean threshold)",
           np.ones_like(expert_pos, bool))
    report("serving veto p>0.7 | votes10>=6",
           (mean > 0.7) | (votes10 >= 6))
    report("members>=2", n_conf >= 2)
    report("members>=2 | votes10>=6", (n_conf >= 2) | (votes10 >= 6))
    report("members>=2 | p>0.7 | votes10>=6",
           (n_conf >= 2) | (mean > 0.7) | (votes10 >= 6))
    report("members>=3", n_conf >= 3)
    sp = stacker_probs(build_X(f), w_pos)
    for tau in (0.3, 0.5, 0.7):
        report(f"positive-region stacker keep>{tau}", sp > tau)
    p, r, f1 = set_f1(labels > 0.5, labels)
    print(f"  {'oracle (ground truth)':<46} {p:.4f} {r:.4f} {f1:.4f}")


# fit the stacker on VAL's decision region (non-expert-positive cells)
val_mean = val["stack"].mean(0)
val_pos = val_mean > mean_th
Xv = build_X(val)
region = ~val_pos
region[:, NF] = False
w = fit_logistic(Xv[region], (val["labels"] > 0.5)[region].astype(
    np.float64))
# and a second stacker on the POSITIVE region (the drop direction)
region_pos = val_pos.copy()
region_pos[:, NF] = False
w_pos = fit_logistic(Xv[region_pos],
                     (val["labels"] > 0.5)[region_pos].astype(
                         np.float64))

rows_val, rows_test = [], []
run_sweep(val, w, f"VAL seed {d.val_seed} (stacker fit here)",
          rows_val)
run_sweep(test, w, f"TEST seed {d.test_seed}", rows_test)
drop_val, drop_test = [], []
run_drop_sweep(val, w_pos, f"VAL seed {d.val_seed}", drop_val)
run_drop_sweep(test, w_pos, f"TEST seed {d.test_seed}", drop_test)

if d.output:
    with open(d.output, "w") as fp:
        json.dump({
            "num_studies": d.num,
            "ensemble": [f"{d.model_type}:{d.expert_checkpoint}"]
            + d.ensemble_expert,
            "val_seed": d.val_seed, "test_seed": d.test_seed,
            "stacker_features": "mean,std,max,min,per-member probs,"
                                "vote_frac10,vote_frac20,swv10,"
                                "per-obs one-hot,bias",
            "val": rows_val, "test": rows_test,
            "drop_rules_val": drop_val, "drop_rules_test": drop_test,
        }, fp, indent=2)
    print(f"\nwrote {d.output}")
