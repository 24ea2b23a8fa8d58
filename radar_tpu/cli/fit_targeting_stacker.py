"""Fit the targeting stacker (val-fitted logistic keep-rule) for the
RAG loop's expected-observation set.

The stacker replaces the hand cross-modal veto (``prob > 0.7 OR
neighbour votes >= 6``) with a logistic regression over the signals the
serving pipeline already computes: per-member calibrated probabilities,
their mean/std/max/min, image-neighbour vote fractions at depth 10/20,
score-weighted votes, and a per-observation one-hot.  Fitted on a
held-out leak-free validation split it beats the rectangle by ~2pp
expected-set micro-F1 on a disjoint test seed
(results/targeting_stacker_sweep.json).

Usage (tiny CPU ensemble — the shipping serving config):
    RADAR_PLATFORM=cpu python -m radar_tpu.cli.fit_targeting_stacker \
        --synthetic --tiny --synthetic_size 5120 --passages 5120 \
        --set retrieval.capacity=5120 \
        --model_type gnn \
        --expert_checkpoint ./checkpoints/expert_models/gnn \
        --ensemble_expert uncertainty:./checkpoints/expert_models/uncertainty \
        --ensemble_expert contrastive:./checkpoints/expert_models/contrastive \
        --leakage_free --val_seed 55 --num_samples 128 \
        --output ./checkpoints/targeting_stacker.json

Then serve/evaluate with ``--targeting_stacker
./checkpoints/targeting_stacker.json`` on evaluate_pipeline /
bench_serving / serve / bench_async_serving.

Note: the features are the DETERMINISTIC calibrated member forwards
(the fused ensemble program serving uses).  The solo MC-dropout
single-study path also featurizes the stacker with the deterministic
calibrated forward (round-4 advisor fix), so fit and serve features
match for every config.

Reference role: net-new — the reference's TargetedRetriever
(``modeling_iterative_rag.py:110-152``) has no expert-seeded targeting.
"""

from __future__ import annotations

import json

import numpy as np

from ..core.constants import OBSERVATION_NAMES
from ..core.logging import get_logger
from ..pipeline.targeting import (VOTE_TOP_MS, build_features,
                                  fit_positive_keep_stacker,
                                  neighbour_vote_features)
from .common import build_datasets, load_config, make_tokenizer
from .evaluate_pipeline import build_parser as eval_parser
from .evaluate_pipeline import build_pipeline_from_args
from .evaluate_retrieval_system import _normalized_image

logger = get_logger("radar_tpu.fit_targeting_stacker")


def build_parser():
    parser = eval_parser()
    parser.add_argument("--val_seed", type=int, default=55,
                        help="Synthetic seed of the held-out fit split "
                             "(must differ from the eval seed 101)")
    parser.add_argument("--tau", type=float, default=0.5,
                        help="Keep-probability decision threshold "
                             "baked into the saved stacker")
    parser.add_argument("--fit_tau", action="store_true",
                        help="sweep tau on the fit split instead of "
                             "using --tau: maximizes the WORST "
                             "per-domain (natural vs each --fit_shift "
                             "family) expected-set micro-F1 subject to "
                             "per-domain precision >= the hand veto's "
                             "— precision under shift is what bounds "
                             "hallucination (round-5, verdict item 5)")
    parser.add_argument("--output", type=str,
                        default="./checkpoints/targeting_stacker.json")
    parser.add_argument("--fit_chunk", type=int, default=64,
                        help="Member-forward batch size during "
                             "featurization")
    parser.add_argument("--fit_shift", action="append", default=None,
                        metavar="NOISE:SHIFT_SEED",
                        help="Also fit on a shifted val split (e.g. "
                             "'0.5:2000'): domain-mixed fitting makes "
                             "the keep-rule robust to score/vote "
                             "distribution shift.  Use a shift seed "
                             "DISJOINT from any eval split.  "
                             "Repeatable.")
    return parser


def featurize_split(pipe, cfg, tokenizer, seed: int, num: int,
                    chunk: int = 64, noise: float | None = None) -> dict:
    """Member prob stack + neighbour-vote features + labels for a
    leak-free synthetic split, computed with the pipeline's own
    serving-path machinery (fused ensemble forward, shared sorted
    neighbour search)."""
    from ..data.synthetic import SyntheticCXRDataset
    kw = {} if noise is None else {"noise": noise}
    ds = SyntheticCXRDataset(num, cfg.vision.image_size,
                             cfg.text.max_length, seed=seed,
                             tokenizer=tokenizer, leak_labels=False,
                             **kw)
    images, contexts, labels = [], [], []
    for i in range(num):
        s = ds[i]
        meta = ds.sample_meta(i)
        images.append(np.asarray(_normalized_image(s, cfg), np.float32))
        contexts.append(meta["clinical_context"])
        labels.append(np.asarray(meta["labels"], np.float32))
    labels = np.stack(labels)
    stacks = []
    for lo in range(0, num, chunk):
        imgs = np.stack(images[lo:lo + chunk])
        ids, mask = tokenizer.encode_batch(contexts[lo:lo + chunk],
                                           cfg.text.max_length)
        _, st = pipe._expert_prob_stack(
            pipe._put_batch(imgs), pipe._put_batch(ids),
            pipe._put_batch(mask))
        stacks.append(st)
    stack = np.concatenate(stacks, axis=1)          # [M, N, n_obs]
    emb = np.asarray(pipe.dpr.embedder.embed_images(images))
    scores, ids_ = pipe.dpr.index.search(emb, max(VOTE_TOP_MS))
    vf = neighbour_vote_features(np.asarray(ids_), np.asarray(scores),
                                 pipe._index_observations_host(),
                                 pipe.dpr.index.count)
    return {"stack": stack, "labels": labels, **vf}


def expected_set_f1(pred: np.ndarray, labels: np.ndarray) -> dict:
    """Micro P/R/F1 of an expected-observation set vs ground truth
    (No Finding excluded — the loop never targets it)."""
    nf = OBSERVATION_NAMES.index("No Finding")
    pred = pred.copy()
    pred[:, nf] = False
    lab = labels > 0.5
    lab = lab.copy()
    lab[:, nf] = False
    tp = (pred & lab).sum()
    p = tp / max(pred.sum(), 1)
    r = tp / max(lab.sum(), 1)
    return {"precision": round(float(p), 4),
            "recall": round(float(r), 4),
            "micro_f1": round(float(2 * p * r / max(p + r, 1e-9)), 4)}


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train",))
    pipe = build_pipeline_from_args(args, cfg, tokenizer,
                                    datasets["train"])
    num = args.num_samples
    f = featurize_split(pipe, cfg, tokenizer, args.val_seed, num,
                        chunk=args.fit_chunk)
    domain_sizes = [num]                 # rows per fit domain, in order
    for spec in args.fit_shift or []:
        noise_s, seed_s = spec.split(":")
        # same scaling rule as cli/common.py shift seeds: far past any
        # per-index seed of the base splits
        fs = featurize_split(pipe, cfg, tokenizer,
                             100 + int(seed_s) * 100_000, num,
                             chunk=args.fit_chunk,
                             noise=float(noise_s))
        f = {k: np.concatenate([f[k], fs[k]],
                               axis=1 if k == "stack" else 0)
             for k in f}
        domain_sizes.append(num)
        logger.info("fit split widened with shifted domain %s", spec)
    th = np.broadcast_to(np.asarray(pipe._thresholds(), np.float32),
                         (len(OBSERVATION_NAMES),))

    stacker = fit_positive_keep_stacker(
        f["stack"], f["labels"], th, f["votes10"], f["votes20"],
        f["swv10"], tau=args.tau, score_stats=f["score_stats"],
        meta={"val_seed": args.val_seed, "num_studies": num,
              "model_type": args.model_type,
              "expert_checkpoint": args.expert_checkpoint,
              "ensemble": list(args.ensemble_expert or []),
              "fit_shift": list(args.fit_shift or [])})

    # fit-split report: stacker keep vs the hand veto vs no veto
    mean = f["stack"].mean(0)
    pos = mean > th
    rag = cfg.rag
    veto_keep = ((mean > rag.veto_prob)
                 | (f["votes10"] >= rag.veto_min_votes))

    if args.fit_tau and len(domain_sizes) > 1:
        # robust tau: the single decision threshold that maximizes the
        # WORST per-domain micro-F1, subject to per-domain precision
        # >= the hand veto's (dropped if infeasible).  A tau fitted on
        # the pooled split optimizes the average domain and loses the
        # shifted cell; the minimax choice is what "stacker >= veto in
        # every grid cell" actually requires.
        kp = stacker.keep_probs(f["stack"], f["votes10"], f["votes20"],
                                f["swv10"], f["score_stats"])
        nf_col = OBSERVATION_NAMES.index("No Finding")
        bounds = np.cumsum([0] + domain_sizes)
        segs = [slice(a, b) for a, b in zip(bounds[:-1], bounds[1:])]
        veto_prec = [expected_set_f1(
            (pos & veto_keep)[s], f["labels"][s])["precision"]
            for s in segs]
        best = None
        for tau_c in np.arange(0.30, 0.801, 0.025):
            keep = kp > tau_c
            keep[:, nf_col] = True
            rows_d = [expected_set_f1((pos & keep)[s], f["labels"][s])
                      for s in segs]
            worst_f1 = min(r["micro_f1"] for r in rows_d)
            prec_ok = all(r["precision"] >= vp - 1e-9
                          for r, vp in zip(rows_d, veto_prec))
            key = (prec_ok, worst_f1,
                   min(r["precision"] for r in rows_d))
            if best is None or key > best[0]:
                best = (key, float(tau_c), rows_d)
        stacker.tau = best[1]
        args.tau = best[1]
        stacker.meta["fit_tau"] = {
            "tau": best[1], "per_domain": best[2],
            "veto_precision_per_domain": veto_prec,
            "precision_constraint_met": bool(best[0][0])}
        logger.info("fit_tau sweep -> tau=%.3f (worst-domain f1 %.4f,"
                    " precision constraint %s)", best[1], best[0][1],
                    "met" if best[0][0] else "DROPPED")
    rows = {
        "no_veto": expected_set_f1(pos, f["labels"]),
        f"hand_veto_{rag.veto_prob}_{rag.veto_min_votes}":
            expected_set_f1(pos & veto_keep, f["labels"]),
        f"stacker_tau_{args.tau}": expected_set_f1(
            pos & stacker.keep_mask(f["stack"], f["votes10"],
                                    f["votes20"], f["swv10"],
                                    f["score_stats"]),
            f["labels"]),
    }
    stacker.meta["fit_split_expected_set"] = rows
    stacker.save(args.output)
    logger.info("targeting stacker -> %s", args.output)
    print(json.dumps({"output": args.output, "tau": args.tau,
                      "n_members": stacker.n_members,
                      "fit_split_expected_set": rows}, indent=2))
    return rows


if __name__ == "__main__":
    main()
