"""Train + evaluate the temporal comparison module (contribution 3.1,
planned-but-unshipped in the reference, ``README.md:93-100``).

Trains ``TemporalComparator`` on longitudinal study pairs (synthetic
generator; real data would supply prior/current image pairs with the
same batch keys), evaluates progression classification
(Improved/Stable/Worsened per observation) and the structured
comparison statements, and writes a measured JSON artifact.

Usage:
    python -m radar_tpu.cli.train_temporal --synthetic --tiny \
        --epochs 3 --synthetic_size 512
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.logging import get_logger
from ..core.training import (TrainState, compute_dtype, make_optimizer,
                             make_train_step, replicate_state)
from ..data.synthetic import SyntheticLongitudinalDataset
from ..models.temporal import (PROGRESSION_LEVELS, TemporalComparator,
                               comparison_statements,
                               derive_progression_labels,
                               temporal_loss_fn)
from .common import add_common_args, add_data_args, load_config, make_mesh
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.train_temporal")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Train the temporal (longitudinal) comparison module")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--output_dir", type=str,
                        default="./checkpoints/temporal")
    parser.add_argument("--output_path", type=str,
                        default="./results/temporal_evaluation.json")
    # change-enriched pair sampling (VERDICT r2 #3: at the natural
    # rates ~90% of cells are Stable and the change classes starve)
    parser.add_argument("--positive_rate", type=float, default=0.25)
    parser.add_argument("--improve_rate", type=float, default=0.35)
    parser.add_argument("--worsen_rate", type=float, default=0.12)
    parser.add_argument("--eval_natural_rates", action="store_true",
                        help="Also evaluate on pairs at the NATURAL "
                             "transition rates (0.18/0.3/0.06) and "
                             "report both blocks")
    add_data_args(parser)   # longitudinal pairs are synthetic-only for
    add_common_args(parser)  # now; real data needs prior-study pairing
    return parser


def evaluate_progression(model, params, batches) -> dict:
    """Progression metrics over a split: accuracy, per-class recall,
    macro-F1 over the 3 progression classes, and statement exact-match
    (predicted vs ground-truth structured comparison text)."""
    fwd = jax.jit(lambda p, c, pr: model.apply(
        {"params": p}, c, pr)["progression_logits"])
    preds, targets = [], []
    statement_hits = total = 0
    for b in batches:
        logits = np.asarray(fwd(params, b["pixel_values"],
                                b["prior_pixel_values"]))
        pred = np.argmax(logits, -1)                      # [B, 14]
        tgt = np.asarray(derive_progression_labels(
            b["prior_labels"], b["labels"]))
        preds.append(pred)
        targets.append(tgt)
        for i in range(pred.shape[0]):
            total += 1
            if (comparison_statements(pred[i])
                    == comparison_statements(tgt[i])):
                statement_hits += 1
    pred = np.concatenate(preds).reshape(-1)
    tgt = np.concatenate(targets).reshape(-1)
    per_class = {}
    f1s = []
    for c, name in enumerate(PROGRESSION_LEVELS):
        tp = float(np.sum((pred == c) & (tgt == c)))
        fp = float(np.sum((pred == c) & (tgt != c)))
        fn = float(np.sum((pred != c) & (tgt == c)))
        prec = tp / max(tp + fp, 1e-8)
        rec = tp / max(tp + fn, 1e-8)
        f1 = 2 * prec * rec / max(prec + rec, 1e-8)
        per_class[name.lower()] = {"precision": prec, "recall": rec,
                                   "f1": f1,
                                   "support": int(np.sum(tgt == c))}
        f1s.append(f1)
    return {
        "progression_accuracy": float(np.mean(pred == tgt)),
        "progression_macro_f1": float(np.mean(f1s)),
        "per_class": per_class,
        "statement_exact_match": statement_hits / max(total, 1),
        "num_pairs": total,
    }


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    cfg = cfg.override(**{"train.num_epochs": args.epochs})
    mesh = make_mesh(args, cfg.train.batch_size)
    size = args.synthetic_size
    rates = dict(positive_rate=args.positive_rate,
                 improve_rate=args.improve_rate,
                 worsen_rate=args.worsen_rate)
    train_ds = SyntheticLongitudinalDataset(
        size, cfg.vision.image_size, seed=cfg.train.seed, **rates)
    val_ds = SyntheticLongitudinalDataset(
        max(size // 4, 16), cfg.vision.image_size,
        seed=cfg.train.seed + 1, **rates)

    dtype = compute_dtype(cfg.train)
    model = TemporalComparator(cfg.vision, cfg.expert, dtype=dtype,
                               remat=cfg.train.remat)
    rng = jax.random.key(cfg.train.seed)
    sample = next(train_ds.batches(cfg.train.batch_size))
    params = model.init({"params": rng,
                         "dropout": jax.random.fold_in(rng, 1)},
                        sample["pixel_values"],
                        sample["prior_pixel_values"],
                        deterministic=False)["params"]
    steps_per_epoch = max(len(train_ds) // cfg.train.batch_size, 1)
    tx = make_optimizer(cfg.train, steps_per_epoch)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if mesh is not None:
        state = replicate_state(state, mesh)

    step_fn = make_train_step(model, temporal_loss_fn(cfg.expert), mesh,
                              guard=cfg.train.nan_guard)
    ckpt = CheckpointManager(os.path.join(args.output_dir, "comparator"),
                             cfg.train.keep_checkpoints)
    history = []
    from ..core.mesh import shard_batch
    for epoch in range(args.epochs):
        losses, accs = [], []
        for b in train_ds.batches(cfg.train.batch_size, shuffle=True,
                                  seed=epoch):
            if mesh is not None:
                b = shard_batch(mesh, b)
            state, metrics = step_fn(state, b, rng)
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["progression_accuracy"]))
        rec = {"epoch": epoch, "train_loss": float(np.mean(losses)),
               "train_progression_acc": float(np.mean(accs))}
        logger.info("epoch %d: %s", epoch, rec)
        history.append(rec)

    val = evaluate_progression(model, state.params,
                               val_ds.batches(cfg.train.eval_batch_size))
    val["pair_rates"] = rates
    ckpt.save(int(jax.device_get(state.step)),
              jax.device_get(state.params),
              metrics={"progression_macro_f1":
                       val["progression_macro_f1"]})
    results = {"history": history, "validation": val,
               "measured": True, "timestamp": int(time.time()),
               "config": "tiny" if args.tiny else "default"}
    if args.eval_natural_rates:
        nat_ds = SyntheticLongitudinalDataset(
            max(size // 4, 16), cfg.vision.image_size,
            seed=cfg.train.seed + 2)
        nat = evaluate_progression(
            model, state.params,
            nat_ds.batches(cfg.train.eval_batch_size))
        nat["pair_rates"] = dict(positive_rate=0.18, improve_rate=0.3,
                                 worsen_rate=0.06)
        results["validation_natural_rates"] = nat
    os.makedirs(os.path.dirname(os.path.abspath(args.output_path)),
                exist_ok=True)
    atomic_write_json(args.output_path, results, indent=2)
    logger.info("progression acc=%.3f macro_f1=%.3f statements=%.3f -> %s",
                val["progression_accuracy"],
                val["progression_macro_f1"],
                val["statement_exact_match"], args.output_path)
    print(json.dumps(val, indent=2))
    return results


if __name__ == "__main__":
    main()
