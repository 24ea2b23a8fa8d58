"""Expert-model evaluation CLI — flag parity with the reference's
``evaluate_expert_models.py:310-332`` (--model_type / --checkpoint /
--test_all / --checkpoint_dir / --output_path), producing comparison
tables and a JSON artifact with *measured* metrics.

Usage:
    python -m radar_tpu.cli.evaluate_expert_models --test_all \
        --synthetic --tiny --checkpoint_dir ./checkpoints/expert_models/
"""

from __future__ import annotations

import argparse
import os

import jax

from ..core.checkpoint import CheckpointManager
from ..core.logging import get_logger
from ..core.training import compute_dtype
from ..eval.evaluator import ModelEvaluator
from ..models.experts import EXPERT_REGISTRY, create_model
from .common import (add_common_args, make_tokenizer, add_data_args,
                     batch_iterator_factory, build_datasets, load_config,
                     make_mesh)

logger = get_logger("radar_tpu.eval_cli")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Evaluate RADAR expert models (TPU-native)")
    parser.add_argument("--model_type", type=str, default=None,
                        choices=sorted(EXPERT_REGISTRY))
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Explicit checkpoint directory for one model")
    parser.add_argument("--test_all", action="store_true",
                        help="Evaluate every variant in --checkpoint_dir")
    add_data_args(parser)
    parser.add_argument("--checkpoint_dir", type=str,
                        default="./checkpoints/expert_models/")
    parser.add_argument("--output_path", type=str,
                        default="./results/expert_model_comparison.json")
    parser.add_argument("--mc_samples", type=int, default=None)
    add_common_args(parser)
    return parser


def load_model_params(model_type: str, ckpt_dir: str, cfg, sample_batch):
    """Build the model and restore best params from an Orbax checkpoint
    directory; fresh-initialised params if no checkpoint exists (the
    reference's strict=False tolerance, ``:304``)."""
    dtype = compute_dtype(cfg.train)
    model = create_model(model_type, cfg.vision, cfg.text, cfg.expert,
                         dtype=dtype)
    params = model.init(jax.random.key(0), sample_batch["pixel_values"],
                        sample_batch["input_ids"],
                        sample_batch["attention_mask"])["params"]
    if ckpt_dir and os.path.isdir(ckpt_dir):
        try:
            mngr = CheckpointManager(ckpt_dir)
            # restore to host numpy, then pin on device ONCE — jit
            # re-uploads numpy args on every call, which dominated
            # eval/serving latency through the axon relay
            params = jax.device_put(mngr.restore(jax.device_get(params)))
            logger.info("restored %s from %s (step %s)", model_type,
                        ckpt_dir, mngr.latest_step())
            mngr.close()
        except FileNotFoundError:
            logger.warning("no checkpoint in %s; evaluating fresh init",
                           ckpt_dir)
    else:
        logger.warning("checkpoint dir %s missing; evaluating fresh init",
                       ckpt_dir)
    return model, params


def load_calibration(ckpt_dir: str | None):
    """Per-class decision thresholds fitted on val at train time
    (``calibration.json`` written by ``ExpertTrainer``), or None."""
    import json

    import numpy as np
    if not ckpt_dir:
        return None
    path = os.path.join(ckpt_dir, "calibration.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return np.asarray(json.load(f)["thresholds"], np.float32)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    mesh = make_mesh(args, cfg.train.eval_batch_size)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("test",))
    bs = cfg.train.eval_batch_size
    factory = batch_iterator_factory(datasets["test"], bs)
    sample = next(factory())

    evaluator = ModelEvaluator(factory, mesh)
    if args.test_all:
        # compare only variants that actually have a trained checkpoint
        # (fresh-init rows would poison the comparison table)
        types = [t for t in sorted(EXPERT_REGISTRY)
                 if os.path.isdir(os.path.join(args.checkpoint_dir, t))]
        skipped = sorted(set(EXPERT_REGISTRY) - set(types))
        if skipped:
            logger.info("--test_all skipping untrained variants: %s",
                        ", ".join(skipped))
        if not types:
            raise SystemExit(f"no trained checkpoints under "
                             f"{args.checkpoint_dir}")
    elif args.model_type:
        types = [args.model_type]
    else:
        raise SystemExit("pass --model_type or --test_all")

    for model_type in types:
        ckpt = args.checkpoint or os.path.join(args.checkpoint_dir,
                                               model_type)
        model, params = load_model_params(model_type, ckpt, cfg, sample)
        # replicate over the EVAL mesh: a bare (single-device) commit
        # would make the sharded eval step reshard params every batch
        from jax.sharding import NamedSharding, PartitionSpec
        params = jax.device_put(
            params, NamedSharding(mesh, PartitionSpec()))
        if model_type == "uncertainty":
            evaluator.evaluate_uncertainty_model(
                model_type, model, params, mc_samples=args.mc_samples)
        else:
            evaluator.evaluate_model(model_type, model, params,
                                     thresholds=load_calibration(ckpt))
        logger.info("%s: macro_f1=%.4f", model_type,
                    evaluator.results[model_type]["macro_f1"])

    print(evaluator.compare_models())
    evaluator.save_results(args.output_path)
    return evaluator.results


if __name__ == "__main__":
    main()
