"""Expert-model training CLI — flag parity with the reference's
``train_expert_models.py:503-541`` (model_type / data paths /
batch_size / epochs / learning_rate / pretrain / output_dir), driving
the TPU-native trainer (sharded jitted steps, Orbax best-macro-F1
checkpointing, post-hoc uncertainty calibration).

Usage:
    python -m radar_tpu.cli.train_expert_models --model_type gnn \
        --synthetic --tiny --epochs 3
"""

from __future__ import annotations

import argparse
import json
import os
import time

from ..core.logging import MetricWriter, get_logger
from ..core.trainer import ExpertTrainer
from .common import (add_common_args, make_tokenizer, add_data_args,
                     batch_iterator_factory, build_datasets, load_config,
                     make_mesh, steps_per_epoch)
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.train")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train RADAR expert models (TPU-native)")
    parser.add_argument("--model_type", type=str, default="uncertainty",
                        choices=["baseline", "uncertainty", "gnn",
                                 "contrastive", "multitask"],
                        help="Expert model variant to train")
    add_data_args(parser)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--pretrain", action="store_true",
                        help="Contrastive pretraining phase (contrastive)")
    parser.add_argument("--pretrain_epochs", type=int, default=None)
    parser.add_argument("--output_dir", type=str,
                        default="./checkpoints/expert_models/")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest full train state")
    parser.add_argument("--init_towers", type=str, default=None,
                        help="Warm-start the vision/text towers from an "
                             "import_weights output directory (adopts "
                             "its tower configs; heads stay fresh)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of one epoch")
    add_common_args(parser)
    return parser


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    if args.model_type != "contrastive" or not args.pretrain:
        cfg = cfg.override(**{"train.pretrain_epochs": 0})
    param_graft = None
    if args.init_towers:
        from ..utils.hf_import import adopt_tower_configs, \
            graft_tower_params
        cfg = adopt_tower_configs(cfg, args.init_towers)

        def param_graft(params):  # noqa: F811
            return graft_tower_params(params, args.init_towers)

    mesh = make_mesh(args, cfg.train.batch_size)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train", "val"))

    ckpt_dir = os.path.join(args.output_dir, args.model_type)
    trainer = ExpertTrainer(args.model_type, cfg, mesh, ckpt_dir)
    writer = MetricWriter(os.path.join(args.output_dir,
                                       f"{args.model_type}_train.jsonl"))

    bs = cfg.train.batch_size
    t0 = time.time()
    from ..core.logging import profile_trace
    with profile_trace(args.profile_dir):
        trainer.fit(
            batch_iterator_factory(datasets["train"], bs, shuffle=True,
                                   seed=cfg.train.seed),
            batch_iterator_factory(datasets["val"], bs),
            steps_per_epoch=steps_per_epoch(datasets["train"], bs),
            metric_writer=writer, resume=args.resume,
            param_graft=param_graft)
    elapsed = time.time() - t0

    best = trainer.ckpt.best_info() if trainer.ckpt else None
    results = {
        "model_type": args.model_type,
        "epochs": cfg.train.num_epochs,
        "train_seconds": round(elapsed, 2),
        "best": best,
        "history": trainer.history,
    }
    out_path = os.path.join(
        args.output_dir,
        f"{args.model_type}_results_{int(time.time())}.json")
    os.makedirs(args.output_dir, exist_ok=True)
    atomic_write_json(out_path, results, indent=2, default=str)
    logger.info("results -> %s (best: %s)", out_path, best)
    return results


if __name__ == "__main__":
    main()
