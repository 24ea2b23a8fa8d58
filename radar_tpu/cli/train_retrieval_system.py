"""Retrieval-system training CLI — flag parity with the reference's
``train_retrieval_system.py:327-335`` (``--contribution {2.1,2.2,2.3,
all}``, ``--epochs``) but training *real* models (the reference trains
toy stand-ins on random tensors — SURVEY.md §0.2.3):

  2.1  cross-modal embedder (image<->text InfoNCE)
  2.2  knowledge fusion (supervised conflict detection + fidelity)
  2.3  report decoder LM (teacher-forced next-token on reports)

Usage:
    python -m radar_tpu.cli.train_retrieval_system --contribution all \
        --synthetic --tiny --epochs 2
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..core.checkpoint import save_params
from ..core.logging import get_logger
from .common import (add_common_args, make_tokenizer, add_data_args,
                     batch_iterator_factory, build_datasets, load_config,
                     steps_per_epoch)
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.train_retrieval")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Train RADAR retrieval system (TPU-native)")
    parser.add_argument("--contribution",
                        choices=["2.1", "2.2", "2.3", "all"],
                        default="all")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--embedder_epochs", type=int, default=None,
                        help="Embedder (2.1) epoch override — corpus "
                             "image-query MRR keeps improving well "
                             "past the fusion/LM epoch budget")
    parser.add_argument("--lm_epochs", type=int, default=None,
                        help="Decoder-LM (2.3) epoch override — LM "
                             "epochs are cheap (~20 s) and report "
                             "quality tracks LM convergence, so train "
                             "it much longer than the embedder")
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--output_dir", type=str,
                        default="./checkpoints/retrieval_system/")
    parser.add_argument("--init_towers", type=str, default=None,
                        help="Warm-start the embedder's vision/text "
                             "towers from an import_weights output "
                             "directory (the BiomedCLIP role; adopts "
                             "the imported tower configs)")
    add_data_args(parser)
    add_common_args(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    if args.init_towers:
        from ..utils.hf_import import adopt_tower_configs
        cfg = adopt_tower_configs(cfg, args.init_towers)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train",))
    train_ds = datasets["train"]
    bs = cfg.train.batch_size
    os.makedirs(args.output_dir, exist_ok=True)
    results = {}
    contributions = (["2.1", "2.2", "2.3"]
                     if args.contribution == "all"
                     else [args.contribution])

    labels = train_ds.get_observations()

    if "2.1" in contributions:
        from ..retrieval.training import (retrieval_alignment,
                                          train_embedder)
        t0 = time.time()
        factory = batch_iterator_factory(train_ds, bs, shuffle=True)
        graft = None
        if args.init_towers:
            from ..core.checkpoint import load_params
            from ..utils.hf_import import warm_start_embedder_params
            vdir = os.path.join(args.init_towers, "vision")
            tdir = os.path.join(args.init_towers, "text")
            vparams = load_params(vdir) if os.path.isdir(vdir) else None
            tparams = load_params(tdir) if os.path.isdir(tdir) else None

            def graft(p):  # noqa: F811
                return warm_start_embedder_params(p, vparams, tparams)
        module, params, history = train_embedder(
            cfg, factory, num_epochs=args.embedder_epochs,
            param_graft=graft,
            steps_per_epoch=steps_per_epoch(train_ds, bs))
        acc = retrieval_alignment(module, params, factory)
        save_params(os.path.join(args.output_dir, "embedder"),
                    {"params": params})
        # marker so restore sites (eval CLI, pipeline) can rebuild the
        # embedder with the matching param tree without the caller
        # repeating --set retrieval.obs_head=true
        atomic_write_json(
            os.path.join(args.output_dir, "embedder_meta.json"),
            {"obs_head": bool(cfg.retrieval.obs_head),
             "objective": cfg.retrieval.objective}, indent=2)
        results["2.1"] = {"history": history,
                          "alignment_top1": acc,
                          "seconds": round(time.time() - t0, 2)}
        logger.info("2.1 embedder: alignment_top1=%.3f", acc)

    if "2.2" in contributions:
        t0 = time.time()
        emb_ckpt = os.path.join(args.output_dir, "embedder")
        if (cfg.fusion.hidden_size == cfg.text.hidden_size
                and os.path.isdir(emb_ckpt)):
            # train on real embedder text features (what the serving
            # pipeline's conflict filter consumes)
            from ..core.checkpoint import load_params
            from ..fusion.training import train_fusion_on_texts
            from ..retrieval.embedder import JittedEmbedder
            from .common import apply_embedder_meta
            ecfg = apply_embedder_meta(cfg, args.output_dir)
            embedder = JittedEmbedder.create(ecfg.vision, ecfg.text,
                                             ecfg.retrieval, tokenizer)
            embedder.params = load_params(
                emb_ckpt, {"params": embedder.params})["params"]
            module, params, history = train_fusion_on_texts(
                cfg, labels, embedder.embed_text_hidden,
                batch_size=min(bs, 16))
            mode = "text-features"
        else:
            from ..fusion.training import train_fusion
            module, params, history = train_fusion(
                cfg, labels, batch_size=min(bs, 16))
            mode = "codebook"
        save_params(os.path.join(args.output_dir, "fusion"),
                    {"params": params})
        results["2.2"] = {"history": history, "mode": mode,
                          "final_conflict_acc":
                              history[-1]["conflict_acc"],
                          "seconds": round(time.time() - t0, 2)}

    if "2.3" in contributions:
        from ..models.lm_training import (make_pipeline_lm_examples,
                                          train_decoder_lm)
        t0 = time.time()
        meta = [train_ds.sample_meta(i) for i in range(len(train_ds))]
        ids, attn, lmask = make_pipeline_lm_examples(
            meta, tokenizer, cfg.decoder.max_length)

        # Serving conditions the decoder on an image-embedding prefix
        # (pipeline/radar.py) — train with the SAME prefix distribution
        # by embedding each study through the just-trained embedder;
        # zeros otherwise (train/serve parity).
        prefixes = np.zeros((len(ids), cfg.decoder.prefix_dim),
                            np.float32)
        emb_ckpt = os.path.join(args.output_dir, "embedder")
        if os.path.isdir(emb_ckpt):
            # train/serve prefix parity: serving feeds the FULL
            # embedding as the decoder prefix, so a dim mismatch would
            # silently train on a truncated (or broadcast-broken)
            # distribution (ADVICE r2)
            if cfg.retrieval.embedding_dim != cfg.decoder.prefix_dim:
                raise SystemExit(
                    f"retrieval.embedding_dim "
                    f"({cfg.retrieval.embedding_dim}) must equal "
                    f"decoder.prefix_dim ({cfg.decoder.prefix_dim}) "
                    f"for LM prefix train/serve parity")
            from ..core.checkpoint import load_params
            from ..retrieval.embedder import JittedEmbedder
            from .common import apply_embedder_meta
            ecfg = apply_embedder_meta(cfg, args.output_dir)
            embedder = JittedEmbedder.create(ecfg.vision, ecfg.text,
                                             ecfg.retrieval, tokenizer)
            embedder.params = load_params(
                emb_ckpt, {"params": embedder.params})["params"]
            chunk = 64
            for s in range(0, len(train_ds), chunk):
                imgs = [train_ds[i]["pixel_values"]
                        for i in range(s, min(s + chunk, len(train_ds)))]
                prefixes[s:s + len(imgs)] = np.asarray(
                    embedder.embed_images(imgs))[:, :cfg.decoder.prefix_dim]
            logger.info("LM prefixes from trained embedder (%d studies)",
                        len(train_ds))

        def batches():
            for s in range(0, len(ids) - bs + 1, bs):
                yield {"input_ids": ids[s:s + bs],
                       "attention_mask": attn[s:s + bs],
                       "loss_mask": lmask[s:s + bs],
                       "prefix_embedding": prefixes[s:s + bs]}

        lm_cfg = (cfg.override(**{"train.num_epochs": args.lm_epochs})
                  if args.lm_epochs else cfg)
        module, params, history = train_decoder_lm(
            lm_cfg, batches, steps_per_epoch=max(1, len(ids) // bs))
        save_params(os.path.join(args.output_dir, "decoder"),
                    {"params": params})
        results["2.3"] = {"history": history,
                          "final_perplexity": history[-1]["perplexity"],
                          "seconds": round(time.time() - t0, 2)}

    out_path = os.path.join(args.output_dir,
                            f"training_results_{int(time.time())}.json")
    atomic_write_json(out_path, results, indent=2, default=str)
    logger.info("results -> %s", out_path)
    return results


if __name__ == "__main__":
    main()
