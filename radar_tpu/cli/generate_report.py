"""Full two-stage RADAR inference CLI — assemble expert + retrieval +
decoder from trained checkpoints and generate a report for one study.

The reference has no end-to-end inference entry point (its pipeline
exists only as mocked ``__main__`` blocks — SURVEY.md §0.1); this is
the serving surface.

Usage:
    python -m radar_tpu.cli.generate_report --synthetic --tiny \
        --expert_checkpoint ./checkpoints/expert_models/baseline \
        --retrieval_checkpoint ./checkpoints/retrieval_system \
        --sample 0
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_params
from ..core.logging import get_logger
from ..models.decoder import ReportDecoder
from ..pipeline.radar import RadarPipeline
from ..retrieval.dpr import create_dpr_model
from .common import (add_common_args, make_tokenizer, add_data_args, build_datasets,
                     load_config)
from .evaluate_expert_models import load_model_params

logger = get_logger("radar_tpu.generate")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Generate a radiology report for one study")
    parser.add_argument("--model_type", type=str, default="baseline")
    parser.add_argument("--expert_checkpoint", type=str, default=None)
    parser.add_argument("--retrieval_checkpoint", type=str,
                        default="./checkpoints/retrieval_system")
    parser.add_argument("--sample", type=int, default=0,
                        help="Index into the test split to report on")
    parser.add_argument("--image", type=str, default=None,
                        help="Path to an image file instead of --sample")
    parser.add_argument("--context", type=str, default="",
                        help="Clinical context string (with --image)")
    parser.add_argument("--passages", type=int, default=64,
                        help="Retrieval DB size drawn from the train split")
    add_data_args(parser)
    add_common_args(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train", "test"))
    train_ds, test_ds = datasets["train"], datasets["test"]

    sample_batch = next(iter(train_ds.batches(2)))
    if "raw_images" in sample_batch:
        sample_batch = train_ds.device_batch(sample_batch)
    expert, expert_params = load_model_params(
        args.model_type, args.expert_checkpoint, cfg, sample_batch)

    dpr = create_dpr_model(cfg, tokenizer)
    emb_ckpt = os.path.join(args.retrieval_checkpoint, "embedder")
    if os.path.isdir(emb_ckpt):
        dpr.embedder.params = load_params(
            emb_ckpt, {"params": dpr.embedder.params})["params"]
        logger.info("restored embedder from %s", emb_ckpt)
    n = min(args.passages, len(train_ds))
    dpr.build_retrieval_database(train_ds.get_passages()[:n],
                                 train_ds.get_observations()[:n])

    decoder = ReportDecoder(cfg.decoder)
    did = jnp.zeros((1, 8), jnp.int32)
    dmask = jnp.ones((1, 8), jnp.int32)
    dprefix = jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32)
    decoder_params = decoder.init(jax.random.key(1), did, dmask,
                                  dprefix)["params"]
    dec_ckpt = os.path.join(args.retrieval_checkpoint, "decoder")
    if os.path.isdir(dec_ckpt):
        decoder_params = load_params(
            dec_ckpt, {"params": jax.device_get(decoder_params)})["params"]
        logger.info("restored decoder from %s", dec_ckpt)

    from .evaluate_expert_models import load_calibration
    pipe = RadarPipeline(cfg, tokenizer, expert, expert_params, dpr,
                         decoder, decoder_params,
                         expert_thresholds=load_calibration(
                             args.expert_checkpoint))

    from ..data.dataset import preprocess_images

    def model_ready(raw_uint8):
        return np.asarray(preprocess_images(
            jnp.asarray(raw_uint8)[None], cfg.vision.image_size)[0])

    if args.image:
        from PIL import Image
        with Image.open(args.image) as im:
            img = model_ready(np.asarray(im.convert("RGB"), np.uint8))
        context = args.context or "No clinical context available."
        reference = None
    else:
        s = test_ds[args.sample]
        # synthetic samples are pre-normalised; real samples carry raw
        # uint8 that must be resized + ImageNet-normalised first
        img = (s["pixel_values"] if "pixel_values" in s
               else model_ready(s["image"]))
        context = s["clinical_context"]
        reference = s.get("report")

    t0 = time.perf_counter()
    out = pipe.generate_report(np.asarray(img, np.float32), context,
                               reference_text=reference)
    latency = time.perf_counter() - t0

    print(json.dumps({
        "report": out["report"],
        "preliminary_findings": out["preliminary_findings"],
        "expert_observations": out["expert_observations"],
        "iterations": out["iterations"],
        "consistency_score": out["consistency_score"],
        "num_retrieved": len(out["retrieved_passages"]),
        "latency_seconds": round(latency, 3),
        "reference": reference,
    }, indent=2))
    return out


if __name__ == "__main__":
    main()
