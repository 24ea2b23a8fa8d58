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
import time

import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from .common import (add_common_args, make_tokenizer, add_data_args, build_datasets,
                     load_config)

logger = get_logger("radar_tpu.generate")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Generate a radiology report for one study")
    parser.add_argument("--model_type", type=str, default="baseline")
    parser.add_argument("--expert_checkpoint", type=str, default=None)
    parser.add_argument("--targeting_stacker", type=str, default=None,
                        help="fit_targeting_stacker.py JSON: val-fitted"
                             " logistic keep-rule replacing the hand "
                             "cross-modal veto on expert positives")
    parser.add_argument("--ensemble_expert", action="append",
                        default=[], metavar="TYPE:CKPT_DIR",
                        help="Extra expert member(s) for probability-"
                             "averaged ensembling (repeatable)")
    parser.add_argument("--retrieval_checkpoint", type=str,
                        default="./checkpoints/retrieval_system")
    parser.add_argument("--temporal_checkpoint", type=str, default=None,
                        help="TemporalComparator checkpoint dir "
                             "(contribution 3.1) — enables --prior_*")
    parser.add_argument("--sample", type=int, default=0,
                        help="Index into the test split to report on")
    parser.add_argument("--image", type=str, default=None,
                        help="Path to an image file instead of --sample")
    parser.add_argument("--prior_image", type=str, default=None,
                        help="Path to a PRIOR study image — the "
                             "progression classifier conditions the "
                             "report on interval change")
    parser.add_argument("--prior_sample", type=int, default=None,
                        help="Test-split index of a prior study image "
                             "(synthetic demo of the temporal hook)")
    parser.add_argument("--grounding", action="store_true",
                        help="Run the contribution-3.3 hallucination "
                             "pass on the generated report")
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

    # one shared assembly path with the evaluation/serving-bench CLIs
    # (expert + optional ensemble + retrieval + decoder + fusion +
    # optional temporal comparator)
    from .evaluate_pipeline import build_pipeline_from_args
    pipe = build_pipeline_from_args(args, cfg, tokenizer, train_ds)

    from ..data.dataset import preprocess_images

    def model_ready(raw_uint8):
        return np.asarray(preprocess_images(
            jnp.asarray(raw_uint8)[None], cfg.vision.image_size)[0])

    def ds_image(idx):
        s = test_ds[idx]
        # synthetic samples are pre-normalised; real samples carry raw
        # uint8 that must be resized + ImageNet-normalised first
        return (s["pixel_values"] if "pixel_values" in s
                else model_ready(s["image"])), s

    if args.image:
        from PIL import Image
        with Image.open(args.image) as im:
            img = model_ready(np.asarray(im.convert("RGB"), np.uint8))
        context = args.context or "No clinical context available."
        reference = None
    else:
        img, s = ds_image(args.sample)
        context = s["clinical_context"]
        reference = s.get("report")

    prior = None
    if args.prior_image:
        from PIL import Image
        with Image.open(args.prior_image) as im:
            prior = model_ready(np.asarray(im.convert("RGB"), np.uint8))
    elif args.prior_sample is not None:
        prior, _ = ds_image(args.prior_sample)
    if prior is not None and pipe._temporal_fwd is None:
        raise SystemExit("--prior_* needs --temporal_checkpoint")

    t0 = time.perf_counter()
    out = pipe.generate_report(
        np.asarray(img, np.float32), context,
        reference_text=reference,
        prior_image=(None if prior is None
                     else np.asarray(prior, np.float32)),
        verify_grounding=args.grounding)
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
        **({"comparison": out["comparison"]}
           if "comparison" in out else {}),
        **({"hallucinated": out["grounding"]["hallucinated"]}
           if "grounding" in out else {}),
    }, indent=2))
    return out


if __name__ == "__main__":
    main()
