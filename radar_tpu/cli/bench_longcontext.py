"""Long-context serving bench: context-parallel (ring-attention)
decoder prefill, end-to-end through ``RadarPipeline``.

The reference caps sequences at 512 tokens and has nothing distributed
(SURVEY.md §5); this exercises the capability it lacks: an
evidence-heavy prompt (>= ~2k tokens) prefilled with the sequence
sharded over a ring of devices (``parallel/context.py`` — ppermute K/V
rotation, exact online-softmax attention), then compared token-for-
token against the single-device prefill of the same pipeline.

Run on the CPU-simulated mesh (no multi-chip hardware needed):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python -m radar_tpu.cli.bench_longcontext --cpu --tiny \\
        --context_parallel 8 --prompt_tokens 2048
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..core.logging import get_logger
from .common import add_common_args, load_config, make_tokenizer
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.bench_longcontext")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Context-parallel long-context decode bench")
    parser.add_argument("--context_parallel", type=int, default=8)
    parser.add_argument("--prompt_tokens", type=int, default=2048,
                        help="Evidence-heavy prompt length (tokens)")
    parser.add_argument("--cpu", action="store_true",
                        help="Force the CPU platform (virtual mesh via "
                             "XLA_FLAGS=--xla_force_host_platform_"
                             "device_count=N)")
    parser.add_argument("--output", type=str,
                        default="results/longcontext_cp.json")
    add_common_args(parser)
    return parser


def _evidence_prompt(tokenizer, target_tokens: int) -> str:
    """A retrieved-evidence-heavy clinical context >= target_tokens."""
    from ..core import constants
    from ..data.synthetic import report_text
    from ..pipeline.prompts import EVIDENCE_HEADER
    rng = np.random.default_rng(0)
    lines = [EVIDENCE_HEADER]
    while True:
        labels = (rng.random(constants.NUM_OBSERVATIONS) < 0.3
                  ).astype(np.float32)
        lines.append(report_text(labels))
        text = ("Indication: interval change assessment.\n"
                + "\n".join(lines))
        ids, mask = tokenizer.encode(text, max_length=4 * target_tokens)
        if int(np.asarray(mask).sum()) >= target_tokens:
            return text


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    cfg = load_config(args)
    # a prompt budget big enough for the requested context
    # (_prompt_budget gives the prompt max_length // 2)
    cfg = cfg.override(**{"decoder.max_length": 2 * args.prompt_tokens})
    tokenizer = make_tokenizer(args, cfg)

    import jax.numpy as jnp

    from ..models.decoder import ReportDecoder
    from ..pipeline.radar import RadarPipeline

    decoder = ReportDecoder(cfg.decoder)
    params = decoder.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32))["params"]

    n = args.context_parallel
    devs = jax.devices()
    if len(devs) < n:
        raise SystemExit(f"--context_parallel {n} needs {n} devices, "
                         f"have {len(devs)} (set XLA_FLAGS=--xla_force_"
                         f"host_platform_device_count={n} with --cpu)")
    from jax.sharding import Mesh
    ring = (Mesh(np.asarray(devs[:n]), ("seq",)), "seq")

    prompt = _evidence_prompt(tokenizer, args.prompt_tokens)
    image = np.zeros((cfg.vision.image_size, cfg.vision.image_size, 3),
                     np.float32)

    def run(pipe):
        fn = pipe._make_generation_fn(None)
        t0 = time.perf_counter()
        out = fn(prompt)
        return out, time.perf_counter() - t0

    pipe_cp = RadarPipeline(cfg, tokenizer, decoder=decoder,
                            decoder_params=params, ring=ring)
    pipe_sd = RadarPipeline(cfg, tokenizer, decoder=decoder,
                            decoder_params=params)
    # compile passes
    run(pipe_cp), run(pipe_sd)
    out_cp, t_cp = run(pipe_cp)
    out_sd, t_sd = run(pipe_sd)

    max_prompt, max_new = pipe_cp._prompt_budget()
    result = {
        "backend": jax.default_backend(),
        "devices": n,
        "prompt_tokens": max_prompt,
        "max_new_tokens": max_new,
        "ring_seconds": t_cp,
        "single_device_seconds": t_sd,
        "outputs_identical": out_cp == out_sd,
        "measured": True,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    atomic_write_json(args.output, result, indent=2)
    logger.info("CP prefill %.2fs vs single %.2fs, identical=%s",
                t_cp, t_sd, result["outputs_identical"])
    print(json.dumps(result, indent=2))
    if not result["outputs_identical"]:
        raise SystemExit("ring and single-device decodes disagree")
    return result


if __name__ == "__main__":
    main()
