"""Quality-config MFU ablation bench.

Per-op profiling through the axon relay is unreliable (see
.claude/skills/verify/SKILL.md), so MFU attribution is done by
component ablation: measure the full quality-preset expert forward,
the vision tower alone, and the text tower alone, each against its own
analytically-counted matmul FLOPs, at several batch sizes.  Writes a
JSON artifact and prints a summary table.

Usage:
    python -m radar_tpu.cli.bench_ablate \
        --output results/mfu_analysis.json
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from ..utils.io import atomic_write_json

# calibrated effective bf16 peak of the v5e chip through the relay
# (CLAUDE.md; measured with a pure [8k x 8k] matmul chain in round 1)
PEAK_TFLOPS = 202.0


def matmul_flops_encoder(seq: int, hidden: int, depth: int,
                         mlp_ratio: float) -> float:
    """2*M*N*K matmul FLOPs of one sample through a standard encoder:
    qkv + out projections, two attention einsums, two MLP matmuls."""
    per_layer = (2 * seq * hidden * 3 * hidden      # qkv
                 + 2 * seq * hidden * hidden        # out proj
                 + 2 * 2 * seq * seq * hidden       # QK^T and AV
                 + 2 * 2 * seq * hidden * int(mlp_ratio * hidden))
    return float(per_layer * depth)


def vit_flops(cfg) -> float:
    n = (cfg.vision.image_size // cfg.vision.patch_size) ** 2
    seq = n + (1 if cfg.vision.pool == "cls" else 0)
    patch = 2 * n * cfg.vision.hidden_size * (
        cfg.vision.patch_size ** 2 * cfg.vision.channels)
    pool = 2 * cfg.vision.hidden_size ** 2
    return (patch + pool + matmul_flops_encoder(
        seq, cfg.vision.hidden_size, cfg.vision.depth,
        cfg.vision.mlp_ratio))


def text_flops(cfg, seq: int) -> float:
    pool = 2 * cfg.text.hidden_size ** 2
    return pool + matmul_flops_encoder(
        seq, cfg.text.hidden_size, cfg.text.depth, cfg.text.mlp_ratio)


def timed(fn, *args, iters: int = 20) -> float:
    """Relay-safe timing: distinct pre-staged inputs, host read of the
    last scalar to force the queue (see bench.py)."""
    out = fn(*args)          # compile + warmup
    float(out)
    mk = jax.jit(lambda base, i: base + 1e-2 * i)
    variants = [mk(args[1], jnp.float32(i)) for i in range(iters)]
    jax.block_until_ready(variants)
    t0 = time.perf_counter()
    outs = [fn(args[0], variants[i], *args[2:]) for i in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters


def timed_chain(step_fn, params, x, *rest, iters: int = 20,
                perturb=None) -> float:
    """Device-only timing: one jitted program `lax.scan`s the step over
    `iters` on-device-perturbed inputs and returns a single scalar, so
    per-call relay dispatch overhead is excluded entirely.  A distinct
    warmup input keeps the relay's replay cache out of the timed call.
    """
    from jax import lax

    if perturb is None:
        def perturb(x0, i):
            return x0 * (1.0 + 1e-3 * i)

    @jax.jit
    def chain(p, x0, *r):
        def body(acc, i):
            return acc + step_fn(p, perturb(x0, i), *r), None
        acc, _ = lax.scan(
            body, jnp.float32(0),
            jnp.arange(iters, dtype=jnp.float32))
        return acc

    # compile + warmup on a distinct input (replay-cache defeat)
    float(chain(params, perturb(x, jnp.float32(97.0)), *rest))
    t0 = time.perf_counter()
    float(chain(params, x, *rest))
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", type=str,
                        default="results/mfu_analysis.json")
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[256, 384])
    parser.add_argument("--iters", type=int, default=20)
    # MFU experiments (VERDICT r2 #9): MXU-friendly sequence padding
    # (197 -> 256) and wider attention heads (768/6 = 128 = systolic
    # contraction depth). Useful-FLOPs accounting is unchanged — the
    # analytic counts below always use the unpadded sequence.
    parser.add_argument("--seq_pad_to", type=int, default=0)
    parser.add_argument("--vision_heads", type=int, default=None)
    parser.add_argument("--fused_qkv", action="store_true",
                        help="one E->3E QKV GEMM per self-attention "
                             "(round-5 MFU lever) in BOTH towers")
    args = parser.parse_args(argv)

    import dataclasses

    from radar_tpu.core.config import RadarConfig, tiny_config
    from radar_tpu.models.experts import create_model
    from radar_tpu.models.text import TextEncoder
    from radar_tpu.models.vision import VisionTransformer

    on_tpu = jax.default_backend() == "tpu"
    cfg = RadarConfig() if on_tpu else tiny_config()
    vkw = {}
    if args.seq_pad_to:
        vkw["seq_pad_to"] = args.seq_pad_to
    if args.vision_heads:
        vkw["num_heads"] = args.vision_heads
    if args.fused_qkv:
        vkw["fused_qkv"] = True
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, fused_qkv=True))
    if vkw:
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, **vkw))
    if not on_tpu:
        args.batches = [8]
        args.iters = 3
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    seq = min(128, cfg.text.max_length)

    rng = np.random.default_rng(0)
    rows = []
    for batch in args.batches:
        pv = jnp.asarray(rng.normal(
            0.5, 0.3, (batch, cfg.vision.image_size,
                       cfg.vision.image_size, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(
            0, cfg.text.vocab_size, (batch, seq)), jnp.int32)
        mask = jnp.ones((batch, seq), jnp.int32)

        # full expert
        model = create_model("baseline", cfg.vision, cfg.text,
                             cfg.expert, dtype=dtype)
        params = jax.jit(lambda k: model.init(k, pv, ids, mask))(
            jax.random.key(0))["params"]
        full = jax.jit(lambda p, x, i, m: jnp.sum(model.apply(
            {"params": p}, x, i, m, deterministic=True)))
        dt = timed(full, params, pv, ids, mask, iters=args.iters)
        fl = (vit_flops(cfg) + text_flops(cfg, seq)) * batch
        rows.append({"component": "expert_full", "batch": batch,
                     "ms": dt * 1e3, "gflops": fl / 1e9,
                     "tflops": fl / dt / 1e12,
                     "mfu": fl / dt / 1e12 / PEAK_TFLOPS,
                     "images_per_sec": batch / dt})

        # same model, scan-chained on device: true compute MFU with
        # relay dispatch overhead excluded
        def full_step(p, x, i, m):
            return jnp.sum(model.apply({"params": p}, x, i, m,
                                       deterministic=True))
        dt = timed_chain(full_step, params, pv, ids, mask,
                         iters=args.iters)
        rows.append({"component": "expert_full_chained", "batch": batch,
                     "ms": dt * 1e3, "gflops": fl / 1e9,
                     "tflops": fl / dt / 1e12,
                     "mfu": fl / dt / 1e12 / PEAK_TFLOPS,
                     "images_per_sec": batch / dt})

        # vision tower alone
        vt = VisionTransformer(cfg.vision, dtype)
        vparams = jax.jit(lambda k: vt.init(k, pv))(
            jax.random.key(0))["params"]
        vis = jax.jit(lambda p, x: jnp.sum(
            vt.apply({"params": p}, x)["pooler_output"]))
        dt = timed(vis, vparams, pv, iters=args.iters)
        fl = vit_flops(cfg) * batch
        rows.append({"component": "vision_vit", "batch": batch,
                     "ms": dt * 1e3, "gflops": fl / 1e9,
                     "tflops": fl / dt / 1e12,
                     "mfu": fl / dt / 1e12 / PEAK_TFLOPS,
                     "images_per_sec": batch / dt})

        def vis_step(p, x):
            return jnp.sum(vt.apply({"params": p}, x)["pooler_output"])
        dt = timed_chain(vis_step, vparams, pv, iters=args.iters)
        rows.append({"component": "vision_vit_chained", "batch": batch,
                     "ms": dt * 1e3, "gflops": fl / 1e9,
                     "tflops": fl / dt / 1e12,
                     "mfu": fl / dt / 1e12 / PEAK_TFLOPS,
                     "images_per_sec": batch / dt})

        # text tower alone (time vs its own flops; input variants are
        # floats added to embeddings is not possible -> vary ids)
        tt = TextEncoder(cfg.text, dtype)
        tparams = jax.jit(lambda k: tt.init(k, ids, mask))(
            jax.random.key(0))["params"]

        def txt(p, i, m):
            return jnp.sum(tt.apply({"params": p}, i,
                                    m)["pooler_output"])
        txt_j = jax.jit(txt)
        float(txt_j(tparams, ids, mask))
        variants = [jnp.asarray(rng.integers(
            0, cfg.text.vocab_size, (batch, seq)), jnp.int32)
            for _ in range(args.iters)]
        jax.block_until_ready(variants)
        t0 = time.perf_counter()
        outs = [txt_j(tparams, v, mask) for v in variants]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        fl = text_flops(cfg, seq) * batch
        rows.append({"component": "text_tower", "batch": batch,
                     "ms": dt * 1e3, "gflops": fl / 1e9,
                     "tflops": fl / dt / 1e12,
                     "mfu": fl / dt / 1e12 / PEAK_TFLOPS,
                     "images_per_sec": batch / dt})

        def txt_step(p, i, m):
            return jnp.sum(tt.apply({"params": p}, i,
                                    m)["pooler_output"])
        dt = timed_chain(
            txt_step, tparams, ids, mask, iters=args.iters,
            perturb=lambda i0, i: (i0 + i.astype(jnp.int32))
            % cfg.text.vocab_size)
        rows.append({"component": "text_tower_chained", "batch": batch,
                     "ms": dt * 1e3, "gflops": fl / 1e9,
                     "tflops": fl / dt / 1e12,
                     "mfu": fl / dt / 1e12 / PEAK_TFLOPS,
                     "images_per_sec": batch / dt})

    variant = ""
    if args.seq_pad_to:
        variant += f" seq_pad_to={args.seq_pad_to}"
    if args.vision_heads:
        variant += f" heads={args.vision_heads}"
    if args.fused_qkv:
        variant += " fused_qkv"
    result = {"peak_tflops": PEAK_TFLOPS,
              "backend": jax.default_backend(),
              "config": ("quality (ViT-B/16 + 6-layer text)"
                         if on_tpu else "tiny(cpu)") + variant,
              "rows": rows}
    import os
    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    atomic_write_json(args.output, result, indent=2)
    for r in rows:
        print(f"{r['component']:>12} B={r['batch']:<4} "
              f"{r['ms']:8.2f} ms  {r['tflops']:6.1f} TF/s  "
              f"MFU {100 * r['mfu']:5.1f}%  "
              f"{r['images_per_sec']:7.0f} samp/s")
    return result


if __name__ == "__main__":
    main()
