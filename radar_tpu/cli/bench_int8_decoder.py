"""Settle int8 for the decoder serving path (VERDICT r2 next #8).

Measures the decoder's per-step GEMM stack at large serving batch —
the shapes that dominate autoregressive decode:

  qkv/out projections  [B, H] x [H, H]
  mlp up/down          [B, H] x [H, 4H], [B, 4H] x [H*4, H] -> [B, H]

three ways: bf16 weights (baseline), WEIGHT-ONLY int8 (weights stored
s8 + per-channel scales, dequantised to bf16 at use — halves weight HBM
traffic, which is what matters when B is small and decode is
weight-bound), and native s8xs8 dots (W8A8 via lax.dot_general with
int32 accumulation).

Writes results/int8_decoder.json.  The axon relay replay-caches
identical computations, so each timed iteration uses a distinct
pre-staged activation (bench.py's measurement recipe).

Usage:
    python -m radar_tpu.cli.bench_int8_decoder --batches 256 1024 4096
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.bench_int8")


def _decode_step_fns(hidden: int, depth: int):
    """Returns (bf16_fn, wonly_fn, w8a8_fn), each taking (weights, x)
    and running ``depth`` x (4 square projections + up/down MLP)."""

    def bf16_fn(ws, x):
        for (wq, wk, wv, wo, wu, wd) in ws:
            for w in (wq, wk, wv, wo):
                x = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            h = jnp.dot(x, wu, preferred_element_type=jnp.bfloat16)
            x = jnp.dot(jax.nn.gelu(h), wd,
                        preferred_element_type=jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    def wonly_fn(qws, x):
        # weights arrive as (int8 values, per-out-channel scales)
        for layer in qws:
            (wq, sq), (wk, sk), (wv, sv), (wo, so), (wu, su), (wd, sd) \
                = layer
            for w, s in ((wq, sq), (wk, sk), (wv, sv), (wo, so)):
                x = jnp.dot(x, w.astype(jnp.bfloat16) * s,
                            preferred_element_type=jnp.bfloat16)
            h = jnp.dot(x, wu.astype(jnp.bfloat16) * su,
                        preferred_element_type=jnp.bfloat16)
            x = jnp.dot(jax.nn.gelu(h), wd.astype(jnp.bfloat16) * sd,
                        preferred_element_type=jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    def w8a8_fn(qws, x):
        # dynamic per-row activation quant + s8xs8 -> s32 dots
        def qdot(x, w, s):
            ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
            xi = jnp.clip(jnp.round(x / jnp.maximum(ax, 1e-8)),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xi, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.bfloat16)
                    * ax.astype(jnp.bfloat16)
                    * s.astype(jnp.bfloat16))
        for layer in qws:
            (wq, sq), (wk, sk), (wv, sv), (wo, so), (wu, su), (wd, sd) \
                = layer
            for w, s in ((wq, sq), (wk, sk), (wv, sv), (wo, so)):
                x = qdot(x, w, s)
            h = qdot(x, wu, su)
            x = qdot(jax.nn.gelu(h), wd, sd)
        return jnp.sum(x.astype(jnp.float32))

    return bf16_fn, wonly_fn, w8a8_fn


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[256, 1024, 4096])
    parser.add_argument("--hidden", type=int, default=512)
    parser.add_argument("--depth", type=int, default=6)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--output", type=str,
                        default="results/int8_decoder.json")
    args = parser.parse_args(argv)

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.batches, args.iters = [8], 3
    H, D = args.hidden, args.depth
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(0, 0.02, shape), jnp.bfloat16)

    ws = [(mk((H, H)), mk((H, H)), mk((H, H)), mk((H, H)),
           mk((H, 4 * H)), mk((4 * H, H))) for _ in range(D)]

    def quantize(w):
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
        wi = jnp.clip(jnp.round(w.astype(jnp.float32)
                                / jnp.maximum(s, 1e-8)),
                      -127, 127).astype(jnp.int8)
        return wi, s.astype(jnp.bfloat16)

    qws = [tuple(quantize(w) for w in layer) for layer in ws]
    bf16_fn, wonly_fn, w8a8_fn = _decode_step_fns(H, D)

    # useful FLOPs per call: D * (4*H*H + 8*H*H) * 2 * B
    result = {"hidden": H, "depth": D, "backend": jax.default_backend(),
              "rows": []}
    for B in args.batches:
        xs = [jnp.asarray(rng.normal(0, 1, (B, H)), jnp.bfloat16)
              for _ in range(args.iters)]
        flops = 2.0 * B * D * (4 * H * H + 8 * H * H)
        for name, fn, weights in (("bf16", bf16_fn, ws),
                                  ("int8_weight_only", wonly_fn, qws),
                                  ("int8_w8a8", w8a8_fn, qws)):
            jfn = jax.jit(fn)
            float(jfn(weights, xs[0]))  # compile + warm
            t0 = time.perf_counter()
            outs = [jfn(weights, x) for x in xs]
            float(outs[-1])  # host read fences the pipelined chain
            dt = (time.perf_counter() - t0) / args.iters
            row = {"batch": B, "variant": name, "ms": dt * 1e3,
                   "tflops": flops / dt / 1e12}
            result["rows"].append(row)
            logger.info("B=%d %s: %.3f ms (%.1f TFLOP/s)", B, name,
                        row["ms"], row["tflops"])
        base = next(r for r in result["rows"]
                    if r["batch"] == B and r["variant"] == "bf16")
        for r in result["rows"]:
            if r["batch"] == B:
                r["speedup_vs_bf16"] = base["ms"] / r["ms"]

    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    atomic_write_json(args.output, result, indent=2)
    print(json.dumps(result["rows"], indent=1))
    return result


if __name__ == "__main__":
    main()
