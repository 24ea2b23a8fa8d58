"""Benchmark: expert-model inference throughput (CXR images/sec/chip).

Runs the serving-preset expert (ViT-B/32-width vision tower + 4-layer
clinical-text tower, bf16, batch 512 — ``radar_tpu.core.config.
serving_config``) and prints ONE JSON line.  ``vs_baseline`` is against
the driver-set north star of 5,000 images/sec/chip (BASELINE.json:5;
the reference publishes no measured throughput — SURVEY.md §6).

Measurement notes (see .claude/skills/verify/SKILL.md): the axon TPU
tunnel replay-caches identical computations and ``block_until_ready``
does not reliably fence small programs, so the bench (a) pre-stages
ITERS distinct device-resident inputs, (b) dispatches the pipelined
sequence, and (c) forces completion by reading the last output's value
to host.  Set RADAR_BENCH_CONFIG=quality for the ViT-B/16 training
config instead.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 5000.0


def main() -> None:
    from radar_tpu.core.config import (RadarConfig, serving_config,
                                       tiny_config)
    from radar_tpu.models.experts import create_model

    import dataclasses

    on_tpu = jax.default_backend() == "tpu"
    preset = os.environ.get("RADAR_BENCH_CONFIG", "serving")
    if not on_tpu:  # CPU smoke fallback so bench.py always runs
        cfg, batch = tiny_config(), 16
    elif preset.startswith("quality"):
        cfg, batch = RadarConfig(), 256
    else:
        cfg, batch = serving_config(), 512
    # operating-point probe (batch is a serving choice, not a model
    # property): RADAR_BENCH_BATCH=1024 python bench.py
    batch = int(os.environ.get("RADAR_BENCH_BATCH", batch))
    # e.g. RADAR_BENCH_CONFIG=serving_int8 / quality_aqt
    qmode = next((q for q in ("int8", "aqt") if preset.endswith(q)), None)
    if qmode:
        cfg = dataclasses.replace(
            cfg,
            vision=dataclasses.replace(cfg.vision, quant=qmode),
            text=dataclasses.replace(cfg.text, quant=qmode))

    seq = min(128, cfg.text.max_length)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = create_model("baseline", cfg.vision, cfg.text, cfg.expert,
                         dtype=dtype)

    rng = np.random.default_rng(0)
    pixel_values = jnp.asarray(
        rng.normal(0.5, 0.3, (batch, cfg.vision.image_size,
                              cfg.vision.image_size, 3)), jnp.float32)
    input_ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (batch, seq)), jnp.int32)
    attention_mask = jnp.ones((batch, seq), jnp.int32)

    params = jax.jit(lambda k: model.init(
        k, pixel_values, input_ids, attention_mask))(
        jax.random.key(0))["params"]

    @jax.jit
    def forward(params, pv, ids, mask):
        logits = model.apply({"params": params}, pv, ids, mask,
                             deterministic=True)
        return jnp.sum(logits)  # scalar read fences completion

    # warmup / compile
    float(forward(params, pixel_values, input_ids, attention_mask))

    iters = 20 if on_tpu else 3
    mk = jax.jit(lambda base, i: base + 1e-2 * i)
    pvs = [mk(pixel_values, jnp.float32(i)) for i in range(iters)]
    jax.block_until_ready(pvs)
    t0 = time.perf_counter()
    outs = [forward(params, pvs[i], input_ids, attention_mask)
            for i in range(iters)]
    float(outs[-1])  # host read of the last value forces the queue
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "expert_inference_images_per_sec_per_chip",
        "value": round(float(img_per_sec), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(float(img_per_sec / BASELINE_IMG_PER_SEC), 4),
    }))


if __name__ == "__main__":
    main()
