"""Benchmark: expert-model forward throughput (CXR images/sec/chip).

Runs the baseline expert (ViT-B/16-class vision tower + 6-layer text
tower, bf16) in inference on the available chip and prints ONE JSON
line.  ``vs_baseline`` is measured against the driver-set north star of
5,000 images/sec/chip (BASELINE.json:5; the reference publishes no
measured throughput — SURVEY.md §6).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 5000.0


def main() -> None:
    from radar_tpu.core.config import RadarConfig
    from radar_tpu.models.experts import create_model

    cfg = RadarConfig()
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:  # CPU smoke fallback so bench.py always runs
        from radar_tpu.core.config import tiny_config
        cfg = tiny_config()

    batch = 256 if on_tpu else 16
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
        return model.apply({"params": params}, pv, ids, mask,
                           deterministic=True)

    # warmup / compile
    forward(params, pixel_values, input_ids, attention_mask
            ).block_until_ready()

    # Pre-stage ITERS distinct device-resident inputs so every call is a
    # genuinely different computation (no replay caching), then time the
    # pipelined dispatch with a single sync at the end — steady-state
    # serving throughput.
    iters = 20 if on_tpu else 3
    mk = jax.jit(lambda i: pixel_values + 1e-4 * i)
    pvs = [mk(jnp.float32(i)) for i in range(iters)]
    jax.block_until_ready(pvs)
    t0 = time.perf_counter()
    outs = [forward(params, pvs[i], input_ids, attention_mask)
            for i in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    out = outs[-1]
    del out

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "expert_forward_images_per_sec_per_chip",
        "value": round(float(img_per_sec), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(float(img_per_sec / BASELINE_IMG_PER_SEC), 4),
    }))


if __name__ == "__main__":
    main()
