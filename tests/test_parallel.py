"""Parallelism tests: TP sharding rules, sharded init, and ring
(context-parallel) attention parity on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from radar_tpu.core.mesh import MODEL_AXIS, DATA_AXIS
from radar_tpu.parallel.context import (ring_attention,
                                        ring_attention_reference)
from radar_tpu.parallel.sharding import (describe_shardings,
                                         param_shardings, spec_for_path)


def test_tp_rules(mesh8):
    assert spec_for_path("encoder/block_0/attn/q/kernel", (128, 128),
                        mesh8) == P(None, MODEL_AXIS)
    assert spec_for_path("encoder/block_0/attn/out/kernel", (128, 128),
                        mesh8) == P(MODEL_AXIS, None)
    assert spec_for_path("encoder/block_0/mlp/fc1/kernel", (128, 512),
                        mesh8) == P(None, MODEL_AXIS)
    # non-divisible dims fall back to replication
    assert spec_for_path("encoder/block_0/mlp/fc1/kernel", (128, 127),
                        mesh8) == P()
    assert spec_for_path("encoder/ln_final/scale", (128,), mesh8) == P()


def test_param_shardings_on_model(cfg, batch, mesh8):
    from radar_tpu.models.experts import create_model
    model = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    shape = jax.eval_shape(
        lambda: model.init(jax.random.key(0), batch["pixel_values"],
                           batch["input_ids"],
                           batch["attention_mask"])["params"])
    shardings = param_shardings(shape, mesh8)
    desc = describe_shardings(shardings)
    sharded = [k for k, v in desc.items() if "model" in v]
    assert any("attn/q/kernel" in k for k in sharded)
    assert any("mlp/fc1/kernel" in k for k in sharded)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(mesh_data, causal):
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 64, 16    # s divides the 8-way axis
    q = jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.float32)
    out = ring_attention(q, k, v, mesh_data, DATA_AXIS, causal=causal)
    ref = ring_attention_reference(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_attention_jits_and_shards(mesh_data):
    """ring_attention composes under jit with sharded inputs."""
    from jax.sharding import NamedSharding
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 16)), jnp.float32)
    spec = NamedSharding(mesh_data, P(None, None, DATA_AXIS, None))
    qs = jax.device_put(q, spec)
    f = jax.jit(lambda q: ring_attention(q, q, q, mesh_data, DATA_AXIS))
    out = f(qs)
    ref = ring_attention_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_cp_prefill_matches_plain(mesh_data):
    """Decoder prefill with ring (context-parallel) attention must match
    the single-program prefill bitwise-closely, ragged masks included."""
    import jax.numpy as jnp

    from radar_tpu.core.config import DecoderConfig
    from radar_tpu.models.decoder import ReportDecoder

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, depth=2,
                        num_heads=4, max_length=64, prefix_dim=16)
    model = ReportDecoder(cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 32   # t divides the 8-way axis
    ids = jnp.asarray(rng.integers(4, 64, (b, t)), jnp.int32)
    mask = jnp.asarray(np.stack([
        (np.arange(t) < 20).astype(np.int32),
        np.ones(t, np.int32)]))
    prefix = jnp.zeros((b, cfg.prefix_dim), jnp.float32)
    params = model.init(jax.random.key(0), ids, mask, prefix)["params"]

    logits_ref, caches_ref = model.apply(
        {"params": params}, ids, mask, method=model.prefill)
    logits_cp, caches_cp = model.apply(
        {"params": params}, ids, mask, method=model.prefill,
        ring=(mesh_data, "data"))
    # padded-out positions may differ (ring zeroes fully-masked rows);
    # compare real positions only
    real = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(logits_cp)[real], np.asarray(logits_ref)[real],
        atol=2e-5, rtol=1e-4)
    for (kc, vc), (kr, vr) in zip(caches_cp, caches_ref):
        np.testing.assert_allclose(np.asarray(kc), np.asarray(kr),
                                   atol=2e-5, rtol=1e-4)


def test_generate_with_ring_matches_plain(mesh_data):
    """End-to-end serving with context-parallel prefill: generate()
    with ring=(mesh, axis) must emit the same tokens as the plain
    single-program path (the decode loop itself is unsharded)."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.core.config import DecoderConfig
    from radar_tpu.models.decoder import ReportDecoder, generate

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, depth=2,
                        num_heads=4, max_length=128, prefix_dim=16)
    model = ReportDecoder(cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 32
    ids = jnp.asarray(rng.integers(4, 64, (b, t)), jnp.int32)
    mask = jnp.asarray(np.stack([
        (np.arange(t) < 20).astype(np.int32),
        np.ones(t, np.int32)]))
    prefix = jnp.zeros((b, cfg.prefix_dim), jnp.float32)
    params = model.init(jax.random.key(0), ids, mask, prefix)["params"]

    # no prefix: S=32 divides the 8-way axis -> ring prefill active
    plain = np.asarray(generate(model, params, ids, mask,
                                max_new_tokens=12))
    ringed = np.asarray(generate(model, params, ids, mask,
                                 max_new_tokens=12,
                                 ring=(mesh_data, "data")))
    np.testing.assert_array_equal(plain, ringed)

    # with an image prefix S+1=33 is not CP-divisible: generate must
    # fall back to the plain prefill rather than crash
    plain_p = np.asarray(generate(model, params, ids, mask, prefix,
                                  max_new_tokens=12))
    ringed_p = np.asarray(generate(model, params, ids, mask, prefix,
                                   max_new_tokens=12,
                                   ring=(mesh_data, "data")))
    np.testing.assert_array_equal(plain_p, ringed_p)
