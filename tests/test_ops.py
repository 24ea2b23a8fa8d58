"""Op-level tests: flash attention (interpret mode on CPU) vs the
reference einsum attention, and the routing layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.ops.attention import dot_product_attention
from radar_tpu.ops.flash_attention import _reference, flash_attention


@pytest.mark.parametrize("shape,causal", [
    ((2, 4, 197, 64), False),   # ViT shape (ragged pad to 256)
    ((2, 4, 256, 64), True),    # decoder shape
    ((1, 2, 130, 128), False),  # head dim 128
])
def test_flash_matches_reference(shape, causal):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    out = flash_attention(q, k, v, causal, interpret=True)
    ref = _reference(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_gradients_match():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (1, 2, 197, 64)), jnp.float32)

    def loss_flash(q):
        return jnp.sum(flash_attention(q, q, q, False, True) ** 2)

    def loss_ref(q):
        return jnp.sum(_reference(q, q, q, False) ** 2)

    g1 = jax.grad(loss_flash)(q)
    g2 = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("shape,causal", [
    ((1, 2, 197, 64), False),   # ragged pad (exercises q-row masking)
    ((1, 2, 256, 64), True),    # causal, aligned
    ((1, 1, 130, 128), False),  # head dim 128, ragged
])
def test_flash_fused_backward_per_input_grads(shape, causal):
    """The fused Pallas backward (dq + dkv kernels) must match the
    reference VJP for each of q, k, v separately."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)

    _, vjp_f = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, causal, True), q, k, v)
    _, vjp_r = jax.vjp(
        lambda q, k, v: _reference(q, k, v, causal), q, k, v)
    for got, want, name in zip(vjp_f(g), vjp_r(g), "qkv"):
        assert np.isfinite(np.asarray(got)).all(), f"d{name} not finite"
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3,
            err_msg=f"d{name} mismatch")


def test_ragged_tail_masked():
    """Padded key positions (197 -> 256 internally) must not leak."""
    rng = np.random.default_rng(2)
    s = 197
    q = jnp.asarray(rng.normal(0, 1, (1, 1, s, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (1, 1, s, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (1, 1, s, 64)), jnp.float32)
    out = flash_attention(q, k, v, False, interpret=True)
    # identical first s rows when the same data is explicitly padded
    # with huge values in the pad region (which must be ignored)
    pad = 256 - s
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)),
                 constant_values=99.0)[:, :, :s, :]
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference(q, kp, v, False)),
                               atol=2e-5, rtol=1e-4)


def test_dot_product_attention_masks():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(0, 1, (2, 2, 8, 16)), jnp.float32)
    # padding mask: key 7 masked out for batch 0
    mask = jnp.ones((2, 1, 8, 8), bool).at[0, :, :, 7].set(False)
    out = dot_product_attention(q, q, q, mask=mask)
    # recompute with key 7's value perturbed: batch 0 must not change
    q2 = q.at[:, :, 7, :].set(99.0)
    out2 = dot_product_attention(q, q2, q, mask=mask)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(out[1]), np.asarray(out2[1]))


def test_causal_masking():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(0, 1, (1, 1, 6, 8)), jnp.float32)
    out = dot_product_attention(q, q, q, causal=True)
    # position 0 attends only to itself -> output = v[0]
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               np.asarray(q[0, 0, 0]), atol=1e-5)


def test_transformer_encoder_remat_trains_and_matches():
    """train.remat=true path (quality preset): the rematerialised
    encoder must (a) accept deterministic=False with a dropout rng in
    a grad — the static_argnums wiring crashed here when
    ``deterministic`` was keyword-only — and (b) match the non-remat
    forward exactly."""
    from radar_tpu.models.layers import TransformerEncoder
    x = jnp.ones((2, 16, 32), jnp.float32)
    enc_r = TransformerEncoder(depth=2, num_heads=4, remat=True,
                               dropout_rate=0.1)
    params = enc_r.init(jax.random.key(0), x)["params"]

    def loss(p):
        return jnp.sum(enc_r.apply({"params": p}, x,
                                   deterministic=False,
                                   rngs={"dropout": jax.random.key(1)}))
    g = jax.grad(loss)(params)
    from jax.flatten_util import ravel_pytree
    assert jnp.isfinite(ravel_pytree(g)[0]).all()

    enc = TransformerEncoder(depth=2, num_heads=4, remat=False,
                             dropout_rate=0.1)
    np.testing.assert_allclose(
        np.asarray(enc.apply({"params": params}, x)),
        np.asarray(enc_r.apply({"params": params}, x)), atol=1e-6)


def test_swin_remat_trains_and_matches():
    """Same static_argnums wiring for the SwinV2 stage remat: grad
    with train-mode dropout must work and the remat forward must match
    non-remat exactly."""
    from radar_tpu.core.config import VisionConfig
    from radar_tpu.models.swin import SwinV2Transformer
    cfg = VisionConfig(image_size=32, patch_size=4, hidden_size=16,
                       depths=(1, 1), num_heads=2, window_size=4,
                       dropout_rate=0.1, arch="swinv2")
    x = jnp.ones((1, 32, 32, 3))
    enc_r = SwinV2Transformer(cfg, remat=True)
    params = enc_r.init(jax.random.key(0), x)["params"]

    def loss(p):
        return jnp.sum(enc_r.apply(
            {"params": p}, x, deterministic=False,
            rngs={"dropout": jax.random.key(1)})["pooler_output"])
    from jax.flatten_util import ravel_pytree
    assert jnp.isfinite(ravel_pytree(jax.grad(loss)(params))[0]).all()

    enc = SwinV2Transformer(cfg, remat=False)
    np.testing.assert_allclose(
        np.asarray(enc.apply({"params": params}, x)["pooler_output"]),
        np.asarray(enc_r.apply({"params": params}, x)["pooler_output"]),
        atol=1e-6)


def test_fused_qkv_matches_unfused():
    """fused_qkv=True (one E->3E GEMM) must be numerically identical
    to the three-GEMM path when its kernel/bias are the concatenation
    of the unfused q/k/v params (round-5 MFU lever)."""
    import numpy as np
    from radar_tpu.models.layers import MultiHeadAttention

    e, b, s = 32, 2, 9
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, s, e)),
                    jnp.float32)
    unfused = MultiHeadAttention(num_heads=4)
    fused = MultiHeadAttention(num_heads=4, fused_qkv=True)
    p = unfused.init(jax.random.key(0), x)["params"]
    pf = {
        "qkv": {
            "kernel": jnp.concatenate(
                [p[n]["kernel"] for n in ("q", "k", "v")], axis=1),
            "bias": jnp.concatenate(
                [p[n]["bias"] for n in ("q", "k", "v")]),
        },
        "out": p["out"],
    }
    y0 = unfused.apply({"params": p}, x)
    y1 = fused.apply({"params": pf}, x)
    assert np.allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    # cross-attention ignores the flag (falls back to q/k/v params)
    kv = jnp.asarray(np.random.default_rng(1).normal(size=(b, 5, e)),
                     jnp.float32)
    pc = fused.init(jax.random.key(1), x, kv)["params"]
    assert "q" in pc and "qkv" not in pc
