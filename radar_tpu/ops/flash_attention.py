"""Pallas TPU flash attention (forward) with recompute backward.

Never materialises the [S, S] logits in HBM: each (batch*head, q-block)
program streams K/V blocks through VMEM with online-softmax
accumulation in fp32 scratch — the standard flash pattern mapped to the
MXU (q@kT and p@v per block) and VPU (exp/max/rescale).

Why this exists: XLA's unfused path writes ~0.5 GB of fp32 logits per
ViT-B layer at batch 256 (HBM-bound, ~20% of forward time).  This
kernel keeps everything resident in VMEM.

Supports ragged sequence tails (``kv_len`` masking) and causal masking,
so the vision encoder (S=197 padded to 256) and the decoder prefill can
both use it.  Backward = exact-attention recompute via ``jax.vjp`` on
the reference einsum implementation (correct, unfused; a fused backward
kernel is future work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  kv_len: int, q_offset_blocks: int, causal: bool,
                  scale: float):
    """One (batch*head, q-block) program.

    q_ref: [1, block_q, D]; k_ref/v_ref: [1, S_pad, D];
    o_ref: [1, block_q, D].
    """
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    s_pad = k_ref.shape[1]
    num_k_blocks = s_pad // block_k

    q = q_ref[0].astype(jnp.float32) * scale            # [bq, D]
    qi = pl.program_id(1)
    q_pos = (qi * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    for j in range(num_k_blocks):
        k = k_ref[0, j * block_k:(j + 1) * block_k, :].astype(jnp.float32)
        v = v_ref[0, j * block_k:(j + 1) * block_k, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, bk]
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32,
                                            (block_q, block_k), 1))
        valid = k_pos < kv_len
        if causal:
            valid = valid & (k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = m_new

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, *, causal: bool, kv_len: int,
                   block_q: int = 128, block_k: int = 128,
                   interpret: bool = False):
    """q/k/v: [BH, S_pad, D] with S_pad % block == 0."""
    bh, s_pad, d = q.shape
    scale = 1.0 / (d ** 0.5)
    grid = (bh, s_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=kv_len,
        q_offset_blocks=0, causal=causal, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _reference(q, k, v, causal):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        s = q.shape[-2]
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, causal: bool = False,
                    interpret: bool | None = None):
    """Flash attention over [B, H, S, D].

    S is padded to a multiple of 128 internally; padded key positions
    are masked out (so outputs for real positions are exact).
    ``interpret=None`` auto-selects interpreter mode off-TPU.
    """
    return _flash_impl(q, k, v, causal, interpret)


def _flash_impl(q, k, v, causal, interpret):
    b, h, s, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block = 128
    s_pad = -(-s // block) * block
    pad = s_pad - s

    def prep(x):
        x = x.reshape(b * h, s, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    out = _flash_forward(prep(q), prep(k), prep(v), causal=causal,
                         kv_len=s, interpret=interpret)
    return out[:, :s, :].reshape(b, h, s, d)


def _flash_fwd(q, k, v, causal, interpret):
    return _flash_impl(q, k, v, causal, interpret), (q, k, v)


def _flash_bwd(causal, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
