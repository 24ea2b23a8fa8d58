"""Pallas TPU flash attention — fused forward AND backward.

Never materialises the [S, S] logits in HBM: each (batch*head, q-block)
program streams K/V blocks through VMEM with online-softmax
accumulation in fp32 scratch — the standard flash pattern mapped to the
MXU (q@kT and p@v per block) and VPU (exp/max/rescale).

Why this exists: XLA's unfused path writes ~0.5 GB of fp32 logits per
ViT-B layer at batch 256 (HBM-bound, ~20% of forward time).  This
kernel keeps everything resident in VMEM.

Backward is the standard two-pass flash scheme: the forward also saves
the per-row logsumexp; ``dq`` is computed by a (bh, q-block) grid and
``dk``/``dv`` by a (bh, k-block) grid, each recomputing the probability
tiles in VMEM from q/k and the saved logsumexp (no [S, S] residuals in
HBM; ``D = rowsum(dO * O)`` is one cheap XLA reduction outside).

Supports ragged sequence tails (``kv_len`` masking) and causal masking,
so the vision encoder (S=197 padded to 256) and the decoder prefill can
both use it.
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


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                      block_k: int, kv_len: int, causal: bool,
                      scale: float):
    """Forward program that also writes the row logsumexp
    (``m + log(l)``) needed by the fused backward."""
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    s_pad = k_ref.shape[1]
    num_k_blocks = s_pad // block_k

    q = q_ref[0].astype(jnp.float32) * scale
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
            preferred_element_type=jnp.float32)
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
    lse_ref[0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _flash_forward(q, k, v, *, causal: bool, kv_len: int,
                   block_q: int = 128, block_k: int = 128,
                   interpret: bool = False, with_lse: bool = False):
    """q/k/v: [BH, S_pad, D] with S_pad % block == 0."""
    bh, s_pad, d = q.shape
    scale = 1.0 / (d ** 0.5)
    grid = (bh, s_pad // block_q)
    if not with_lse:
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
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
            interpret=interpret,
        )(q, k, v)
    kernel = functools.partial(
        _flash_kernel_lse, block_k=block_k, kv_len=kv_len,
        causal=causal, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q), lambda b, i: (b, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s_pad), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                         dq_ref, *, block_k: int, kv_len: int,
                         causal: bool, scale: float):
    """dq for one (bh, q-block): dq = scale * sum_j ds_j @ K_j with
    ds = p * (dO K V^T-tile - D)."""
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    s_pad = k_ref.shape[1]
    num_k_blocks = s_pad // block_k

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, None]                     # [bq, 1]
    dd = dd_ref[0][:, None]                       # [bq, 1]
    qi = pl.program_id(1)
    q_pos = (qi * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))

    dq = jnp.zeros((block_q, d), jnp.float32)
    for j in range(num_k_blocks):
        k = k_ref[0, j * block_k:(j + 1) * block_k, :].astype(jnp.float32)
        v = v_ref[0, j * block_k:(j + 1) * block_k, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32,
                                            (block_q, block_k), 1))
        # also mask padded q rows: their lse is degenerate and
        # exp(s - lse) would be inf/NaN there
        valid = (k_pos < kv_len) & (q_pos < kv_len)
        if causal:
            valid = valid & (k_pos <= q_pos)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # [bq, bk]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [bq, bk]
        ds = p * (dp - dd)
        dq = dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                          dk_ref, dv_ref, *, block_q: int, kv_len: int,
                          causal: bool, scale: float):
    """dk/dv for one (bh, k-block), streaming q blocks."""
    block_k = k_ref.shape[1]
    d = k_ref.shape[2]
    s_pad = q_ref.shape[1]
    num_q_blocks = s_pad // block_q

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    ki = pl.program_id(1)
    k_pos = (ki * block_k
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1))

    dk = jnp.zeros((block_k, d), jnp.float32)
    dv = jnp.zeros((block_k, d), jnp.float32)
    for i in range(num_q_blocks):
        q = q_ref[0, i * block_q:(i + 1) * block_q, :].astype(jnp.float32)
        do = do_ref[0, i * block_q:(i + 1) * block_q, :].astype(
            jnp.float32)
        lse = lse_ref[0, i * block_q:(i + 1) * block_q][:, None]
        dd = dd_ref[0, i * block_q:(i + 1) * block_q][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        q_pos = (i * block_q
                 + jax.lax.broadcasted_iota(jnp.int32,
                                            (block_q, block_k), 0))
        valid = (k_pos < kv_len) & (q_pos < kv_len)
        if causal:
            valid = valid & (k_pos <= q_pos)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # [bq, bk]
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [bk, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [bq, bk]
        ds = p * (dp - dd)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [bk, D]
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, *, causal: bool, kv_len: int,
                    block: int = 128, interpret: bool = False):
    """Fused backward over padded [BH, S_pad, D] tensors."""
    bh, s_pad, d = q.shape
    scale = 1.0 / (d ** 0.5)
    # D_i = rowsum(dO * O): one fused XLA elementwise+reduce, [BH, S]
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1)
    grid = (bh, s_pad // block)
    qspec = pl.BlockSpec((1, block, d), lambda b, i: (b, i, 0))
    fullspec = pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0))
    rowspec = pl.BlockSpec((1, block), lambda b, i: (b, i))
    fullrow = pl.BlockSpec((1, s_pad), lambda b, i: (b, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block,
                          kv_len=kv_len, causal=causal, scale=scale),
        grid=grid,
        in_specs=[qspec, fullspec, fullspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block,
                          kv_len=kv_len, causal=causal, scale=scale),
        grid=grid,
        in_specs=[fullspec, qspec, qspec, fullspec, fullrow, fullrow],
        out_specs=[qspec, qspec],
        out_shape=[jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype)],
        interpret=interpret,
    )(q, k, v, do, lse, dd)
    return dq, dk, dv


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


def _pad_args(q, k, v, block: int = 128):
    b, h, s, d = q.shape
    s_pad = -(-s // block) * block
    pad = s_pad - s

    def prep(x):
        x = x.reshape(b * h, s, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x
    return prep(q), prep(k), prep(v), s_pad


def _flash_impl(q, k, v, causal, interpret):
    b, h, s, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qp, kp, vp, _ = _pad_args(q, k, v)
    out = _flash_forward(qp, kp, vp, causal=causal, kv_len=s,
                         interpret=interpret)
    return out[:, :s, :].reshape(b, h, s, d)


def _flash_fwd(q, k, v, causal, interpret):
    b, h, s, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qp, kp, vp, _ = _pad_args(q, k, v)
    out_p, lse_p = _flash_forward(qp, kp, vp, causal=causal, kv_len=s,
                                  interpret=interpret, with_lse=True)
    out = out_p[:, :s, :].reshape(b, h, s, d)
    return out, (q, k, v, out_p, lse_p)


def _flash_bwd(causal, interpret, residuals, g):
    q, k, v, out_p, lse_p = residuals
    b, h, s, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qp, kp, vp, s_pad = _pad_args(q, k, v)
    gp = _pad_args(g, g, g)[0]
    dq, dk, dv = _flash_backward(qp, kp, vp, out_p, lse_p, gp,
                                 causal=causal, kv_len=s,
                                 interpret=interpret)

    def unpad(x):
        return x[:, :s, :].reshape(b, h, s, d)
    return unpad(dq), unpad(dk), unpad(dv)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
