"""Context (sequence) parallelism: ring attention over XLA collectives.

The reference caps sequences at 512 tokens and has no distributed
anything (SURVEY.md §5 "long-context": none).  This module adds the
capability for long retrieved-evidence decode contexts: Q/K/V are
sharded along the *sequence* axis over the mesh; each device computes
flash-style online-softmax partials of its local queries against the
resident K/V block, then rotates K/V around the ring with
``jax.lax.ppermute`` — after P steps every query has seen every key,
with peak memory O(S/P) per device and the K/V transfer riding ICI.

Pure ``shard_map`` + collectives (no Pallas), so it runs identically on
the CPU-simulated mesh in tests and on a real slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _local_attend(q, k, v, m, l, acc, q_offset, k_offset, causal,
                  scale, kv_valid=None):
    """One online-softmax accumulation of local q against one K/V block.

    q: [B, H, Sq, D]; k/v: [B, H, Sk, D]; m/l: [B, H, Sq, 1];
    acc: [B, H, Sq, D].  Offsets are global sequence positions of the
    first row of q / k.  ``kv_valid``: [B, Sk] bool padding mask for
    the resident K/V block.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = q.shape[-2], k.shape[-2]
        q_pos = q_offset + jax.lax.broadcasted_iota(
            jnp.int32, (sq, sk), 0)
        k_pos = k_offset + jax.lax.broadcasted_iota(
            jnp.int32, (sq, sk), 1)
        s = jnp.where((k_pos <= q_pos)[None, None], s, NEG_INF)
    if kv_valid is not None:
        s = jnp.where(kv_valid[:, None, None, :], s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    return m_new, l_new, acc_new


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str, *,
                   causal: bool = False,
                   kv_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact attention with Q/K/V sequence-sharded over ``axis``.

    Args:
      q, k, v: [B, H, S, D] global arrays (S divisible by the axis
        size); sharding/gather is handled internally via shard_map.
      mesh: the device mesh; ``axis``: mesh axis carrying the sequence.
      kv_mask: optional [B, S] padding mask (1 = real key position).
    Returns [B, H, S, D], sequence-sharded the same way.
    """
    num = mesh.shape[axis]
    s_global = q.shape[-2]
    assert s_global % num == 0, "sequence must divide the CP axis"
    s_local = s_global // num
    scale = 1.0 / (q.shape[-1] ** 0.5)
    perm = [(i, (i + 1) % num) for i in range(num)]
    has_mask = kv_mask is not None
    if not has_mask:
        kv_mask = jnp.ones(q.shape[:1] + (s_global,), jnp.bool_)
    kv_mask = kv_mask.astype(jnp.bool_)

    def kernel(q, k, v, kv_valid):
        # block shapes: [B, H, S/num, D]; kv_valid [B, S/num]
        idx = jax.lax.axis_index(axis)
        b, h, sq, d = q.shape
        qf = q.astype(jnp.float32)
        m = jnp.full((b, h, sq, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((b, h, sq, 1), jnp.float32)
        acc = jnp.zeros((b, h, sq, d), jnp.float32)
        q_offset = idx * s_local

        def body(step, carry):
            m, l, acc, k, v, kv_valid = carry
            # K/V currently resident came from device (idx - step) % num
            src = jax.lax.rem(idx - step + num, num)
            k_offset = src * s_local
            m, l, acc = _local_attend(
                qf, k.astype(jnp.float32), v, m, l, acc, q_offset,
                k_offset, causal, scale,
                kv_valid if has_mask else None)
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            kv_valid = jax.lax.ppermute(kv_valid, axis, perm)
            return m, l, acc, k, v, kv_valid

        m, l, acc, k, v, kv_valid = jax.lax.fori_loop(
            0, num, body, (m, l, acc, k, v, kv_valid))
        return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)

    spec = P(None, None, axis, None)
    mask_spec = P(None, axis)
    mapped = shard_map(kernel, mesh=mesh,
                       in_specs=(spec, spec, spec, mask_spec),
                       out_specs=spec, check_vma=False)
    return mapped(q, k, v, kv_mask)


def ring_attention_reference(q, k, v, causal=False):
    """Unsharded exact attention for parity tests."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        n = q.shape[-2]
        s = jnp.where(jnp.tril(jnp.ones((n, n), bool))[None, None],
                      s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w,
                      v.astype(jnp.float32)).astype(q.dtype)
