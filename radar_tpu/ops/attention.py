"""Attention ops.

``dot_product_attention`` is the single entry point used by every model
(vision encoder, text encoder, fusion, decoder).  On TPU it can route to
a fused Pallas flash-attention kernel (``radar_tpu.ops.flash_attention``)
when shapes qualify; otherwise it lowers to an einsum chain that XLA
fuses onto the MXU.  Inputs are [B, H, S, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _reference_attention(q, k, v, mask=None):
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    try:
        from . import flash_attention  # noqa: F401
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: jnp.ndarray | None = None,
                          *, causal: bool = False,
                          use_pallas: str | bool = "auto") -> jnp.ndarray:
    """Multi-head scaled dot-product attention.

    Args:
      q, k, v: [B, H, S, D] arrays (D = head dim).
      mask: optional boolean [B, 1|H, Sq, Sk]; True = attend.
      causal: apply a causal mask (decoder self-attention).
      use_pallas: "auto" routes to the Pallas kernel on TPU when the
        sequence/head dims are tile-aligned; True forces it; False
        disables it.
    """
    # Measured on v5e (see bench notes in ops/flash_attention.py): at the
    # sequence lengths this framework runs (ViT S=197, text/decoder
    # S<=512), XLA's batched-einsum attention reaches ~50-60% MFU and
    # the per-program granularity of the Pallas kernel does not pay off;
    # the kernel is therefore explicit opt-in (use_pallas=True or
    # RADAR_USE_PALLAS=1), retained for long-context decode paths.
    import os
    route_pallas = (
        (use_pallas is True
         or (use_pallas == "auto"
             and os.environ.get("RADAR_USE_PALLAS") == "1"))
        and _pallas_available()
        and q.shape[-1] in (64, 128)
        and q.shape[-2] == k.shape[-2]
        and mask is None
    )
    if route_pallas:
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, causal=causal)

    if causal:
        sq, sk = q.shape[-2], k.shape[-2]
        cmask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        cmask = cmask[None, None]
        mask = cmask if mask is None else (mask & cmask)
    return _reference_attention(q, k, v, mask)
