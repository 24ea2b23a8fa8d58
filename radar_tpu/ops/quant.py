"""Int8 (W8A8) inference path for the MXU.

TPU v5e executes int8 x int8 -> int32 on the MXU at twice the bf16
rate, so a W8A8 forward roughly doubles serving throughput where
matmuls dominate.  This module provides ``int8_dot_general`` — a
drop-in for the ``dot_general`` hook that ``flax.linen.Dense`` exposes
— using *dynamic* symmetric quantization:

- activations: per-row scale (max-abs over the contracted axis),
  computed on the fly — no calibration pass needed;
- weights: per-output-channel scale (max-abs over the contracted
  axis).  Weights stay fp32 in the checkpoint (the param tree is
  unchanged); they are quantized inside the forward, which costs
  O(K*N) per layer against the O(M*K*N) matmul — negligible, and XLA
  hoists it when the params are donated constants.

Quantization error for transformer-scale Dense layers is ~1e-2
relative — fine for serving (parity asserted in tests/test_quant.py),
not for training.  Only the plain Dense pattern is handled (contract
one axis of each operand, no batch dims) — exactly what ``nn.Dense``
emits; anything else falls back to the float path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """W8A8 dynamic-quant replacement for ``lax.dot_general``."""
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb or len(lc) != 1 or len(rc) != 1:
        # not the Dense pattern -> float fallback
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type)

    lax_c, rax_c = lc[0], rc[0]
    # per-row activation scale over the contracted axis
    ls = jnp.max(jnp.abs(lhs).astype(jnp.float32), axis=lax_c,
                 keepdims=True)
    ls = jnp.maximum(ls, 1e-8) / 127.0
    lq = jnp.clip(jnp.round(lhs.astype(jnp.float32)
                            / ls), -127, 127).astype(jnp.int8)
    # per-output-channel weight scale over the contracted axis
    ws = jnp.max(jnp.abs(rhs).astype(jnp.float32), axis=rax_c,
                 keepdims=True)
    ws = jnp.maximum(ws, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(rhs.astype(jnp.float32)
                            / ws), -127, 127).astype(jnp.int8)

    out = jax.lax.dot_general(lq, wq, dimension_numbers,
                              preferred_element_type=jnp.int32)
    # rescale: ls loses its contracted axis, ws broadcasts over outputs
    ls_out = jnp.squeeze(ls, axis=lax_c)
    ws_out = jnp.squeeze(ws, axis=rax_c)
    scaled = (out.astype(jnp.float32)
              * ls_out.reshape(*ls_out.shape, *([1] * ws_out.ndim))
              * ws_out)
    if preferred_element_type is not None:
        return scaled.astype(preferred_element_type)
    return scaled.astype(lhs.dtype)


def aqt_dot_general_cls():
    """``nn.Dense(dot_general_cls=...)`` factory backed by AQT v2.

    AQT's int8 dot_general lowers to native s8xs8->s32 dots (the MXU's
    2x int8 rate on v5e) with production-grade scale handling — the
    preferred serving-quant backend when the ``aqt`` package is
    available (``vision.quant = "aqt"``).  Stateless dynamic
    quantization: no extra params, no calibration, no PRNG
    (``prng_name=None`` disables stochastic rounding).
    """
    from aqt.jax.v2 import config as aqt_config
    from aqt.jax.v2.flax import aqt_flax

    cfg = aqt_config.dot_general_make(lhs_bits=8, rhs_bits=8)

    def make(**kw):
        return aqt_flax.AqtDotGeneral(cfg, prng_name=None, **kw)

    return make
