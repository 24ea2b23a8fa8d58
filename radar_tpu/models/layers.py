"""Shared transformer building blocks (Flax linen).

One encoder implementation serves the vision tower, the clinical-text
tower, the fusion stack and the report decoder — sized by config, with
a uniform dtype policy (params fp32, compute dtype configurable, matmul
accumulation fp32 via ``preferred_element_type`` inside the attention
op).  Optional ``remat`` wraps each block in ``jax.checkpoint`` to trade
FLOPs for HBM.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention

Dtype = jnp.dtype


def _dense_kwargs(quant) -> dict:
    """``nn.Dense`` kwargs for the requested precision — one of
    ``False``/``"none"`` (float), ``True``/``"int8"`` (our hand-rolled
    W8A8 dynamic-quant dot_general) or ``"aqt"`` (AQT v2 int8
    dot_general — emits native s8 dots for the MXU's 2x int8 rate).
    Param trees are identical in every mode."""
    if quant in (False, None, "", "none"):
        return {}
    if quant == "aqt":
        from ..ops.quant import aqt_dot_general_cls
        return {"dot_general_cls": aqt_dot_general_cls()}
    from ..ops.quant import int8_dot_general
    return {"dot_general": int8_dot_general}


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool | str = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dk = _dense_kwargs(self.quant)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1",
                     **dk)(x)
        # exact (erf) GELU for numerical parity with imported HF weights
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2",
                     **dk)(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """MHA over [B, S, E]; supports self- and cross-attention."""
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    causal: bool = False
    quant: bool | str = False
    #: self-attention only: one E->3E projection instead of three
    #: E->E GEMMs (single weight load, one bigger MXU matmul).
    #: Different param tree ("qkv") — opt-in, see VisionConfig.
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, kv=None, mask=None, *, deterministic: bool = True):
        is_self = kv is None
        kv = x if kv is None else kv
        e = x.shape[-1]
        assert e % self.num_heads == 0, "hidden not divisible by heads"
        d = e // self.num_heads
        dk = _dense_kwargs(self.quant)

        def split_heads(y):
            return y.reshape(*y.shape[:-1], self.num_heads, d).transpose(
                0, 2, 1, 3)

        def heads(name, inp):
            return split_heads(
                nn.Dense(e, dtype=self.dtype, name=name, **dk)(inp))

        if self.fused_qkv and is_self:
            y = nn.Dense(3 * e, dtype=self.dtype, name="qkv", **dk)(x)
            q, k, v = (split_heads(y[..., i * e:(i + 1) * e])
                       for i in range(3))
        else:
            q = heads("q", x)
            k = heads("k", kv)
            v = heads("v", kv)
        if mask is not None and mask.ndim == 2:   # [B, Sk] padding mask
            mask = mask[:, None, None, :].astype(bool)
        out = dot_product_attention(q, k, v, mask=mask, causal=self.causal)
        out = out.transpose(0, 2, 1, 3).reshape(*x.shape[:-1], e)
        out = nn.Dense(e, dtype=self.dtype, name="out", **dk)(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool | str = False
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        # ``deterministic`` is positional-or-keyword (not kw-only) so
        # the remat wrapper can mark it static via static_argnums
        e = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        h = MultiHeadAttention(self.num_heads, self.dropout_rate,
                               self.dtype, quant=self.quant,
                               fused_qkv=self.fused_qkv,
                               name="attn")(
            h, mask=mask, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = Mlp(int(e * self.mlp_ratio), e, self.dropout_rate,
                self.dtype, quant=self.quant,
                name="mlp")(h, deterministic=deterministic)
        return x + h


class TransformerEncoder(nn.Module):
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    remat: bool = False
    quant: bool | str = False
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        block_cls = EncoderBlock
        if self.remat:
            block_cls = nn.remat(EncoderBlock, static_argnums=(3,),
                                 prevent_cse=False)
        for i in range(self.depth):
            # deterministic passed POSITIONALLY: under remat it is the
            # static_argnums=(3,) argument (self=0, x=1, mask=2)
            x = block_cls(self.num_heads, self.mlp_ratio,
                          self.dropout_rate, self.dtype,
                          quant=self.quant, fused_qkv=self.fused_qkv,
                          name=f"block_{i}")(
                x, mask, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)


def pool_tokens(hidden: jnp.ndarray, mode: str,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pool [B, S, E] -> [B, E]. "cls" takes token 0; "mean" masks pads."""
    if mode == "cls":
        return hidden[:, 0]
    if mask is None:
        return jnp.mean(hidden, axis=1)
    m = mask.astype(hidden.dtype)[..., None]
    return jnp.sum(hidden * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0)
