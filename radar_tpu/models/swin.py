"""SwinV2 vision encoder — the reference's *actual* pretrained backbone
(``train_expert_models.py:555`` loads ``swinv2-large``), implemented
TPU-natively and forward-equivalent to ``transformers.Swinv2Model`` so
pretrained clinical checkpoints import directly (utils/hf_import.py).

TPU-first choices:
- window partition/reverse are pure reshapes/transposes (static shapes,
  no gathers) — XLA lowers them to layout changes;
- the shifted-window attention mask, the log-spaced relative-coordinate
  table and the relative-position index are host-precomputed numpy
  constants folded into the program (they depend only on static config);
- cyclic shifts are ``jnp.roll`` (a cheap on-device permutation);
- all per-window attention runs as one batched einsum over
  ``[B*num_windows, heads, w², d]`` — the MXU sees one big matmul.

Semantics mirrored from SwinV2 (arXiv:2111.09883) as realised by the HF
implementation: cosine attention with a learnable per-head clamped
logit scale, continuous relative position bias from a 2-layer MLP,
residual *post*-norm, and patch merging between stages.
"""

from __future__ import annotations

import math
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VisionConfig


# ---------------------------------------------------------------------------
# Host-side static constants
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _rel_coords_table(window_size: int) -> np.ndarray:
    """Log-spaced continuous relative coordinates [1, 2w-1, 2w-1, 2]
    normalised to [-1, 1] (SwinV2 log-CPB input)."""
    r = np.arange(-(window_size - 1), window_size, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"),
                     axis=-1)[None]  # [1, 2w-1, 2w-1, 2]
    if window_size > 1:
        table = table / (window_size - 1)
    table = table * 8.0
    table = (np.sign(table) * np.log2(np.abs(table) + 1.0)
             / np.log2(8.0))
    return table.astype(np.float32)


@lru_cache(maxsize=None)
def _rel_pos_index(window_size: int) -> np.ndarray:
    """[w², w²] indices into the flattened (2w-1)² bias table."""
    coords = np.stack(np.meshgrid(np.arange(window_size),
                                  np.arange(window_size), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel = rel + (window_size - 1)
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1).astype(np.int32)


@lru_cache(maxsize=None)
def _shift_mask(height: int, width: int, window_size: int,
                shift_size: int) -> np.ndarray:
    """Additive mask [num_windows, w², w²] blocking attention across
    the wrap-around regions introduced by the cyclic shift."""
    img = np.zeros((height, width), np.float32)
    slices = (slice(0, -window_size),
              slice(-window_size, -shift_size),
              slice(-shift_size, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    nh, nw = height // window_size, width // window_size
    wins = img.reshape(nh, window_size, nw, window_size)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, ws², C] (pure reshape/transpose)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of ``_window_partition``."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class SwinWindowAttention(nn.Module):
    """Cosine-similarity window attention with log-CPB relative bias."""
    dim: int
    num_heads: int
    window_size: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shift_mask: np.ndarray | None = None, *,
                 deterministic: bool = True):
        nb, n, _ = x.shape  # [B*num_windows, w², C]
        h, d = self.num_heads, self.dim // self.num_heads
        # k carries no bias in SwinV2 (cosine attention is shift-free)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="k")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(x)
        q, k, v = (t.reshape(nb, n, h, d).transpose(0, 2, 1, 3)
                   for t in (q, k, v))

        # cosine attention; rsqrt(sumsq + eps) keeps the gradient finite
        # at zero vectors (jnp.linalg.norm's grad is NaN at 0)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qn = qf * jax.lax.rsqrt(
            jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
        kn = kf * jax.lax.rsqrt(
            jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qn, kn)
        logit_scale = self.param(
            "logit_scale",
            lambda _, s: jnp.full(s, math.log(10.0), jnp.float32),
            (h, 1, 1))
        attn = attn * jnp.exp(jnp.minimum(logit_scale,
                                          math.log(100.0)))[None]

        # continuous relative position bias: MLP over the static
        # log-spaced coordinate table, gathered per token pair
        table = jnp.asarray(_rel_coords_table(self.window_size))
        cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, dtype=jnp.float32,
                       name="cpb_fc2")(cpb)
        bias_table = cpb.reshape(-1, h)
        idx = jnp.asarray(_rel_pos_index(self.window_size).reshape(-1))
        bias = bias_table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + 16.0 * nn.sigmoid(bias)[None]

        if shift_mask is not None:
            nw = shift_mask.shape[0]
            mask = jnp.asarray(shift_mask)[None, :, None]  # [1,nW,1,n,n]
            attn = attn.reshape(-1, nw, h, n, n) + mask
            attn = attn.reshape(-1, h, n, n)

        probs = nn.softmax(attn, axis=-1)
        probs = nn.Dropout(self.dropout_rate)(
            probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs,
                         v.astype(jnp.float32))
        out = out.transpose(0, 2, 1, 3).reshape(nb, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        name="out")(out.astype(self.dtype))


class SwinBlock(nn.Module):
    """One SwinV2 layer: (shifted-)window attention + MLP, residual
    post-norm (norm applied to the branch output, v2-style)."""
    dim: int
    num_heads: int
    input_resolution: tuple[int, int]
    window_size: int          # target; clamped to the resolution
    shift: bool               # whether this block uses a shifted window
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        hgt, wid = self.input_resolution
        ws = min(self.window_size, hgt, wid)
        ss = (self.window_size // 2
              if self.shift and min(hgt, wid) > ws else 0)
        b, _, c = x.shape
        shortcut = x
        x = x.reshape(b, hgt, wid, c)
        pad_b, pad_r = (-hgt) % ws, (-wid) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = hgt + pad_b, wid + pad_r
        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        windows = _window_partition(x, ws)
        mask = _shift_mask(hp, wp, ws, ss) if ss > 0 else None
        attn = SwinWindowAttention(c, self.num_heads, ws,
                                   self.dropout_rate, self.dtype,
                                   name="attn")(
            windows, mask, deterministic=deterministic)
        x = _window_reverse(attn, ws, hp, wp)
        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :hgt, :wid]
        x = x.reshape(b, hgt * wid, c)
        x = shortcut + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)

        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return x + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(y)


class PatchMerging(nn.Module):
    """2x2 neighbourhood concat -> Linear(4C->2C, no bias) -> LN."""
    input_resolution: tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hgt, wid = self.input_resolution
        b, _, c = x.shape
        x = x.reshape(b, hgt, wid, c)
        if hgt % 2 or wid % 2:
            x = jnp.pad(x, ((0, 0), (0, hgt % 2), (0, wid % 2), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
                            axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SwinStage(nn.Module):
    dim: int
    depth: int
    num_heads: int
    input_resolution: tuple[int, int]
    window_size: int
    downsample: bool
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # positional-or-keyword so nn.remat can mark it static
        for j in range(self.depth):
            x = SwinBlock(self.dim, self.num_heads,
                          self.input_resolution, self.window_size,
                          shift=(j % 2 == 1), mlp_ratio=self.mlp_ratio,
                          dropout_rate=self.dropout_rate,
                          dtype=self.dtype, name=f"block_{j}")(
                x, deterministic=deterministic)
        if self.downsample:
            x = PatchMerging(self.input_resolution, self.dtype,
                             name="downsample")(x)
        return x


class SwinV2Transformer(nn.Module):
    """Hierarchical SwinV2 encoder.

    Interface-compatible with ``VisionTransformer``: returns
    ``{"last_hidden_state": [B, S, E_final], "pooler_output":
    [B, E_final]}`` where ``E_final = hidden_size * 2**(num_stages-1)``
    and the pooler is sequence mean (HF ``AdaptiveAvgPool1d``).

    ``config.hidden_size`` is the SwinV2 ``embed_dim``;
    ``config.depths`` / ``config.stage_heads`` / ``config.window_size``
    set the stage layout.
    """
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values, *, deterministic: bool = True):
        cfg = self.config
        depths = cfg.depths
        heads = cfg.stage_heads or tuple(
            cfg.num_heads * (2 ** i) for i in range(len(depths)))
        x = pixel_values.astype(self.dtype)
        x = nn.Conv(cfg.hidden_size,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="embed_norm")(x)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        res = (gh, gw)
        dim = cfg.hidden_size
        # deterministic passed POSITIONALLY: under remat it is the
        # static_argnums=(2,) argument (self=0, x=1)
        stage_cls = (nn.remat(SwinStage, static_argnums=(2,),
                              prevent_cse=False)
                     if self.remat else SwinStage)
        for i, depth in enumerate(depths):
            x = stage_cls(dim, depth, heads[i], res, cfg.window_size,
                          mlp_ratio=cfg.mlp_ratio,
                          dropout_rate=cfg.dropout_rate,
                          downsample=(i < len(depths) - 1),
                          dtype=self.dtype, name=f"stage_{i}")(
                x, deterministic)
            if i < len(depths) - 1:
                res = ((res[0] + 1) // 2, (res[1] + 1) // 2)
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        pooled = jnp.mean(x.astype(jnp.float32), axis=1)
        return {"last_hidden_state": x, "pooler_output": pooled}
