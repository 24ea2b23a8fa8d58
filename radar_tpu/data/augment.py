"""On-device image augmentation.

The reference's ``MultiViewAugmentation``
(``modeling_expert_model_contrastive.py:243-280``) runs torchvision
transforms per-sample on the host.  Here augmentation is a pure jitted
function over the whole batch on device: random resized crop,
horizontal flip, brightness/contrast jitter, and gaussian noise — all
shape-static, driven by explicit PRNG keys, fused by XLA into the
input pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _random_resized_crop(key, images, min_scale: float):
    """Per-image random crop of area in [min_scale, 1], resized back."""
    b, h, w, c = images.shape
    k1, k2, k3 = jax.random.split(key, 3)
    scales = jax.random.uniform(k1, (b,), minval=min_scale, maxval=1.0)
    crop_h = jnp.maximum((scales * h).astype(jnp.int32), 1)
    crop_w = jnp.maximum((scales * w).astype(jnp.int32), 1)
    top = (jax.random.uniform(k2, (b,))
           * (h - crop_h).astype(jnp.float32)).astype(jnp.int32)
    left = (jax.random.uniform(k3, (b,))
            * (w - crop_w).astype(jnp.float32)).astype(jnp.int32)

    # build per-image sampling grids (static shapes; gather-based resize)
    ys = jnp.linspace(0.0, 1.0, h)[None, :]          # [1, H]
    xs = jnp.linspace(0.0, 1.0, w)[None, :]
    src_y = (top[:, None] + ys * (crop_h[:, None] - 1)).astype(jnp.int32)
    src_x = (left[:, None] + xs * (crop_w[:, None] - 1)).astype(jnp.int32)
    batch_idx = jnp.arange(b)[:, None, None]
    return images[batch_idx, src_y[:, :, None], src_x[:, None, :], :]


@partial(jax.jit, static_argnames=("min_scale", "flip", "noise_std"))
def augment_batch(key: jax.Array, images: jnp.ndarray,
                  min_scale: float = 0.8, flip: bool = True,
                  brightness: float = 0.2, contrast: float = 0.2,
                  noise_std: float = 0.02) -> jnp.ndarray:
    """One augmented view of a [B, H, W, C] float batch."""
    kc, kf, kb, kk, kn = jax.random.split(key, 5)
    out = _random_resized_crop(kc, images, min_scale)
    if flip:
        do = jax.random.bernoulli(kf, 0.5, (images.shape[0], 1, 1, 1))
        out = jnp.where(do, out[:, :, ::-1, :], out)
    bshift = jax.random.uniform(kb, (images.shape[0], 1, 1, 1),
                                minval=-brightness, maxval=brightness)
    cscale = 1.0 + jax.random.uniform(kk, (images.shape[0], 1, 1, 1),
                                      minval=-contrast, maxval=contrast)
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * cscale + mean + bshift
    if noise_std > 0:
        out = out + noise_std * jax.random.normal(kn, out.shape,
                                                  out.dtype)
    return out


def two_views(key: jax.Array, images: jnp.ndarray, **kwargs):
    """Two independent augmented views (the contrastive-pretrain input,
    reference ``:276-280``)."""
    k1, k2 = jax.random.split(key)
    return augment_batch(k1, images, **kwargs), \
        augment_batch(k2, images, **kwargs)
