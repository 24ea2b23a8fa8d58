"""Vision transformer encoder — the reference's SwinV2-large role
(``train_expert_models.py:555``, ``modeling_expert_model_gnn.py:129``),
rebuilt as a plain ViT: patchify via a single strided conv (one big MXU
matmul), learnable position embeddings, pre-LN transformer, CLS or
masked-mean pooling.  All shapes static; bf16-friendly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import VisionConfig
from .layers import TransformerEncoder, pool_tokens


class VisionTransformer(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, *,
                 deterministic: bool = True) -> dict:
        """pixel_values: [B, H, W, C] in [0, 1]-ish normalized range.

        Returns {"last_hidden_state": [B, S, E], "pooler_output": [B, E]}.
        """
        cfg = self.config
        b = pixel_values.shape[0]
        x = pixel_values.astype(self.dtype)
        x = nn.Conv(cfg.hidden_size,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, -1, cfg.hidden_size)  # [B, N, E]
        n = x.shape[1]

        if cfg.pool == "cls":
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.hidden_size))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype),
                                  (b, 1, cfg.hidden_size)), x], axis=1)
            n += 1

        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, n, cfg.hidden_size))
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        # MXU-friendly sequence padding: extend S to seq_pad_to with
        # zero tokens masked out of every attention softmax — exact
        # outputs, better lane tiling (e.g. 197 -> 256 for ViT-B/16)
        mask = None
        if cfg.seq_pad_to > n:
            pad = cfg.seq_pad_to - n
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.zeros((b, cfg.seq_pad_to), jnp.int32
                             ).at[:, :n].set(1)

        hidden = TransformerEncoder(
            depth=cfg.depth, num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio, dropout_rate=cfg.dropout_rate,
            dtype=self.dtype, remat=self.remat,
            quant=cfg.quant, fused_qkv=cfg.fused_qkv, name="encoder")(
            x, mask, deterministic=deterministic)
        if cfg.seq_pad_to > n:
            hidden = hidden[:, :n]

        pooled = pool_tokens(hidden, cfg.pool)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="pooler")(pooled))
        return {"last_hidden_state": hidden, "pooler_output": pooled}


def build_vision_tower(config: VisionConfig, dtype=jnp.float32,
                       remat: bool = False, name: str = "vision"):
    """Vision-tower factory: plain ViT (default) or hierarchical SwinV2
    (``config.arch == "swinv2"``, the reference's real backbone).  Both
    return the same {last_hidden_state, pooler_output} contract."""
    if config.arch == "swinv2":
        from .swin import SwinV2Transformer
        return SwinV2Transformer(config, dtype, remat, name=name)
    return VisionTransformer(config, dtype, remat, name=name)
