"""Clinical text encoder — the reference's Bio_ClinicalBERT role
(``train_expert_models.py:556``), rebuilt as a compact BERT-style
encoder: token + position embeddings, padding-masked self-attention,
tanh pooler over the CLS token.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import TextConfig
from .layers import TransformerEncoder, pool_tokens


class TextEncoder(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray | None = None, *,
                 deterministic: bool = True) -> dict:
        """input_ids: [B, S] int32; attention_mask: [B, S] (1 = token)."""
        cfg = self.config
        s = input_ids.shape[1]
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_embed")(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.max_length, cfg.hidden_size))
        x = tok + pos[:, :s].astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="embed_ln")(x)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        hidden = TransformerEncoder(
            depth=cfg.depth, num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio, dropout_rate=cfg.dropout_rate,
            dtype=self.dtype, remat=self.remat,
            quant=cfg.quant, fused_qkv=cfg.fused_qkv, name="encoder")(
            x, attention_mask, deterministic=deterministic)

        pooled = pool_tokens(hidden, "cls")
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="pooler")(pooled))
        return {"last_hidden_state": hidden, "pooler_output": pooled}
