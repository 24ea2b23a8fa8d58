"""BERT-architecture text encoder (post-LN) — weight-compatible with
HuggingFace ``BertModel`` checkpoints (the reference's Bio_ClinicalBERT,
``train_expert_models.py:556``).

The default framework text tower (``models/text.py``) is pre-LN and
TPU-trained from scratch; this variant exists so production users can
import pretrained clinical-BERT weights exactly.  Interface-compatible:
returns {"last_hidden_state", "pooler_output"}.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.config import TextConfig
from .layers import MultiHeadAttention


class BertLayer(nn.Module):
    num_heads: int
    mlp_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        h = MultiHeadAttention(self.num_heads, self.dropout_rate,
                               self.dtype, name="attn")(
            x, mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="attn_ln")(x + h)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="out_ln")(x + h)


class BertTextEncoder(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, *,
                 deterministic: bool = True) -> dict:
        cfg = self.config
        s = input_ids.shape[1]
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_embed")(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.max_length, cfg.hidden_size))
        type_emb = self.param("type_embed", nn.initializers.normal(0.02),
                              (1, 1, cfg.hidden_size))
        x = tok + pos[:, :s].astype(self.dtype) \
            + type_emb.astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="embed_ln")(x)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)
        for i in range(cfg.depth):
            x = BertLayer(cfg.num_heads,
                          int(cfg.hidden_size * cfg.mlp_ratio),
                          cfg.dropout_rate, self.dtype,
                          name=f"layer_{i}")(
                x, attention_mask, deterministic=deterministic)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="pooler")(x[:, 0]))
        return {"last_hidden_state": x, "pooler_output": pooled}


def bert_config_from_hf(hf_config) -> TextConfig:
    return TextConfig(
        vocab_size=hf_config.vocab_size,
        max_length=hf_config.max_position_embeddings,
        hidden_size=hf_config.hidden_size,
        depth=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        mlp_ratio=hf_config.intermediate_size / hf_config.hidden_size,
        arch="bert",
    )


def import_bert_params(hf_model) -> dict:
    """Convert a ``transformers.BertModel`` state dict to a
    ``BertTextEncoder`` param tree (forward-equivalent for
    token_type_ids == 0)."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in hf_model.state_dict().items()}
    depth = hf_model.config.num_hidden_layers

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"]}

    params = {
        "token_embed": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_embed": sd["embeddings.position_embeddings.weight"][None],
        "type_embed":
            sd["embeddings.token_type_embeddings.weight"][0][None, None],
        "embed_ln": ln("embeddings.LayerNorm"),
        "pooler": dense("pooler.dense"),
    }
    for i in range(depth):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                "q": dense(f"{p}.attention.self.query"),
                "k": dense(f"{p}.attention.self.key"),
                "v": dense(f"{p}.attention.self.value"),
                "out": dense(f"{p}.attention.output.dense"),
            },
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "fc1": dense(f"{p}.intermediate.dense"),
            "fc2": dense(f"{p}.output.dense"),
            "out_ln": ln(f"{p}.output.LayerNorm"),
        }
    return params


def import_text_tower(hf_model):
    """Returns (TextConfig, params) for ``BertTextEncoder``."""
    return bert_config_from_hf(hf_model.config), \
        import_bert_params(hf_model)
