"""HuggingFace weight import.

The reference downloads SwinV2 / Bio_ClinicalBERT / BiomedCLIP from the
hub at runtime (``train_expert_models.py:555-561``,
``modeling_dense_passage_retrieval.py:210``).  This framework's
backbones are self-contained (tests never download), but production
users can warm-start from pretrained HF checkpoints with these
converters.  Currently supported: ``ViTModel``-family vision encoders
(the pre-LN ViT architecture our ``VisionTransformer`` implements
1:1 — patch conv, CLS token, learned position embeddings, tanh pooler).

Converters are pure state-dict mappers: no network access here; pass a
locally instantiated/loaded HF model.
"""

from __future__ import annotations

import numpy as np

from ..core.config import VisionConfig


def vit_config_from_hf(hf_config) -> VisionConfig:
    return VisionConfig(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        hidden_size=hf_config.hidden_size,
        depth=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        mlp_ratio=hf_config.intermediate_size / hf_config.hidden_size,
        pool="cls",
        channels=hf_config.num_channels,
    )


def import_vit_params(hf_model) -> dict:
    """Convert a ``transformers.ViTModel`` state dict to our
    ``VisionTransformer`` param tree (forward-equivalent)."""
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
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed": {
            # torch conv weight [E, C, kh, kw] -> flax [kh, kw, C, E]
            "kernel": sd["embeddings.patch_embeddings.projection.weight"
                         ].transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "encoder": {"ln_final": ln("layernorm")},
        "pooler": dense("pooler.dense"),
    }
    for i in range(depth):
        p = f"encoder.layer.{i}"
        params["encoder"][f"block_{i}"] = {
            "ln1": ln(f"{p}.layernorm_before"),
            "ln2": ln(f"{p}.layernorm_after"),
            "attn": {
                "q": dense(f"{p}.attention.attention.query"),
                "k": dense(f"{p}.attention.attention.key"),
                "v": dense(f"{p}.attention.attention.value"),
                "out": dense(f"{p}.attention.output.dense"),
            },
            "mlp": {
                "fc1": dense(f"{p}.intermediate.dense"),
                "fc2": dense(f"{p}.output.dense"),
            },
        }
    return params


def import_vision_tower(hf_model):
    """Returns (VisionConfig, params) ready for
    ``VisionTransformer(config).apply({'params': params}, images)``."""
    return vit_config_from_hf(hf_model.config), import_vit_params(hf_model)
