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


# ---------------------------------------------------------------------------
# SwinV2 (the reference's actual vision backbone,
# ``train_expert_models.py:555`` -> swinv2-large)
# ---------------------------------------------------------------------------


def swinv2_config_from_hf(hf_config) -> VisionConfig:
    return VisionConfig(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        hidden_size=hf_config.embed_dim,
        num_heads=hf_config.num_heads[0],
        mlp_ratio=float(hf_config.mlp_ratio),
        channels=hf_config.num_channels,
        arch="swinv2",
        depths=tuple(hf_config.depths),
        stage_heads=tuple(hf_config.num_heads),
        window_size=hf_config.window_size,
    )


def import_swinv2_params(hf_model) -> dict:
    """Convert a ``transformers.Swinv2Model`` state dict to our
    ``SwinV2Transformer`` param tree (forward-equivalent).

    Name notes: HF's ``layernorm_before``/``layernorm_after`` keep
    SwinV1 names but are *applied* post-attention / post-MLP in v2
    (res-post-norm) — they map to our ``ln1``/``ln2`` which are named
    by application order.
    """
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in hf_model.state_dict().items()}
    cfg = hf_model.config

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def dense_nobias(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"]}

    params = {
        "patch_embed": {
            "kernel": sd["embeddings.patch_embeddings.projection.weight"
                         ].transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "embed_norm": ln("embeddings.norm"),
        "ln_final": ln("layernorm"),
    }
    for i, depth in enumerate(cfg.depths):
        stage: dict = {}
        for j in range(depth):
            p = f"encoder.layers.{i}.blocks.{j}"
            a = f"{p}.attention"
            stage[f"block_{j}"] = {
                "attn": {
                    "q": dense(f"{a}.self.query"),
                    "k": dense_nobias(f"{a}.self.key"),
                    "v": dense(f"{a}.self.value"),
                    "out": dense(f"{a}.output.dense"),
                    "logit_scale": sd[f"{a}.self.logit_scale"],
                    "cpb_fc1": dense(
                        f"{a}.self.continuous_position_bias_mlp.0"),
                    "cpb_fc2": dense_nobias(
                        f"{a}.self.continuous_position_bias_mlp.2"),
                },
                "ln1": ln(f"{p}.layernorm_before"),
                "ln2": ln(f"{p}.layernorm_after"),
                "mlp_fc1": dense(f"{p}.intermediate.dense"),
                "mlp_fc2": dense(f"{p}.output.dense"),
            }
        if i < len(cfg.depths) - 1:
            d = f"encoder.layers.{i}.downsample"
            stage["downsample"] = {
                "reduction": dense_nobias(f"{d}.reduction"),
                "norm": ln(f"{d}.norm"),
            }
        params[f"stage_{i}"] = stage
    return params


def import_swinv2_tower(hf_model):
    """Returns (VisionConfig, params) ready for
    ``SwinV2Transformer(config).apply({'params': params}, images)``."""
    return (swinv2_config_from_hf(hf_model.config),
            import_swinv2_params(hf_model))


# ---------------------------------------------------------------------------
# Retrieval-embedder warm start (the reference's BiomedCLIP role,
# ``modeling_dense_passage_retrieval.py:210-212``: ViT vision +
# PubMedBERT text towers behind fresh projection heads)
# ---------------------------------------------------------------------------


def warm_start_embedder_params(embedder_params: dict,
                               vision_params: dict | None = None,
                               text_params: dict | None = None) -> dict:
    """Graft imported tower params into a ``CrossModalEmbedder`` param
    tree, keeping the (task-specific) projection heads freshly
    initialised — the BiomedCLIP-style warm start for retrieval.

    ``vision_params``: from ``import_vit_params``/``import_swinv2_params``
    (match ``vision_config.arch``); ``text_params``: from
    ``models.bert.import_text_params`` (requires
    ``text_config.arch == "bert"``).
    """
    out = dict(embedder_params)
    if vision_params is not None:
        out["vision"] = vision_params
    if text_params is not None:
        out["text"] = text_params
    return out


# ---------------------------------------------------------------------------
# Expert warm start from an ``import_weights`` output directory: adopt
# the imported tower configs and graft the imported params into a fresh
# expert param tree (the reference initialises its experts directly
# from HF pretrained backbones, ``train_expert_models.py:555-569``).
# ---------------------------------------------------------------------------


def adopt_tower_configs(cfg, import_dir: str):
    """Return ``cfg`` with the ``vision``/``text`` sections replaced by
    the ``*_config.yaml`` files an ``import_weights`` run wrote, so the
    model is built at exactly the imported towers' geometry."""
    import os

    from ..core.config import TextConfig
    data = cfg.to_dict()
    vp = os.path.join(import_dir, "vision_config.yaml")
    tp = os.path.join(import_dir, "text_config.yaml")
    if os.path.exists(vp):
        data["vision"] = VisionConfig.from_yaml(vp).to_dict()
    if os.path.exists(tp):
        data["text"] = TextConfig.from_yaml(tp).to_dict()
    return type(cfg).from_dict(data)


def graft_tower_params(params: dict, import_dir: str) -> dict:
    """Replace ``params['towers']['vision'|'text']`` with the imported
    trees from an ``import_weights`` output directory; heads stay
    freshly initialised.  Raises on tree-structure mismatch (build the
    model with ``adopt_tower_configs`` first)."""
    import os

    import jax

    from ..core.checkpoint import load_params
    out = dict(params)
    towers = dict(out["towers"])
    for name in ("vision", "text"):
        d = os.path.join(import_dir, name)
        if not os.path.isdir(d):
            continue
        loaded = load_params(d)
        want = jax.tree_util.tree_structure(towers[name])
        got = jax.tree_util.tree_structure(loaded)
        if want != got:
            raise ValueError(
                f"imported {name} tower does not match the model "
                f"geometry (did you build the config with "
                f"adopt_tower_configs?): {got} vs {want}")
        towers[name] = loaded
    out["towers"] = towers
    return out
