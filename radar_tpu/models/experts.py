"""The four expert-model variants for 14-observation CheXpert
multi-label classification.

Reference parity (SURVEY.md §2.1) with TPU-idiomatic replacements:

- ``BaselineExpert`` — vision pooler ⊕ text pooler → GELU MLP → 14
  logits.  (The reference *ships broken* here: its baseline module is
  missing, SURVEY.md §0.2.1; shape recovered from
  ``demo_expert_models.py:89-106``.)
- ``UncertaintyExpert`` — MC-dropout head with learnable temperature
  (init 1.5) and per-observation thresholds
  (``modeling_expert_model_uncertainty.py:9-189``).  The reference runs
  K=10 *full* forwards per batch (``evaluate_expert_models.py:88-93``);
  here the deterministic backbones encode **once** and only the
  stochastic head is vmapped over K dropout keys — same distribution,
  ~K× less compute.
- ``GNNExpert`` — graph attention over the fixed 14-node clinical
  knowledge graph (``modeling_expert_model_gnn.py``).  The reference
  loops over heads in Python and materialises O(N²) pair concats
  (``:46``, ``:69-82``); here all heads and pairs collapse into batched
  einsums with an adjacency-masked softmax — one fused XLA program.
- ``ContrastiveExpert`` — CLIP-style dual projection heads with a
  learnable ``logit_scale`` (init ln(1/0.07)), plus a classification
  head for the finetune phase
  (``modeling_expert_model_contrastive.py:9-131``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants
from ..core.config import ExpertConfig, TextConfig, VisionConfig
from .text import TextEncoder
from .vision import VisionTransformer, build_vision_tower


class _Towers(nn.Module):
    """Shared vision+text trunk. Returns pooled features [B, Ev], [B, Et]."""
    vision_config: VisionConfig
    text_config: TextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.vision = build_vision_tower(self.vision_config, self.dtype,
                                         self.remat, name="vision")
        if self.text_config.arch == "bert":
            from .bert import BertTextEncoder
            self.text = BertTextEncoder(self.text_config, self.dtype,
                                        name="text")
        else:
            self.text = TextEncoder(self.text_config, self.dtype,
                                    self.remat, name="text")

    def __call__(self, pixel_values, input_ids, attention_mask, *,
                 deterministic: bool = True):
        v = self.vision(pixel_values, deterministic=deterministic)
        t = self.text(input_ids, attention_mask,
                      deterministic=deterministic)
        return v["pooler_output"], t["pooler_output"]


class ClassifierHead(nn.Module):
    """2-layer GELU MLP with dropout → num_observations logits."""
    hidden_size: int
    num_observations: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(features)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.num_observations, dtype=self.dtype,
                     name="fc2")(x)
        return x.astype(jnp.float32)


class BaselineExpert(nn.Module):
    vision_config: VisionConfig
    text_config: TextConfig
    expert_config: ExpertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.towers = _Towers(self.vision_config, self.text_config,
                              self.dtype, self.remat, name="towers")
        self.classifier = ClassifierHead(
            self.expert_config.hidden_size,
            self.expert_config.num_observations,
            self.expert_config.dropout_rate, self.dtype, name="classifier")

    def encode(self, pixel_values, input_ids, attention_mask, *,
               deterministic: bool = True):
        v, t = self.towers(pixel_values, input_ids, attention_mask,
                           deterministic=deterministic)
        return jnp.concatenate([v, t], axis=-1)

    def __call__(self, pixel_values, input_ids, attention_mask, *,
                 deterministic: bool = True):
        feats = self.encode(pixel_values, input_ids, attention_mask,
                            deterministic=deterministic)
        return self.classifier(feats, deterministic=deterministic)


class UncertaintyExpert(nn.Module):
    """MC-dropout expert with temperature scaling.

    ``head`` is the only stochastic piece; MC sampling vmaps it over K
    dropout keys (see ``radar_tpu.models.uncertainty.mc_dropout_predict``).
    """
    vision_config: VisionConfig
    text_config: TextConfig
    expert_config: ExpertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.expert_config
        self.towers = _Towers(self.vision_config, self.text_config,
                              self.dtype, self.remat, name="towers")
        self.classifier = ClassifierHead(
            cfg.hidden_size, cfg.num_observations, cfg.dropout_rate,
            self.dtype, name="classifier")
        # Learnable temperature (init 1.5) and per-observation decision
        # thresholds (init 0.5), as in the reference
        # modeling_expert_model_uncertainty.py:37-42.
        self.temperature = self.param(
            "temperature",
            lambda *_: jnp.asarray(cfg.init_temperature, jnp.float32), ())
        self.thresholds = self.param(
            "thresholds",
            lambda *_: jnp.full((cfg.num_observations,), 0.5, jnp.float32), ())

    def encode(self, pixel_values, input_ids, attention_mask, *,
               deterministic: bool = True):
        v, t = self.towers(pixel_values, input_ids, attention_mask,
                           deterministic=deterministic)
        return jnp.concatenate([v, t], axis=-1)

    def head(self, features, *, deterministic: bool = True):
        """Stochastic classifier head (dropout active when training or
        MC sampling)."""
        return self.classifier(features, deterministic=deterministic)

    def scale_logits(self, logits):
        return logits / jnp.maximum(self.temperature, 1e-3)

    def __call__(self, pixel_values, input_ids, attention_mask, *,
                 deterministic: bool = True):
        feats = self.encode(pixel_values, input_ids, attention_mask,
                            deterministic=deterministic)
        return self.head(feats, deterministic=deterministic)

    def confident_mask(self, probs, uncertainty,
                       max_uncertainty: float = 0.2):
        """Per-observation confident-positive mask
        (reference ``get_confident_observations`` :110-140)."""
        return (probs > self.thresholds) & (uncertainty < max_uncertainty)


class GraphAttentionLayer(nn.Module):
    """Dense multi-head GAT over a fixed small graph.

    Attention logits use the additive GAT form
    ``leaky_relu(a_src·Wh_i + a_dst·Wh_j)`` computed as two [B, H, N]
    projections broadcast-added into [B, H, N, N] — no pairwise concat
    materialisation (the reference builds O(N²) concats per head in a
    Python loop, ``modeling_expert_model_gnn.py:46,69-82``).
    """
    out_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, nodes, adjacency, *, deterministic: bool = True):
        """nodes: [B, N, D]; adjacency: [N, N] float (1 = edge)."""
        b, n, _ = nodes.shape
        h, d = self.num_heads, self.out_dim // self.num_heads
        assert self.out_dim % self.num_heads == 0
        wh = nn.DenseGeneral((h, d), axis=-1, dtype=self.dtype,
                             name="w")(nodes)            # [B, N, H, d]
        wh = wh.transpose(0, 2, 1, 3)                    # [B, H, N, d]
        a_src = self.param("a_src", nn.initializers.normal(0.1), (h, d))
        a_dst = self.param("a_dst", nn.initializers.normal(0.1), (h, d))
        src = jnp.einsum("bhnd,hd->bhn", wh, a_src.astype(self.dtype))
        dst = jnp.einsum("bhnd,hd->bhn", wh, a_dst.astype(self.dtype))
        logits = nn.leaky_relu(src[..., :, None] + dst[..., None, :],
                               negative_slope=0.2)       # [B, H, N, N]
        mask = adjacency[None, None].astype(bool)
        logits = jnp.where(mask, logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout_rate)(attn,
                                             deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(self.dtype), wh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.out_dim)
        return nn.elu(out)


class GNNExpert(nn.Module):
    """Hierarchical expert: GAT over the clinical knowledge graph."""
    vision_config: VisionConfig
    text_config: TextConfig
    expert_config: ExpertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.expert_config
        self.towers = _Towers(self.vision_config, self.text_config,
                              self.dtype, self.remat, name="towers")
        # Per-node projection: each observation node gets its OWN
        # learned view of the joint features — one fused matmul
        # [B, in] x [in, N*D].  (The reference broadcasts a single
        # shared projection to all 14 nodes,
        # modeling_expert_model_gnn.py:213-217, which starves the
        # per-node classifier of class-discriminative input; measured
        # ~10x faster convergence with per-node views.)
        self.node_proj = nn.DenseGeneral(
            (cfg.num_observations, cfg.gat_hidden), axis=-1,
            dtype=self.dtype, name="node_proj")
        self.feature_norm = nn.LayerNorm(dtype=self.dtype,
                                         name="feature_norm")
        self.node_embeddings = self.param(
            "node_embeddings", nn.initializers.normal(0.02),
            (cfg.num_observations, cfg.gat_hidden))
        self.gat_layers = [
            GraphAttentionLayer(cfg.gat_hidden, cfg.gat_heads,
                                cfg.gat_dropout, self.dtype,
                                name=f"gat_{i}")
            for i in range(cfg.gat_layers)
        ]
        self.node_norm = nn.LayerNorm(dtype=self.dtype, name="node_norm")
        self.node_classifier = nn.Dense(1, dtype=self.dtype,
                                        name="node_classifier")
        self.node_bias = self.param(
            "node_bias", nn.initializers.zeros, (cfg.num_observations,))
        self.adjacency = jnp.asarray(
            constants.clinical_adjacency(cfg.num_observations))

    def __call__(self, pixel_values, input_ids, attention_mask, *,
                 deterministic: bool = True):
        v, t = self.towers(pixel_values, input_ids, attention_mask,
                           deterministic=deterministic)
        joint = jnp.concatenate([v, t], axis=-1)
        nodes = self.feature_norm(self.node_proj(joint))  # [B, N, D]
        nodes = nodes + self.node_embeddings[None].astype(self.dtype)
        for layer in self.gat_layers:
            # residual keeps per-node identity through attention mixing
            nodes = nodes + layer(nodes, self.adjacency,
                                  deterministic=deterministic)
        logits = (self.node_classifier(self.node_norm(nodes))[..., 0]
                  + self.node_bias)
        return logits.astype(jnp.float32)


class ProjectionHead(nn.Module):
    """2-layer MLP projection → L2-normalised embedding."""
    hidden_size: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = x.astype(jnp.float32)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


class ContrastiveExpert(nn.Module):
    vision_config: VisionConfig
    text_config: TextConfig
    expert_config: ExpertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.expert_config
        self.towers = _Towers(self.vision_config, self.text_config,
                              self.dtype, self.remat, name="towers")
        self.image_projection = ProjectionHead(
            cfg.hidden_size, cfg.projection_dim, self.dtype,
            name="image_projection")
        self.text_projection = ProjectionHead(
            cfg.hidden_size, cfg.projection_dim, self.dtype,
            name="text_projection")
        self.logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.asarray(cfg.contrastive_init_logit_scale,
                                  jnp.float32), ())
        self.classifier = ClassifierHead(
            cfg.hidden_size, cfg.num_observations, cfg.dropout_rate,
            self.dtype, name="classifier")

    def encode_image(self, pixel_values, *, deterministic: bool = True):
        v = self.towers.vision(pixel_values, deterministic=deterministic)
        return self.image_projection(v["pooler_output"])

    def encode_text(self, input_ids, attention_mask=None, *,
                    deterministic: bool = True):
        t = self.towers.text(input_ids, attention_mask,
                             deterministic=deterministic)
        return self.text_projection(t["pooler_output"])

    def contrastive_forward(self, pixel_values, input_ids,
                            attention_mask=None, *,
                            deterministic: bool = True):
        """Returns (image_embeds, text_embeds, logit_scale)."""
        img = self.encode_image(pixel_values, deterministic=deterministic)
        txt = self.encode_text(input_ids, attention_mask,
                               deterministic=deterministic)
        scale = jnp.exp(jnp.clip(self.logit_scale, -10.0, 4.6052))
        return img, txt, scale

    def __call__(self, pixel_values, input_ids, attention_mask, *,
                 deterministic: bool = True):
        v, t = self.towers(pixel_values, input_ids, attention_mask,
                           deterministic=deterministic)
        # touch the projection heads so a plain init materialises every
        # param; XLA dead-code-eliminates them when the outputs are
        # unused by the caller
        self.image_projection(v)
        self.text_projection(t)
        feats = jnp.concatenate([v, t], axis=-1)
        return self.classifier(feats, deterministic=deterministic)


EXPERT_REGISTRY = {
    "baseline": BaselineExpert,
    "uncertainty": UncertaintyExpert,
    "gnn": GNNExpert,
    "contrastive": ContrastiveExpert,
    # contribution 3.2 (reference README.md:104-110, planned/unshipped);
    # lazy dotted path — models.multitask imports from this module
    "multitask": "radar_tpu.models.multitask:MultiTaskExpert",
}


def create_model(model_type: str, vision_config: VisionConfig,
                 text_config: TextConfig, expert_config: ExpertConfig,
                 dtype=jnp.float32, remat: bool = False):
    """Factory matching the reference's ``create_model``
    (``train_expert_models.py:175-199``)."""
    if model_type not in EXPERT_REGISTRY:
        raise ValueError(f"unknown model_type {model_type!r}; "
                         f"choose from {sorted(EXPERT_REGISTRY)}")
    cls = EXPERT_REGISTRY[model_type]
    if isinstance(cls, str):
        import importlib
        module, name = cls.rsplit(":", 1)
        cls = getattr(importlib.import_module(module), name)
    return cls(vision_config, text_config, expert_config,
               dtype=dtype, remat=remat)


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
