"""Contribution 3.1 — temporal modeling for longitudinal studies.

The reference PLANS this and ships nothing (``README.md:93-100``:
"Temporal attention module for current vs. prior images; difference
feature extraction; progression classification (Improved/Stable/
Worsened); structured comparison statement generation" — status
"PLANNED").  Real implementation, TPU-first:

- ``TemporalComparator``: a siamese vision trunk (one tower, applied
  to both studies — shared weights, so the prior pathway costs no
  extra parameters) + cross-attention of current patch tokens over
  prior patch tokens (the "temporal attention"), difference/product
  feature extraction, and a per-observation 3-class progression head.
  Everything is one XLA program over [B, 2, H, W, C]-shaped pairs.
- ``derive_progression_labels``: ground-truth progression from a
  (prior, current) label-vector pair.
- ``comparison_statements``: host-side structured comparison text from
  predicted progression classes, injected into the report-generation
  prompt by the serving pipeline (``pipeline/radar.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core import constants
from ..core.config import ExpertConfig, VisionConfig
from .layers import MultiHeadAttention
from .vision import build_vision_tower

PROGRESSION_LEVELS = ("Improved", "Stable", "Worsened")
IMPROVED, STABLE, WORSENED = 0, 1, 2


def derive_progression_labels(prior_labels, current_labels) -> jnp.ndarray:
    """[B, 14] x [B, 14] -> [B, 14] int32 progression classes.

    Per observation: positive -> negative = Improved, negative ->
    positive = Worsened, unchanged = Stable.
    """
    p = jnp.asarray(prior_labels, jnp.float32)
    c = jnp.asarray(current_labels, jnp.float32)
    return jnp.where(p > c + 0.5, IMPROVED,
                     jnp.where(c > p + 0.5, WORSENED,
                               STABLE)).astype(jnp.int32)


class TemporalComparator(nn.Module):
    """Current-vs-prior study comparison module."""
    vision_config: VisionConfig
    expert_config: ExpertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.expert_config
        self.vision = build_vision_tower(self.vision_config, self.dtype,
                                         self.remat, name="vision")
        self.temporal_attn = MultiHeadAttention(
            num_heads=self.vision_config.num_heads,
            dropout_rate=cfg.dropout_rate, dtype=self.dtype,
            name="temporal_attn")
        self.attn_norm = nn.LayerNorm(dtype=self.dtype, name="attn_norm")
        # Per-observation node projection, SHARED between the current
        # and prior pathways so per-node features are directly
        # comparable.  (Round-2 failure: a single global pooled-diff
        # vector washed out per-observation change — the blob for one
        # observation appearing/disappearing is a per-node signal; same
        # fix that made the GNN expert converge, models/experts.py.)
        self.node_proj = nn.DenseGeneral(
            (cfg.num_observations, cfg.gat_hidden), axis=-1,
            dtype=self.dtype, name="node_proj")
        self.aligned_proj = nn.DenseGeneral(
            (cfg.num_observations, cfg.gat_hidden), axis=-1,
            dtype=self.dtype, name="aligned_proj")
        self.node_norm = nn.LayerNorm(dtype=self.dtype, name="node_norm")
        self.change_mlp = nn.Dense(cfg.gat_hidden, dtype=self.dtype,
                                   name="change_mlp")
        self.progression_head = nn.Dense(
            len(PROGRESSION_LEVELS), dtype=self.dtype,
            name="progression_head")
        # auxiliary per-node presence head (one, siamese): supervising
        # presence on BOTH studies shapes the node features progression
        # is computed from
        self.presence_head = nn.Dense(1, dtype=self.dtype,
                                      name="presence_head")

    def __call__(self, current_pixels, prior_pixels, *,
                 deterministic: bool = True) -> dict:
        """[B, H, W, C] x2 -> progression logits [B, 14, 3] + features.

        The tower is applied twice with SHARED weights (siamese);
        current tokens cross-attend to prior tokens, so each patch of
        the current study sees the matching anatomy of the prior one
        regardless of positioning differences.  Per-observation node
        features from both studies feed a per-node change MLP and a
        3-class progression head.
        """
        cur = self.vision(current_pixels, deterministic=deterministic)
        pri = self.vision(prior_pixels, deterministic=deterministic)
        cur_tok = cur["last_hidden_state"]          # [B, S, E]
        pri_tok = pri["last_hidden_state"]

        aligned = self.temporal_attn(
            self.attn_norm(cur_tok), kv=pri_tok,
            deterministic=deterministic)            # prior, current-aligned
        aligned_pooled = jnp.mean(aligned, axis=1)   # [B, E]
        cur_pooled = cur["pooler_output"]
        pri_pooled = pri["pooler_output"]

        cur_nodes = self.node_norm(self.node_proj(cur_pooled))
        pri_nodes = self.node_norm(self.node_proj(pri_pooled))
        ali_nodes = self.aligned_proj(aligned_pooled)   # [B, N, D]

        feats = jnp.concatenate([
            cur_nodes, pri_nodes,
            cur_nodes - pri_nodes,
            cur_nodes * pri_nodes,
            ali_nodes,
        ], axis=-1)                                  # [B, N, 5D]
        change = nn.gelu(self.change_mlp(feats))     # [B, N, D]
        logits = self.progression_head(change).astype(jnp.float32)
        return {
            "progression_logits": logits,            # [B, 14, 3]
            "current_presence_logits": self.presence_head(
                cur_nodes)[..., 0].astype(jnp.float32),   # [B, 14]
            "prior_presence_logits": self.presence_head(
                pri_nodes)[..., 0].astype(jnp.float32),
            "change_features": jnp.mean(change, axis=1),
            "current_pooled": cur_pooled,
            "prior_pooled": pri_pooled,
        }


def temporal_loss_fn(expert_config: ExpertConfig,
                     class_weights=(6.0, 1.0, 6.0),
                     presence_weight: float = 0.5):
    """Per-observation 3-class CE with Improved/Worsened up-weighted
    (longitudinal data is overwhelmingly Stable; ~9:1 at default
    transition rates) + auxiliary per-node presence BCE on BOTH
    studies, which shapes the node features the change head reads."""
    import optax
    w = jnp.asarray(class_weights, jnp.float32)

    def fn(model, params, batch, rng):
        out = model.apply({"params": params}, batch["pixel_values"],
                          batch["prior_pixel_values"],
                          deterministic=False, rngs={"dropout": rng})
        logits = out["progression_logits"]           # [B, N, 3]
        targets = derive_progression_labels(
            batch["prior_labels"], batch["labels"])  # [B, N]
        logp = nn.log_softmax(logits, axis=-1)
        one_hot = nn.one_hot(targets, len(PROGRESSION_LEVELS))
        ce = -jnp.sum(one_hot * logp, axis=-1)       # [B, N]
        weights = w[targets]
        loss = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1e-8)
        presence = 0.5 * (
            jnp.mean(optax.sigmoid_binary_cross_entropy(
                out["current_presence_logits"],
                jnp.asarray(batch["labels"], jnp.float32)))
            + jnp.mean(optax.sigmoid_binary_cross_entropy(
                out["prior_presence_logits"],
                jnp.asarray(batch["prior_labels"], jnp.float32))))
        total = loss + presence_weight * presence
        acc = jnp.mean((jnp.argmax(logits, -1) == targets)
                       .astype(jnp.float32))
        return total, {"loss": total, "progression_ce": loss,
                       "presence_bce": presence,
                       "progression_accuracy": acc}
    return fn


def comparison_statements(progression: np.ndarray,
                          observation_names=constants.OBSERVATION_NAMES
                          ) -> str:
    """Structured comparison text from [14] progression classes.

    The serving pipeline appends this to the clinical context so the
    decoder writes a comparison-aware report.
    """
    prog = np.asarray(progression).reshape(-1)
    improved = [observation_names[i] for i in range(len(prog))
                if prog[i] == IMPROVED
                and observation_names[i] != "No Finding"]
    worsened = [observation_names[i] for i in range(len(prog))
                if prog[i] == WORSENED
                and observation_names[i] != "No Finding"]
    parts = []
    if improved:
        parts.append("Interval improvement in "
                     + ", ".join(sorted(improved)) + ".")
    if worsened:
        parts.append("Interval worsening of "
                     + ", ".join(sorted(worsened)) + ".")
    if not parts:
        parts.append("No significant interval change from the prior "
                     "study.")
    return " ".join(parts)
