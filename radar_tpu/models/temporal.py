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
        self.diff_proj = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="diff_proj")
        self.progression_head = nn.DenseGeneral(
            (cfg.num_observations, len(PROGRESSION_LEVELS)), axis=-1,
            dtype=self.dtype, name="progression_head")

    def __call__(self, current_pixels, prior_pixels, *,
                 deterministic: bool = True) -> dict:
        """[B, H, W, C] x2 -> progression logits [B, 14, 3] + features.

        The tower is applied twice with SHARED weights (siamese);
        current tokens cross-attend to prior tokens, so each patch of
        the current study sees the matching anatomy of the prior one
        regardless of positioning differences.
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

        # difference feature extraction: raw delta + gated product +
        # the temporally-aligned prior view
        feats = jnp.concatenate([
            cur_pooled - pri_pooled,
            cur_pooled * pri_pooled,
            cur_pooled - aligned_pooled,
        ], axis=-1)
        change = nn.gelu(self.diff_proj(feats))      # [B, hidden]
        logits = self.progression_head(change).astype(jnp.float32)
        return {
            "progression_logits": logits,            # [B, 14, 3]
            "change_features": change,
            "current_pooled": cur_pooled,
            "prior_pooled": pri_pooled,
        }


def temporal_loss_fn(expert_config: ExpertConfig,
                     class_weights=(3.0, 1.0, 3.0)):
    """Per-observation 3-class CE, with Improved/Worsened up-weighted
    (longitudinal data is overwhelmingly Stable)."""
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
        acc = jnp.mean((jnp.argmax(logits, -1) == targets)
                       .astype(jnp.float32))
        return loss, {"loss": loss, "progression_accuracy": acc}
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
