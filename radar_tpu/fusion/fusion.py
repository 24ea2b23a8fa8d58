"""Attention-based PF↔SF knowledge fusion.

Capability parity with the reference's ``AttentionBasedKnowledgeFusion``
(``modeling_knowledge_fusion.py:186-255``): bidirectional cross-
attention between preliminary findings (PF, from the MLLM) and
supplementary findings (SF, retrieved), learned source gating, image
conditioning, per-position conflict detection, residual+LN+FFN — one
Flax module returning the same result-dict shape.

TPU-first differences: sequences are padded to a *static*
``max_findings_len`` with explicit masks (the reference pads PF/SF to
each batch's dynamic max, ``:217-219``, which would retrigger XLA
compilation per shape), and masked positions are excluded from pooling,
gating and attention.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import FusionConfig
from ..models.layers import Mlp, MultiHeadAttention, pool_tokens


class KnowledgeGating(nn.Module):
    """Source gating: masked mean-pool each stream → sigmoid gate →
    normalised PF/SF weights (reference ``KnowledgeGatingMechanism``
    :82-123)."""
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pf, sf, pf_mask, sf_mask):
        pf_pool = pool_tokens(pf, "mean", pf_mask)
        sf_pool = pool_tokens(sf, "mean", sf_mask)
        gate_in = jnp.concatenate([pf_pool, sf_pool], axis=-1)
        gates = nn.sigmoid(nn.Dense(2, dtype=self.dtype,
                                    name="gate")(gate_in))
        gates = gates / (jnp.sum(gates, axis=-1, keepdims=True) + 1e-8)
        return gates[:, 0:1, None], gates[:, 1:2, None]  # [B,1,1] each


class ImageConditionedFusion(nn.Module):
    """Modulate fused features by the image embedding:
    ``feature * (1 + s * tanh(proj(img)))`` then concat→linear
    (reference ``ImageConditionedFusion`` :125-158)."""
    hidden_size: int
    modulation_scale: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, image_embedding):
        img = nn.Dense(self.hidden_size, dtype=self.dtype,
                       name="img_proj")(image_embedding)
        mod = 1.0 + self.modulation_scale * nn.tanh(img)[:, None, :]
        modulated = features * mod
        fused = jnp.concatenate(
            [modulated,
             jnp.broadcast_to(img[:, None, :],
                              modulated.shape)], axis=-1)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="out")(fused)


class ConflictDetector(nn.Module):
    """Per-position PF/SF conflict scores: concat→MLP→sigmoid
    (reference ``ConflictDetector`` :160-184)."""
    hidden_size: int
    threshold: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pf, sf):
        x = jnp.concatenate([pf, sf], axis=-1)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        logits = nn.Dense(1, dtype=self.dtype, name="fc2")(x).astype(
            jnp.float32)[..., 0]
        scores = nn.sigmoid(logits)
        return logits, scores, scores > self.threshold


class AttentionKnowledgeFusion(nn.Module):
    config: FusionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pf, sf, pf_mask=None, sf_mask=None,
                 image_embedding=None, *, deterministic: bool = True
                 ) -> dict:
        """Fuse PF and SF feature sequences.

        Args:
          pf: [B, S, E] preliminary-findings features.
          sf: [B, S, E] supplementary-findings features (same padded S).
          pf_mask/sf_mask: [B, S] with 1 = real token.
          image_embedding: optional [B, E] image conditioning vector.

        Returns a dict: fused_features [B, S, E], pf_gate/sf_gate
        [B, 1, 1], conflict_scores [B, S], conflict_mask [B, S],
        pf_attended/sf_attended [B, S, E].
        """
        cfg = self.config
        b, s, e = pf.shape
        assert sf.shape == pf.shape, "PF/SF must be padded to equal length"
        pf_mask = pf_mask if pf_mask is not None else jnp.ones((b, s))
        sf_mask = sf_mask if sf_mask is not None else jnp.ones((b, s))

        pf_attended, sf_attended = pf, sf
        for i in range(cfg.num_layers):
            # bidirectional cross-attention (PF queries SF and vice versa)
            pf_new = pf_attended + MultiHeadAttention(
                cfg.num_heads, cfg.dropout_rate, self.dtype,
                name=f"pf_to_sf_{i}")(
                nn.LayerNorm(dtype=self.dtype, name=f"pf_ln_{i}")(
                    pf_attended),
                kv=sf_attended, mask=sf_mask,
                deterministic=deterministic)
            sf_new = sf_attended + MultiHeadAttention(
                cfg.num_heads, cfg.dropout_rate, self.dtype,
                name=f"sf_to_pf_{i}")(
                nn.LayerNorm(dtype=self.dtype, name=f"sf_ln_{i}")(
                    sf_attended),
                kv=pf_attended, mask=pf_mask,
                deterministic=deterministic)
            pf_attended, sf_attended = pf_new, sf_new

        pf_gate, sf_gate = KnowledgeGating(cfg.hidden_size, self.dtype,
                                           name="gating")(
            pf_attended, sf_attended, pf_mask, sf_mask)
        fused = pf_gate * pf_attended + sf_gate * sf_attended

        if image_embedding is not None:
            fused = ImageConditionedFusion(
                e, cfg.image_modulation_scale, self.dtype,
                name="image_fusion")(fused, image_embedding)

        # residual + LN + FFN
        h = nn.LayerNorm(dtype=self.dtype, name="ln_out")(fused)
        fused = fused + Mlp(int(e * 4), e, cfg.dropout_rate, self.dtype,
                            name="ffn")(h, deterministic=deterministic)
        fused = nn.LayerNorm(dtype=self.dtype, name="ln_final")(fused)

        conflict_logits, conflict_scores, conflict_mask = ConflictDetector(
            cfg.hidden_size, cfg.conflict_threshold, self.dtype,
            name="conflict")(pf_attended, sf_attended)
        # ignore conflicts at padded positions
        pad = (pf_mask * sf_mask) > 0
        conflict_scores = jnp.where(pad, conflict_scores, 0.0)
        conflict_mask = conflict_mask & pad

        return {
            "fused_features": fused,
            "pf_gate": pf_gate,
            "sf_gate": sf_gate,
            "conflict_logits": conflict_logits,
            "conflict_scores": conflict_scores,
            "conflict_mask": conflict_mask,
            "pf_attended": pf_attended,
            "sf_attended": sf_attended,
        }


def create_fusion_model(config: FusionConfig | None = None,
                        dtype=jnp.float32) -> AttentionKnowledgeFusion:
    """Factory (reference ``create_fusion_model`` :257-260)."""
    return AttentionKnowledgeFusion(config or FusionConfig(), dtype)
