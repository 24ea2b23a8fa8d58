"""Loss functions for the expert variants — all pure, jittable.

- ``bce_loss``: multi-label binary cross-entropy (reference
  ``train_expert_models.py:254``).
- ``hierarchical_loss``: BCE + clinical consistency + correlation terms
  with weights 1.0 / 0.1 / 0.05 (reference
  ``modeling_expert_model_gnn.py:290-337``).  The reference loops over
  pairs in Python; here each term is a single selector matmul.
- ``contrastive_loss``: symmetric InfoNCE with Jaccard label-similarity
  hard-negative mining (reference
  ``modeling_expert_model_contrastive.py:133-240``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..core import constants
from ..core.config import ExpertConfig

_CONS_I, _CONS_J = constants.exclusivity_matrix()
_CORR_I, _CORR_J = constants.correlation_matrix()


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits, labels.astype(jnp.float32)))


def consistency_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Penalise clinically impossible positive pairs: mean over the 9
    "No Finding vs pathology X" products of probabilities."""
    probs = jax.nn.sigmoid(logits)                       # [B, N]
    pi = probs @ jnp.asarray(_CONS_I).T                  # [B, P]
    pj = probs @ jnp.asarray(_CONS_J).T
    return jnp.sum(jnp.mean(pi * pj, axis=0))


def correlation_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Encourage correlated observations to agree (squared prob gap)."""
    probs = jax.nn.sigmoid(logits)
    pi = probs @ jnp.asarray(_CORR_I).T
    pj = probs @ jnp.asarray(_CORR_J).T
    return jnp.sum(jnp.mean((pi - pj) ** 2, axis=0))


def hierarchical_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      config: ExpertConfig) -> tuple[jnp.ndarray, dict]:
    bce = bce_loss(logits, labels)
    cons = consistency_loss(logits)
    corr = correlation_loss(logits)
    total = (config.loss_bce_weight * bce
             + config.loss_consistency_weight * cons
             + config.loss_correlation_weight * corr)
    return total, {"bce": bce, "consistency": cons, "correlation": corr}


def jaccard_similarity(labels: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Jaccard similarity of multi-hot label vectors, [B, B]."""
    labels = labels.astype(jnp.float32)
    inter = labels @ labels.T
    union = (jnp.sum(labels, -1, keepdims=True)
             + jnp.sum(labels, -1, keepdims=True).T - inter)
    return inter / jnp.maximum(union, 1e-8)


def contrastive_loss(image_embeds: jnp.ndarray, text_embeds: jnp.ndarray,
                     logit_scale: jnp.ndarray,
                     labels: jnp.ndarray | None = None,
                     config: ExpertConfig | None = None
                     ) -> tuple[jnp.ndarray, dict]:
    """Symmetric cross-entropy over the similarity matrix, plus a
    hard-negative hinge on off-diagonal pairs whose label Jaccard
    similarity lies in (low, high) — confusable but distinct cases
    (reference ``modeling_expert_model_contrastive.py:160-216``)."""
    config = config or ExpertConfig()
    sim = logit_scale * (image_embeds @ text_embeds.T)   # [B, B]
    b = sim.shape[0]
    targets = jnp.arange(b)
    loss_i2t = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        sim, targets))
    loss_t2i = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        sim.T, targets))
    base = 0.5 * (loss_i2t + loss_t2i)

    hard_neg = jnp.asarray(0.0)
    if labels is not None:
        jac = jaccard_similarity(labels)
        off_diag = 1.0 - jnp.eye(b)
        hard_mask = ((jac > config.hard_negative_low)
                     & (jac < config.hard_negative_high)) * off_diag
        # hinge: push hard-negative similarities below the margin
        cos = image_embeds @ text_embeds.T
        hinge = jnp.maximum(cos - config.hard_negative_margin, 0.0)
        hard_neg = jnp.sum(hinge * hard_mask) / jnp.maximum(
            jnp.sum(hard_mask), 1.0)
    total = base + hard_neg
    return total, {"contrastive": base, "hard_negative": hard_neg}
