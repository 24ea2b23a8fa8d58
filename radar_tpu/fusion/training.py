"""Knowledge-fusion training (contribution 2.2) — *real*, unlike the
reference's one-attention-block stand-in trained on ``torch.randn`` with
``mean(norm(output))`` (``train_retrieval_system.py:165-188,276`` —
SURVEY.md §0.2.3).

Supervised objectives with ground truth constructed from observation
labels:

- **conflict detection** (BCE): SF streams are built either consistent
  with the PF labels or with flipped observations; the conflict head
  must flag the flipped positions;
- **fusion fidelity** (MSE): fused features must reconstruct the
  label-encoding of the *union* of non-conflicting knowledge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import RadarConfig
from ..core.logging import get_logger
from ..core.training import make_optimizer
from ..utils.contention import maybe_yield
from .fusion import AttentionKnowledgeFusion

logger = get_logger("radar_tpu.fusion.train")


def synthesize_fusion_batch(labels: np.ndarray, hidden: int, seq_len: int,
                            rng: np.random.Generator,
                            conflict_rate: float = 0.5) -> dict:
    """Build (PF, SF, conflict-target, fusion-target) feature streams
    from multi-hot labels via a fixed random projection codebook."""
    b, n_obs = labels.shape
    codebook = np.random.default_rng(0).normal(
        0, 1.0, (n_obs, hidden)).astype(np.float32)  # deterministic

    def encode(lbl):  # [B, N] -> [B, S, H]: distribute signal over seq
        base = lbl @ codebook                         # [B, H]
        noise = rng.normal(0, 0.1, (b, seq_len, hidden))
        return (base[:, None, :] + noise).astype(np.float32)

    conflict_mask = (rng.random((b, seq_len)) < conflict_rate)
    sf_labels = labels.copy()
    flip = conflict_mask.any(axis=1)
    sf_labels[flip] = 1.0 - sf_labels[flip]

    pf = encode(labels)
    sf_consistent = encode(labels)
    sf_conflicting = encode(sf_labels)
    sf = np.where(conflict_mask[..., None], sf_conflicting, sf_consistent)
    target = ((labels + np.where(flip[:, None], labels, sf_labels)) / 2
              @ codebook)
    return {
        "pf": pf, "sf": sf.astype(np.float32),
        "conflict_target": conflict_mask.astype(np.float32),
        "fusion_target": np.repeat(target[:, None, :], seq_len,
                                   axis=1).astype(np.float32),
    }


def make_conflict_text_pairs(labels: np.ndarray,
                             rng: np.random.Generator,
                             conflict_rate: float = 0.5):
    """(PF text, SF text, conflicting?) triplets from label rows: SF is
    either the same study's report or the report of *flipped* labels —
    a clinically contradictory supplementary finding."""
    from ..data.synthetic import report_text
    pf_texts, sf_texts, conflicts = [], [], []
    for row in labels:
        pf_texts.append(report_text(row))
        if rng.random() < conflict_rate:
            flipped = 1.0 - row
            flipped[13] = 1.0 if flipped[:13].sum() == 0 else 0.0
            sf_texts.append(report_text(flipped))
            conflicts.append(1.0)
        else:
            sf_texts.append(report_text(row))
            conflicts.append(0.0)
    return pf_texts, sf_texts, np.asarray(conflicts, np.float32)


def train_fusion_on_texts(config: RadarConfig, labels: np.ndarray,
                          embed_hidden_fn, num_epochs: int | None = None,
                          batch_size: int = 16, seq_len: int | None = None,
                          seed: int = 0):
    """Train the fusion module on *real text features* from the
    cross-modal embedder: SF streams from clinically-flipped reports
    must be flagged by the conflict head (sequence-level target over
    real-token positions).  This is the fusion the pipeline serves.

    ``embed_hidden_fn(texts, seq_len) -> (features [B,S,H], mask)``.
    Returns (module, params, history).
    """
    fcfg = config.fusion
    seq_len = seq_len or fcfg.max_findings_len
    module = AttentionKnowledgeFusion(fcfg)
    rng_np = np.random.default_rng(seed)

    pf_texts, sf_texts, conflicts = make_conflict_text_pairs(
        labels, rng_np)
    pf_feats, pf_mask = embed_hidden_fn(pf_texts, seq_len)
    sf_feats, sf_mask = embed_hidden_fn(sf_texts, seq_len)
    # per-position target: the sequence-level conflict flag over real
    # positions of both streams
    target = (conflicts[:, None] * pf_mask * sf_mask).astype(np.float32)

    params = module.init(jax.random.key(seed),
                         jnp.asarray(pf_feats[:2]),
                         jnp.asarray(sf_feats[:2]))["params"]
    epochs = num_epochs or config.train.num_epochs
    # cosine schedule spans the actual run (real epoch count; the
    # synthesized-pair sets are one big batch-split epoch, so the
    # default steps_per_epoch=100 is close enough per epoch but the
    # config epoch count may differ from num_epochs)
    import dataclasses as _dc
    tx = make_optimizer(_dc.replace(config.train, num_epochs=epochs))
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        out = module.apply({"params": params}, batch["pf"], batch["sf"],
                           batch["pf_mask"], batch["sf_mask"])
        pos = batch["pf_mask"] * batch["sf_mask"]
        bce = (jnp.sum(optax.sigmoid_binary_cross_entropy(
            out["conflict_logits"], batch["target"]) * pos)
            / jnp.maximum(jnp.sum(pos), 1.0))
        pred_seq = (jnp.sum(out["conflict_scores"] * pos, axis=1)
                    / jnp.maximum(jnp.sum(pos, axis=1), 1.0))
        acc = jnp.mean(((pred_seq > 0.5)
                        == (batch["conflict_flag"] > 0.5)))
        return bce, {"conflict_acc": acc}

    @jax.jit
    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    n = labels.shape[0]
    history = []
    for epoch in range(epochs):
        maybe_yield()
        losses, accs = [], []
        order = rng_np.permutation(n)
        for s in range(0, n - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            batch = {"pf": jnp.asarray(pf_feats[idx]),
                     "sf": jnp.asarray(sf_feats[idx]),
                     "pf_mask": jnp.asarray(pf_mask[idx]),
                     "sf_mask": jnp.asarray(sf_mask[idx]),
                     "target": jnp.asarray(target[idx]),
                     "conflict_flag": jnp.asarray(conflicts[idx])}
            params, opt_state, loss, aux = step(params, opt_state, batch)
            losses.append(float(loss))
            accs.append(float(aux["conflict_acc"]))
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "conflict_acc": float(np.mean(accs))})
        logger.info("fusion(text) epoch %d: loss %.4f conflict_acc %.3f",
                    epoch, history[-1]["loss"],
                    history[-1]["conflict_acc"])
    return module, params, history


def train_fusion(config: RadarConfig, labels: np.ndarray,
                 num_epochs: int | None = None, batch_size: int = 16,
                 seq_len: int = 8, seed: int = 0):
    """Train the fusion module on synthesized PF/SF streams.

    Returns (module, params, history) with final conflict-detection
    accuracy in the history.
    """
    fcfg = config.fusion
    module = AttentionKnowledgeFusion(fcfg)
    rng_np = np.random.default_rng(seed)
    sample = synthesize_fusion_batch(labels[:batch_size],
                                     fcfg.hidden_size, seq_len, rng_np)
    params = module.init(jax.random.key(seed),
                         jnp.asarray(sample["pf"]),
                         jnp.asarray(sample["sf"]))["params"]
    epochs = num_epochs or config.train.num_epochs
    # cosine schedule spans the actual run (real epoch count; the
    # synthesized-pair sets are one big batch-split epoch, so the
    # default steps_per_epoch=100 is close enough per epoch but the
    # config epoch count may differ from num_epochs)
    import dataclasses as _dc
    tx = make_optimizer(_dc.replace(config.train, num_epochs=epochs))
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        out = module.apply({"params": params}, batch["pf"], batch["sf"])
        conflict_bce = jnp.mean(optax.sigmoid_binary_cross_entropy(
            out["conflict_logits"], batch["conflict_target"]))
        recon = jnp.mean((out["fused_features"]
                          - batch["fusion_target"]) ** 2)
        loss = conflict_bce + 0.1 * recon
        acc = jnp.mean(((out["conflict_scores"] > 0.5)
                        == (batch["conflict_target"] > 0.5)))
        return loss, {"conflict_bce": conflict_bce, "recon": recon,
                      "conflict_acc": acc}

    @jax.jit
    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    history = []
    n = labels.shape[0]
    for epoch in range(epochs):
        maybe_yield()
        losses, accs = [], []
        for start in range(0, n - batch_size + 1, batch_size):
            batch_np = synthesize_fusion_batch(
                labels[start:start + batch_size], fcfg.hidden_size,
                seq_len, rng_np)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            params, opt_state, loss, aux = step(params, opt_state, batch)
            losses.append(float(loss))
            accs.append(float(aux["conflict_acc"]))
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "conflict_acc": float(np.mean(accs))})
        logger.info("fusion epoch %d: loss %.4f conflict_acc %.3f",
                    epoch, history[-1]["loss"],
                    history[-1]["conflict_acc"])
    return module, params, history
