"""Dataset-free architecture demo — the reference's
``demo_expert_models.py`` role: verify that all four expert variants
forward *and* backward correctly on synthetic tensors with tiny
backbones, print parameter counts and a memory estimate, and finish
with a pass/fail summary table.  No downloads, no dataset, CPU-safe.

Usage:
    python -m radar_tpu.cli.demo_expert_models
"""

from __future__ import annotations

import argparse
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import tiny_config
from ..core.logging import get_logger
from ..data.synthetic import SyntheticCXRDataset
from ..models import losses as L
from ..models.experts import EXPERT_REGISTRY, count_params, create_model
from ..models.uncertainty import mc_dropout_predict

logger = get_logger("radar_tpu.demo")


def _demo_batch(cfg, batch_size=4):
    ds = SyntheticCXRDataset(batch_size, cfg.vision.image_size,
                             cfg.text.max_length, seed=0)
    return next(ds.batches(batch_size))


def test_variant(kind: str, cfg, batch) -> dict:
    model = create_model(kind, cfg.vision, cfg.text, cfg.expert)
    rng = jax.random.key(0)
    params = model.init(rng, batch["pixel_values"], batch["input_ids"],
                        batch["attention_mask"])["params"]
    # jit everything: eager per-op dispatch dominates wall time on a
    # single-core host, and jitted compiles hit the persistent cache.
    logits = jax.jit(model.apply)(
        {"params": params}, batch["pixel_values"],
        batch["input_ids"], batch["attention_mask"])
    assert logits.shape == (batch["labels"].shape[0], 14)

    # backward: variant-appropriate loss
    def loss_fn(p):
        lg = model.apply({"params": p}, batch["pixel_values"],
                         batch["input_ids"], batch["attention_mask"],
                         deterministic=False,
                         rngs={"dropout": jax.random.key(1)})
        if kind == "gnn":
            loss, _ = L.hierarchical_loss(lg, batch["labels"], cfg.expert)
        elif kind == "multitask":
            from ..models.multitask import multitask_loss_fn
            loss, _ = multitask_loss_fn(cfg.expert)(
                model, p, batch, jax.random.key(1))
        else:
            loss = L.bce_loss(lg, batch["labels"])
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(float(loss)) and np.isfinite(gnorm) and gnorm > 0

    extras = {}
    if kind == "uncertainty":
        mc = mc_dropout_predict(model, params, batch["pixel_values"],
                                batch["input_ids"],
                                batch["attention_mask"],
                                jax.random.key(2), num_samples=5)
        extras["mc_std_mean"] = float(mc["std_probs"].mean())
    if kind == "contrastive":
        img, txt, scale = jax.jit(
            lambda p: model.apply(
                {"params": p}, batch["pixel_values"],
                batch["input_ids"], batch["attention_mask"],
                method=model.contrastive_forward))(params)
        closs, _ = L.contrastive_loss(img, txt, scale, batch["labels"],
                                      cfg.expert)
        extras["contrastive_loss"] = float(closs)

    n_params = count_params(params)
    return {"loss": float(loss), "grad_norm": gnorm,
            "params": n_params,
            "memory_mb": round(n_params * 4 * 3 / 2 ** 20, 1),
            **extras}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Dataset-free expert-model architecture demo")
    parser.add_argument("--batch_size", type=int, default=4)
    args = parser.parse_args(argv)

    cfg = tiny_config()
    batch = _demo_batch(cfg, args.batch_size)
    results, failures = {}, {}
    for kind in sorted(EXPERT_REGISTRY):
        try:
            results[kind] = test_variant(kind, cfg, batch)
            logger.info("%s OK: %s", kind, results[kind])
        except Exception as e:  # pragma: no cover
            failures[kind] = f"{type(e).__name__}: {e}"
            traceback.print_exc()

    print("\n" + "=" * 64)
    print(f"{'model':>14} {'status':>8} {'params':>12} "
          f"{'mem(MB)':>9} {'loss':>9} {'grad':>9}")
    print("-" * 64)
    for kind in sorted(EXPERT_REGISTRY):
        if kind in results:
            r = results[kind]
            print(f"{kind:>14} {'PASS':>8} {r['params']:>12,} "
                  f"{r['memory_mb']:>9} {r['loss']:>9.4f} "
                  f"{r['grad_norm']:>9.3f}")
        else:
            print(f"{kind:>14} {'FAIL':>8}  {failures[kind]}")
    print("=" * 64)
    ok = not failures
    print(f"{'ALL ARCHITECTURES VERIFIED' if ok else 'FAILURES PRESENT'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
