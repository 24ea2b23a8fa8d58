"""Training machinery: optimizer factory, TrainState, sharded jitted
train/eval steps for every expert variant.

TPU-first replacements for the reference's per-variant Python loops
(``train_expert_models.py:231-428``): each step is one compiled XLA
program; the batch is sharded over the mesh's ``data`` axis and the
gradient all-reduce rides ICI — emitted automatically by ``jax.jit``
from the sharding annotations (no hand-written collectives).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import losses as L
from .config import ExpertConfig, TrainConfig
from .mesh import DATA_AXIS


class TrainState(train_state.TrainState):
    """Flax TrainState; loss-fn extras travel via step functions."""


def make_optimizer(config: TrainConfig, steps_per_epoch: int = 100,
                   learning_rate: float | None = None
                   ) -> optax.GradientTransformation:
    lr = learning_rate if learning_rate is not None else config.learning_rate
    total = max(1, steps_per_epoch * config.num_epochs)
    if config.schedule == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=min(config.warmup_steps, max(total // 10, 1)),
            decay_steps=total)
    else:
        schedule = optax.constant_schedule(lr)
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip_norm),
        optax.adamw(schedule, weight_decay=config.weight_decay),
    )


def compute_dtype(config: TrainConfig):
    return jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32


def create_train_state(model, rng: jax.Array, sample_batch: dict,
                       config: TrainConfig, steps_per_epoch: int = 100,
                       learning_rate: float | None = None) -> TrainState:
    params = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_batch["pixel_values"], sample_batch["input_ids"],
        sample_batch["attention_mask"], deterministic=False)["params"]
    tx = make_optimizer(config, steps_per_epoch, learning_rate)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


# --------------------------------------------------------------------------
# Loss functions per expert variant
# --------------------------------------------------------------------------


def baseline_loss_fn(model, params, batch, rng):
    logits = model.apply({"params": params}, batch["pixel_values"],
                         batch["input_ids"], batch["attention_mask"],
                         deterministic=False, rngs={"dropout": rng})
    loss = L.bce_loss(logits, batch["labels"])
    return loss, {"loss": loss, "logits": logits}


def gnn_loss_fn(expert_config: ExpertConfig):
    def fn(model, params, batch, rng):
        logits = model.apply({"params": params}, batch["pixel_values"],
                             batch["input_ids"], batch["attention_mask"],
                             deterministic=False, rngs={"dropout": rng})
        loss, parts = L.hierarchical_loss(logits, batch["labels"],
                                          expert_config)
        return loss, {"loss": loss, "logits": logits, **parts}
    return fn


def contrastive_pretrain_loss_fn(expert_config: ExpertConfig,
                                 augment: bool = True):
    """Contrastive pretrain objective; with ``augment``, the image side
    is a random augmented view per step (the reference's
    ``MultiViewAugmentation`` role, on-device — see data/augment.py).

    The text side is the REPORT (``report_ids``) when the batch carries
    it, falling back to the clinical context: the report always
    describes the ground-truth findings, while the context is generic
    in (1 - leak_fraction) of leak-robust training samples — pairing
    the image with the report is what forces the image pathway
    (round-2 leak-free failure: context-paired contrastive pretraining
    had nothing label-bearing to align to, macro-F1 0.45 leak-free).
    """
    def fn(model, params, batch, rng):
        pixels = batch["pixel_values"]
        if augment:
            from ..data.augment import augment_batch
            pixels = augment_batch(jax.random.fold_in(rng, 17), pixels)
        text_ids = batch.get("report_ids", batch["input_ids"])
        text_mask = batch.get("report_mask", batch["attention_mask"])
        img, txt, scale = model.apply(
            {"params": params}, pixels, text_ids,
            text_mask, deterministic=False,
            rngs={"dropout": rng}, method=model.contrastive_forward)
        loss, parts = L.contrastive_loss(img, txt, scale, batch["labels"],
                                         expert_config)
        return loss, {"loss": loss, **parts}
    return fn


# --------------------------------------------------------------------------
# Sharded steps
# --------------------------------------------------------------------------


def make_train_step(model, loss_fn: Callable, mesh: Mesh | None = None,
                    guard: bool = False, state_shardings=None):
    """Build a jitted, donated train step.

    ``loss_fn(model, params, batch, rng) -> (loss, aux)``.
    With a mesh, params/opt state are replicated (or sharded per
    ``state_shardings`` — a NamedSharding pytree matching the
    TrainState, for tensor parallelism over the ``model`` axis) and
    the batch is sharded over ``data``.

    ``guard=True`` adds on-device failure detection: if the loss or
    gradient norm is non-finite, the update is dropped (state passes
    through unchanged) and ``metrics["skipped_nonfinite"]`` is set —
    no host sync, one ``where`` per leaf.  (The reference has no
    failure handling beyond try/except logging — SURVEY.md §5.)
    """
    def step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, rng), has_aux=True)
        (loss, aux), grads = grad_fn(state.params)
        grad_norm = optax.global_norm(grads)
        if guard:
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            safe_grads = jax.tree.map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            candidate = state.apply_gradients(grads=safe_grads)
            new_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                candidate, state)
            new_state = new_state.replace(step=state.step + 1)
        else:
            new_state = state.apply_gradients(grads=grads)
        metrics = {k: v for k, v in aux.items() if jnp.ndim(v) == 0}
        metrics["grad_norm"] = grad_norm
        if guard:
            metrics["skipped_nonfinite"] = (~ok).astype(jnp.float32)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data_spec = NamedSharding(mesh, P(DATA_AXIS))
    state_spec = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step, donate_argnums=(0,),
        in_shardings=(state_spec, data_spec, repl),
        out_shardings=(state_spec, repl),
    )


def make_eval_step(model, mesh: Mesh | None = None,
                   param_shardings=None):
    def step(params, batch):
        logits = model.apply({"params": params}, batch["pixel_values"],
                             batch["input_ids"], batch["attention_mask"],
                             deterministic=True)
        return logits

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data_spec = NamedSharding(mesh, P(DATA_AXIS))
    param_spec = param_shardings if param_shardings is not None else repl
    return jax.jit(step, in_shardings=(param_spec, data_spec),
                   out_shardings=data_spec)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)
