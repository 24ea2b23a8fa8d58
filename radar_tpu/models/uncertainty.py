"""MC-dropout uncertainty estimation and temperature calibration.

TPU-idiomatic replacement for the reference's K sequential full forward
passes (``modeling_expert_model_uncertainty.py:62-108``, driven K=10
times per batch at ``evaluate_expert_models.py:88-93``): the
deterministic towers encode once, and only the dropout head is vmapped
over K PRNG keys — one compiled XLA program, ~K× fewer backbone FLOPs,
identical predictive distribution (the reference enables train-mode
dropout only on the classifier submodule, ``:85``).

Temperature calibration follows the reference's post-hoc NLL
minimisation (``:142-189``, torch LBFGS) using ``optax.lbfgs``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax


def mc_dropout_predict(model, params, pixel_values, input_ids,
                       attention_mask, rng: jax.Array,
                       num_samples: int | None = None) -> dict:
    """Predictive mean / std / entropy from K MC-dropout head samples.

    Returns dict(mean_probs, std_probs, entropy, logits_mean) — the
    same payload as the reference's ``forward_with_uncertainty``.
    Jitted (model and K are static): both the serving path and the
    evaluator call this per study/batch, and linen modules hash by
    field so the jit cache is stable across calls.
    """
    k = num_samples or model.expert_config.mc_samples
    return _mc_dropout_jit(model, params, pixel_values, input_ids,
                           attention_mask, rng, k)


@partial(jax.jit, static_argnames=("model", "num_samples"))
def _mc_dropout_jit(model, params, pixel_values, input_ids,
                    attention_mask, rng, num_samples):
    k = num_samples
    feats = model.apply({"params": params}, pixel_values, input_ids,
                        attention_mask, deterministic=True,
                        method=model.encode)
    temp = params["temperature"]

    def one_sample(key):
        logits = model.apply({"params": params}, feats,
                             deterministic=False,
                             rngs={"dropout": key}, method=model.head)
        return logits / jnp.maximum(temp, 1e-3)

    keys = jax.random.split(rng, k)
    logits_k = jax.vmap(one_sample)(keys)           # [K, B, N]
    probs_k = jax.nn.sigmoid(logits_k)
    mean_probs = jnp.mean(probs_k, axis=0)
    std_probs = jnp.std(probs_k, axis=0)
    entropy = -(mean_probs * jnp.log(mean_probs + 1e-8)
                + (1 - mean_probs) * jnp.log(1 - mean_probs + 1e-8))
    return {
        "mean_probs": mean_probs,
        "std_probs": std_probs,
        "entropy": entropy,
        "logits_mean": jnp.mean(logits_k, axis=0),
    }


@partial(jax.jit, static_argnames=("max_iters",))
def calibrate_temperature(logits: jnp.ndarray, labels: jnp.ndarray,
                          init_temperature: float | jnp.ndarray = 1.5,
                          max_iters: int = 50) -> jnp.ndarray:
    """Fit a scalar temperature minimising BCE NLL on held-out logits.

    LBFGS over log-temperature (positivity by construction).
    """
    labels = labels.astype(jnp.float32)
    log_t0 = jnp.log(jnp.asarray(init_temperature, jnp.float32))

    def nll(log_t):
        t = jnp.exp(log_t)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(
            logits / t, labels))

    opt = optax.lbfgs()
    state = opt.init(log_t0)
    value_and_grad = optax.value_and_grad_from_state(nll)

    def step(carry, _):
        log_t, state = carry
        value, grad = value_and_grad(log_t, state=state)
        updates, state = opt.update(grad, state, log_t, value=value,
                                    grad=grad, value_fn=nll)
        log_t = optax.apply_updates(log_t, updates)
        return (log_t, state), value

    (log_t, _), _ = jax.lax.scan(step, (log_t0, state), None,
                                 length=max_iters)
    return jnp.exp(log_t)


def fit_thresholds(probs: jnp.ndarray, labels: jnp.ndarray,
                   grid: int = 99) -> jnp.ndarray:
    """Per-observation decision thresholds maximising F1 on a grid.

    Vectorised over (thresholds × classes); jit-friendly static shapes.
    """
    labels = labels.astype(jnp.float32)
    ts = jnp.linspace(0.01, 0.99, grid)                  # [T]
    preds = (probs[None] > ts[:, None, None]).astype(jnp.float32)
    tp = jnp.sum(preds * labels[None], axis=1)
    fp = jnp.sum(preds * (1 - labels[None]), axis=1)
    fn = jnp.sum((1 - preds) * labels[None], axis=1)
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-8)    # [T, N]
    best = jnp.argmax(f1, axis=0)
    return ts[best]
