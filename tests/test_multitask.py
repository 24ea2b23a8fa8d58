"""Contribution 3.2 (multi-task expert) tests: auxiliary label
derivation, head shapes, uncertainty-weighted loss training signal,
and trainer/eval integration via the standard 14-logit contract."""

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.models.multitask import (CRITICAL_OBSERVATION_IDS,
                                        MultiTaskExpert, NUM_REGIONS,
                                        derive_auxiliary_labels,
                                        multitask_loss_fn,
                                        multitask_metrics,
                                        observation_region_matrix)


def test_derive_auxiliary_labels():
    labels = np.zeros((4, 14), np.float32)
    labels[1, 1] = 1.0                      # Cardiomegaly only -> Mild
    labels[2, [1, 9]] = 1.0                 # two findings -> Moderate
    labels[3, [8, 2, 5, 7]] = 1.0           # pneumothorax -> Critical
    labels[0, 13] = 1.0                     # No Finding -> Normal
    aux = jax.device_get(derive_auxiliary_labels(jnp.asarray(labels)))
    assert list(aux["severity"]) == [0, 1, 2, 3]
    assert list(aux["urgency"]) == [0, 1, 1, 2]
    # regions: study 1 is cardiac only; study 3 includes pleural+lung
    m = observation_region_matrix()
    assert aux["regions"][1, 0] == 1.0 and aux["regions"][1, 2] == 0.0
    assert aux["regions"][3, 3] == 1.0 and aux["regions"][3, 2] == 1.0
    # support devices / no finding never count as findings
    assert m[13].sum() == 0


def test_multitask_forward_shapes(cfg, batch):
    model = MultiTaskExpert(cfg.vision, cfg.text, cfg.expert)
    variables = model.init(jax.random.key(0), batch["pixel_values"],
                           batch["input_ids"], batch["attention_mask"])
    out = model.apply(variables, batch["pixel_values"],
                      batch["input_ids"], batch["attention_mask"],
                      method=model.multi_task_forward)
    b = batch["pixel_values"].shape[0]
    assert out["logits"].shape == (b, 14)
    assert out["severity_logits"].shape == (b, 4)
    assert out["urgency_logits"].shape == (b, 3)
    assert out["region_logits"].shape == (b, NUM_REGIONS)
    assert out["task_log_vars"].shape == (4,)
    # default __call__ keeps the 14-logit expert contract
    logits = model.apply(variables, batch["pixel_values"],
                         batch["input_ids"], batch["attention_mask"])
    assert logits.shape == (b, 14)
    m = multitask_metrics(jax.device_get(out), batch)
    for k in ("severity_accuracy", "urgency_accuracy", "region_accuracy"):
        assert 0.0 <= m[k] <= 1.0


def test_multitask_loss_and_grads(cfg, batch):
    model = MultiTaskExpert(cfg.vision, cfg.text, cfg.expert)
    params = model.init(jax.random.key(0), batch["pixel_values"],
                        batch["input_ids"],
                        batch["attention_mask"])["params"]
    loss_fn = multitask_loss_fn(cfg.expert)
    (loss, aux), grads = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(model, p, batch, jax.random.key(1)),
        has_aux=True))(params)
    assert np.isfinite(float(loss))
    for k in ("obs_loss", "severity_loss", "urgency_loss", "region_loss"):
        assert np.isfinite(float(aux[k]))
    # every head (and the log-vars) receives gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {str(path[0]) for path, _ in flat}
    for name in ("severity_head", "urgency_head", "region_head",
                 "task_log_vars", "classifier"):
        assert any(name in t for t in touched), name
    gv = grads["task_log_vars"]
    assert float(jnp.sum(jnp.abs(gv))) > 0.0


def test_multitask_trains(cfg, dataset, mesh_data):
    """ExpertTrainer drives the multitask variant end-to-end and the
    uncertainty-weighted loss actually learns (loss decreases)."""
    from radar_tpu.core.trainer import ExpertTrainer
    tcfg = cfg.override(**{"train.num_epochs": 2,
                           "train.schedule": "constant"})
    trainer = ExpertTrainer("multitask", tcfg, mesh_data)

    def batches():
        return dataset.batches(tcfg.train.batch_size)

    trainer.fit(batches, steps_per_epoch=4)
    losses = [h["train_loss"] for h in trainer.history if "train_loss" in h]
    assert len(losses) == 2
    assert losses[-1] < losses[0]


def test_multitask_classifier_reads_joint_features(cfg, batch):
    """Regression pin (round 2): the observation classifier must read
    the raw vision⊕text concat — NOT the shared aux trunk.  With the
    classifier behind the trunk, aux-task gradients dominate the
    bottleneck and observation F1 stays at chance ~3x longer than
    baseline (measured macro-F1 0.076 vs 0.61 after the same budget)."""
    model = MultiTaskExpert(cfg.vision, cfg.text, cfg.expert)
    params = model.init(jax.random.key(0), batch["pixel_values"],
                        batch["input_ids"],
                        batch["attention_mask"])["params"]
    joint_dim = (params["trunk"]["kernel"].shape[0])
    cls_in = params["classifier"]["fc1"]["kernel"].shape[0]
    trunk_out = params["trunk"]["kernel"].shape[1]
    assert cls_in == joint_dim, (cls_in, joint_dim)
    # guards against reverting to the trunk unless dims coincide
    if trunk_out != joint_dim:
        assert cls_in != trunk_out
