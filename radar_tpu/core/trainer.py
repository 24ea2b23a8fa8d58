"""High-level expert-model training loops.

The semantics of the reference's per-variant loops
(``train_expert_models.py:231-428``): AdamW + cosine schedule, BCE (or
hierarchical / two-phase contrastive) objective, per-epoch validation,
best-macro-F1 checkpointing — rebuilt over jitted sharded steps, with
post-hoc temperature calibration and threshold fitting for the
uncertainty variant (which the reference leaves to inference time).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.metrics import f1_scores
from ..models.experts import create_model
from ..models.uncertainty import calibrate_temperature, fit_thresholds
from ..utils.contention import maybe_yield
from .checkpoint import CheckpointManager
from .config import RadarConfig
from .logging import MetricWriter, get_logger
from .mesh import shard_batch
from .training import (baseline_loss_fn, compute_dtype, create_train_state,
                       contrastive_pretrain_loss_fn, gnn_loss_fn,
                       make_eval_step, make_train_step, make_optimizer,
                       replicate_state, TrainState)
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.trainer")


def loss_fn_for(model_type: str, config: RadarConfig) -> Callable:
    if model_type == "gnn":
        return gnn_loss_fn(config.expert)
    if model_type == "multitask":
        from ..models.multitask import multitask_loss_fn
        return multitask_loss_fn(config.expert)
    return baseline_loss_fn  # baseline / uncertainty / contrastive-finetune


def evaluate_classifier(eval_step, params, dataset_batches,
                        mesh=None, thresholds: np.ndarray | None = None
                        ) -> dict:
    """Collect logits over a split and compute classification metrics."""
    all_logits, all_labels = [], []
    for batch in dataset_batches:
        b = shard_batch(mesh, batch) if mesh is not None else batch
        logits = eval_step(params, b)
        all_logits.append(np.asarray(logits))
        all_labels.append(np.asarray(batch["labels"]))
    if not all_logits:
        return {"macro_f1": 0.0, "micro_f1": 0.0, "num_samples": 0,
                "_logits": np.zeros((0, 14)), "_labels": np.zeros((0, 14))}
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    probs = jax.nn.sigmoid(jnp.asarray(logits))
    th = jnp.asarray(thresholds) if thresholds is not None else 0.5
    preds = (probs > th).astype(jnp.float32)
    metrics = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v))
               for k, v in f1_scores(preds, jnp.asarray(labels)).items()}
    metrics["num_samples"] = int(labels.shape[0])
    metrics["_logits"] = logits
    metrics["_labels"] = labels
    return metrics


class ExpertTrainer:
    def __init__(self, model_type: str, config: RadarConfig,
                 mesh=None, checkpoint_dir: str | None = None):
        self.model_type = model_type
        self.config = config
        self.mesh = mesh
        dtype = compute_dtype(config.train)
        self.model = create_model(model_type, config.vision, config.text,
                                  config.expert, dtype=dtype,
                                  remat=config.train.remat)
        self.ckpt = (CheckpointManager(checkpoint_dir,
                                       config.train.keep_checkpoints)
                     if checkpoint_dir else None)
        # full-train-state checkpoints for resume (params+optimizer+step)
        self.resume_ckpt = (CheckpointManager(
            checkpoint_dir + "/resume", 2) if checkpoint_dir else None)
        self.history: list[dict] = []
        self.calibration: dict | None = None

    # ------------------------------------------------------------------
    def _place_state(self, state):
        """Device-put the train state per the mesh: replicated for pure
        DP, or sharded with the Megatron TP rules when the mesh has a
        ``model`` axis > 1 (so DPxTP is a config knob, not demo-only).
        Returns (state, state_shardings|None)."""
        if self.mesh is None:
            return state, None
        from ..core.mesh import MODEL_AXIS
        if self.mesh.shape.get(MODEL_AXIS, 1) > 1:
            from ..parallel.sharding import state_shardings
            shardings = state_shardings(
                jax.eval_shape(lambda s: s, jax.device_get(state)),
                self.mesh)
            return jax.device_put(state, shardings), shardings
        return replicate_state(state, self.mesh), None

    # ------------------------------------------------------------------
    def fit(self, train_batches: Callable[[], Iterable[dict]],
            val_batches: Callable[[], Iterable[dict]] | None = None,
            steps_per_epoch: int = 100,
            metric_writer: MetricWriter | None = None,
            resume: bool = False,
            param_graft: Callable[[dict], dict] | None = None
            ) -> TrainState:
        """Train; with ``resume=True``, restore the latest full train
        state (params + optimizer + step + epoch) and continue — the
        capability the reference lacks (save-only, SURVEY.md §5).

        ``param_graft`` maps the freshly initialised params to a
        warm-started tree (e.g. imported HF backbones via
        ``utils.hf_import.graft_tower_params``); skipped on resume.
        """
        cfg = self.config.train
        rng = jax.random.key(cfg.seed)
        sample = next(iter(train_batches()))

        state = create_train_state(self.model, rng, sample, cfg,
                                   steps_per_epoch)
        if param_graft is not None and not (
                resume and self.resume_ckpt
                and self.resume_ckpt.latest_step() is not None):
            state = state.replace(
                params=param_graft(jax.device_get(state.params)))
        start_epoch = 0
        if resume and self.resume_ckpt and \
                self.resume_ckpt.latest_step() is not None:
            payload = self.resume_ckpt.restore(
                {"state": jax.device_get(state), "epoch": 0})
            state = payload["state"]
            start_epoch = int(payload["epoch"]) + 1
            logger.info("resumed from step %s at epoch %d",
                        int(state.step), start_epoch)
        state, shardings = self._place_state(state)

        # optional contrastive pretrain phase
        if (self.model_type == "contrastive" and cfg.pretrain_epochs > 0
                and start_epoch == 0):
            state = self._pretrain_contrastive(state, train_batches, rng,
                                               steps_per_epoch, shardings)

        loss_fn = loss_fn_for(self.model_type, self.config)
        train_step = make_train_step(self.model, loss_fn, self.mesh,
                                     guard=cfg.nan_guard,
                                     state_shardings=shardings)
        eval_step = make_eval_step(
            self.model, self.mesh,
            param_shardings=shardings.params if shardings else None)
        best_f1 = -1.0

        from ..data.pipeline import prefetch_to_device
        for epoch in range(start_epoch, cfg.num_epochs):
            losses = []
            skipped = 0
            epoch_batches = (prefetch_to_device(train_batches(), self.mesh)
                             if self.mesh is not None else train_batches())
            for b in epoch_batches:
                maybe_yield()  # park between steps if a bench holds the relay
                state, metrics = train_step(state, b, rng)
                if cfg.nan_guard and float(
                        metrics["skipped_nonfinite"]) > 0:
                    skipped += 1
                    logger.warning(
                        "non-finite loss/grad at step %d: update dropped",
                        int(jax.device_get(state.step)))
                    continue
                losses.append(float(metrics["loss"]))
            record = {"epoch": epoch,
                      "train_loss": float(np.mean(losses))
                      if losses else float("nan")}
            if skipped:
                record["skipped_steps"] = skipped
            if self.resume_ckpt:
                self.resume_ckpt.save(
                    int(jax.device_get(state.step)),
                    {"state": jax.device_get(state), "epoch": epoch})

            if val_batches is not None:
                val = evaluate_classifier(eval_step, state.params,
                                          val_batches(), self.mesh)
                record["val_macro_f1"] = val["macro_f1"]
                record["val_micro_f1"] = val["micro_f1"]
                if self.ckpt and val["macro_f1"] > best_f1:
                    best_f1 = val["macro_f1"]
                    self.ckpt.save_if_best(
                        int(jax.device_get(state.step)),
                        jax.device_get(state.params),
                        "macro_f1", val["macro_f1"])
            logger.info("epoch %d: %s", epoch,
                        {k: round(v, 4) for k, v in record.items()
                         if isinstance(v, float)})
            if metric_writer:
                metric_writer.write(epoch, record)
            self.history.append(record)

        # post-hoc calibration for the uncertainty variant
        if (self.model_type == "uncertainty" and val_batches is not None):
            state = self._calibrate(state, eval_step, val_batches)
        elif val_batches is not None:
            # universal per-class threshold calibration (round-3): every
            # variant gets F1-optimal decision thresholds fitted on VAL
            # (the reference reserves this for the uncertainty model;
            # a fixed 0.5 costs rare observations their recall and was
            # a big slice of the round-2 leak-free macro-F1 collapse).
            # Stored beside the checkpoint, not inside the param tree,
            # so restore templates stay unchanged.
            self._calibrate_thresholds(state, eval_step, val_batches)
        return state

    # ------------------------------------------------------------------
    def _pretrain_contrastive(self, state, train_batches, rng,
                              steps_per_epoch: int = 100,
                              shardings=None):
        cfg = self.config.train
        logger.info("contrastive pretrain: %d epochs",
                    cfg.pretrain_epochs)
        pre_loss = contrastive_pretrain_loss_fn(self.config.expert)
        pre_step = make_train_step(self.model, pre_loss, self.mesh,
                                   state_shardings=shardings)
        # fresh optimizer for the pretrain phase
        for epoch in range(cfg.pretrain_epochs):
            losses = []
            for batch in train_batches():
                maybe_yield()
                b = (shard_batch(self.mesh, batch)
                     if self.mesh is not None else batch)
                state, metrics = pre_step(state, b, rng)
                losses.append(float(metrics["loss"]))
            logger.info("pretrain epoch %d: loss %.4f", epoch,
                        float(np.mean(losses)))
            self.history.append({"pretrain_epoch": epoch,
                                 "pretrain_loss": float(np.mean(losses))})
        # reset optimizer state for finetuning, keep params
        tx = make_optimizer(cfg, steps_per_epoch)
        state = TrainState.create(apply_fn=state.apply_fn,
                                  params=state.params, tx=tx)
        state, _ = self._place_state(state)
        return state

    # ------------------------------------------------------------------
    def _calibrate_thresholds(self, state, eval_step, val_batches):
        """Fit per-class F1-optimal thresholds on val for the BEST
        checkpointed params and write ``calibration.json`` next to the
        checkpoint (consumed by the evaluator and the serving
        pipeline)."""
        params = state.params
        if self.ckpt and self.ckpt.latest_step() is not None:
            # thresholds must match the params evaluation will load
            params = self.ckpt.restore(jax.device_get(state.params))
            if self.mesh is not None:
                params = jax.device_put(
                    params, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec()))
        val = evaluate_classifier(eval_step, params, val_batches(),
                                  self.mesh)
        probs = jax.nn.sigmoid(jnp.asarray(val["_logits"]))
        th = np.asarray(fit_thresholds(probs, jnp.asarray(val["_labels"])))
        self.calibration = {"thresholds": th.tolist()}
        if self.ckpt:
            import json
            import os
            path = os.path.join(self.ckpt.directory, "calibration.json")
            atomic_write_json(path, self.calibration)
            logger.info("wrote per-class thresholds -> %s", path)
        return th

    # ------------------------------------------------------------------
    def _calibrate(self, state, eval_step, val_batches):
        """Fit temperature (LBFGS on val NLL) and per-class thresholds,
        writing them back into the params."""
        val = evaluate_classifier(eval_step, state.params, val_batches(),
                                  self.mesh)
        logits = jnp.asarray(val["_logits"])
        labels = jnp.asarray(val["_labels"])
        temp = calibrate_temperature(
            logits, labels, self.config.expert.init_temperature)
        probs = jax.nn.sigmoid(logits / temp)
        thresholds = fit_thresholds(probs, labels)
        params = jax.device_get(state.params)
        params["temperature"] = jnp.asarray(temp)
        params["thresholds"] = jnp.asarray(thresholds)
        logger.info("calibrated temperature=%.3f", float(temp))
        state = state.replace(params=params)
        if self.mesh is not None:
            # temperature/thresholds are new leaves with no TP rule;
            # re-place the whole state (they land replicated)
            state, _ = self._place_state(state)
        if self.ckpt:
            self.ckpt.save(int(jax.device_get(state.step)) + 1,
                           jax.device_get(state.params),
                           metrics={"calibrated": 1.0})
        return state
