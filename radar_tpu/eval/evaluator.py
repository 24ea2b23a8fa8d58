"""Expert-model evaluator — capability parity with the reference's
``ModelEvaluator`` (``evaluate_expert_models.py:48-307``): per-model
macro/micro precision/recall/F1, specificity, per-class AUC-ROC and
average precision, the CheXpert-5 subset, uncertainty metrics (ECE,
uncertainty-error correlation, MC-dropout), and formatted
model-comparison tables + JSON artifacts."""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants
from ..core.logging import get_logger
from ..eval import metrics as M
from ..models.uncertainty import mc_dropout_predict
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.eval")


def compute_all_metrics(logits: np.ndarray, labels: np.ndarray,
                        thresholds=0.5) -> dict:
    """The reference's ``_compute_all_metrics`` (:144-222), for real."""
    probs = np.asarray(jax.nn.sigmoid(jnp.asarray(logits)))
    preds = (probs > thresholds).astype(np.float32)
    base = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
            for k, v in M.f1_scores(jnp.asarray(preds),
                                    jnp.asarray(labels)).items()}
    auc = M.auc_roc(probs, labels)
    ap = M.average_precision(probs, labels)
    base["auc_roc_per_class"] = [None if np.isnan(a) else float(a)
                                 for a in auc]
    base["auc_roc_macro"] = (float(np.nanmean(auc))
                             if not np.all(np.isnan(auc)) else None)
    base["average_precision_per_class"] = [
        None if np.isnan(a) else float(a) for a in ap]
    base["average_precision_macro"] = (
        float(np.nanmean(ap)) if not np.all(np.isnan(ap)) else None)
    # CheXpert-5 subset
    idx = list(constants.CHEXPERT5_INDICES)
    f5 = M.f1_scores(jnp.asarray(preds[:, idx]),
                     jnp.asarray(labels[:, idx]))
    base["chexpert5_macro_f1"] = float(f5["macro_f1"])
    base["per_class"] = {
        name: {"f1": base["per_class_f1"][i],
               "precision": base["per_class_precision"][i],
               "recall": base["per_class_recall"][i],
               "auc_roc": base["auc_roc_per_class"][i],
               "average_precision": base["average_precision_per_class"][i]}
        for i, name in enumerate(constants.OBSERVATION_NAMES)}
    return base


class ModelEvaluator:
    def __init__(self, batches_factory, mesh=None):
        """``batches_factory()`` yields eval batches (dict-of-arrays)."""
        self.batches_factory = batches_factory
        self.mesh = mesh
        self.results: dict[str, dict] = {}

    def _collect_logits(self, model, params):
        from ..core.mesh import shard_batch
        from ..core.training import make_eval_step
        step = make_eval_step(model, self.mesh)
        logits, labels = [], []
        for batch in self.batches_factory():
            b = (shard_batch(self.mesh, batch)
                 if self.mesh is not None else batch)
            logits.append(np.asarray(step(params, b)))
            labels.append(np.asarray(batch["labels"]))
        return np.concatenate(logits), np.concatenate(labels)

    def evaluate_model(self, name: str, model, params,
                       thresholds=None) -> dict:
        """``thresholds``: per-class decision thresholds (e.g. from the
        trainer's val-fitted ``calibration.json``); falls back to the
        in-params thresholds (uncertainty variant) then 0.5."""
        logits, labels = self._collect_logits(model, params)
        if thresholds is None:
            thresholds = (np.asarray(params["thresholds"])
                          if "thresholds" in params else 0.5)
        else:
            thresholds = np.asarray(thresholds)
        res = compute_all_metrics(logits, labels, thresholds)
        self.results[name] = res
        return res

    def evaluate_uncertainty_model(self, name: str, model, params,
                                   rng=None, mc_samples=None) -> dict:
        """MC-dropout metrics on top of the standard ones (the K-sample
        pass is one vmapped program per batch — see
        ``radar_tpu.models.uncertainty``)."""
        rng = rng if rng is not None else jax.random.key(0)
        probs_all, std_all, labels_all = [], [], []
        for i, batch in enumerate(self.batches_factory()):
            out = mc_dropout_predict(
                model, params, jnp.asarray(batch["pixel_values"]),
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jax.random.fold_in(rng, i), mc_samples)
            probs_all.append(np.asarray(out["mean_probs"]))
            std_all.append(np.asarray(out["std_probs"]))
            labels_all.append(np.asarray(batch["labels"]))
        probs = np.concatenate(probs_all)
        std = np.concatenate(std_all)
        labels = np.concatenate(labels_all)

        thresholds = (np.asarray(params["thresholds"])
                      if "thresholds" in params else 0.5)
        preds = (probs > thresholds).astype(np.float32)
        res = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
               for k, v in M.f1_scores(jnp.asarray(preds),
                                       jnp.asarray(labels)).items()}
        res["ece"] = float(M.expected_calibration_error(
            jnp.asarray(probs), jnp.asarray(labels)))
        res.update({k: float(v) for k, v in M.uncertainty_quality(
            jnp.asarray(std), jnp.asarray(probs),
            jnp.asarray(labels)).items()})
        res["mean_uncertainty"] = float(std.mean())
        self.results[name] = res
        return res

    # ------------------------------------------------------------------
    def compare_models(self) -> str:
        """Formatted comparison tables (reference ``:224-280``)."""
        if not self.results:
            return "(no results)"
        lines = ["", "=" * 72, "MODEL COMPARISON", "=" * 72]
        headers = ["model", "macro_f1", "micro_f1", "macro_p", "macro_r",
                   "auc", "chex5_f1"]
        lines.append("  ".join(f"{h:>12}" for h in headers))
        for name, r in self.results.items():
            row = [name,
                   f"{r.get('macro_f1', 0):.4f}",
                   f"{r.get('micro_f1', 0):.4f}",
                   f"{r.get('macro_precision', 0):.4f}",
                   f"{r.get('macro_recall', 0):.4f}",
                   f"{(r.get('auc_roc_macro') or 0):.4f}",
                   f"{r.get('chexpert5_macro_f1', 0):.4f}"]
            lines.append("  ".join(f"{c:>12}" for c in row))
        # per-class F1 table
        lines += ["", "Per-class F1:"]
        lines.append("  ".join(
            ["observation".ljust(28)]
            + [name[:10].rjust(10) for name in self.results]))
        for i, obs in enumerate(constants.OBSERVATION_NAMES):
            row = [obs.ljust(28)]
            for r in self.results.values():
                f1s = r.get("per_class_f1", [0] * 14)
                row.append(f"{f1s[i]:.4f}".rjust(10))
            lines.append("  ".join(row))
        lines.append("=" * 72)
        return "\n".join(lines)

    def save_results(self, path: str) -> str:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        payload = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                   "results": self.results}
        atomic_write_json(path, payload, indent=2, default=str)
        logger.info("saved results -> %s", path)
        return path
