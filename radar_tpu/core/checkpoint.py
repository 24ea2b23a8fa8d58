"""Orbax checkpointing with full train-state resume.

The reference only ever *saves* best-metric weights
(``train_expert_models.py:279-283``) — no optimizer state, no resume
(SURVEY.md §5).  Here the whole TrainState (params + optimizer state +
step) round-trips, with best-metric tracking and retention.
"""

from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp
from ..utils.io import atomic_write_json


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best_path = os.path.join(self.directory, "best.json")

    # -- full train-state ---------------------------------------------------
    def save(self, step: int, state: Any, metrics: dict | None = None
             ) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state),
                        metrics=metrics or {})
        self._mngr.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    # -- best-metric gating --------------------------------------------------
    def save_if_best(self, step: int, state: Any, metric_name: str,
                     value: float, mode: str = "max") -> bool:
        best = None
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                best = json.load(f)
        improved = (best is None
                    or (mode == "max" and value > best["value"])
                    or (mode == "min" and value < best["value"]))
        if improved:
            self.save(step, state, metrics={metric_name: float(value)})
            atomic_write_json(self._best_path,
                              {"step": step, "metric": metric_name,
                               "value": float(value)})
        return improved

    def best_info(self) -> dict | None:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)
        return None

    def close(self):
        self._mngr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot params-only save (the reference's safetensors role)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any | None = None, *,
                pin: bool = True) -> Any:
    """Params-only restore.  ``pin=True`` (default) device_puts the
    restored pytree once: Orbax yields HOST NUMPY, and jit re-uploads
    numpy arguments on every call — through the TPU relay that
    re-transfer dominated serving latency (~15 s/study at the quality
    preset).  Pass ``pin=False`` when the caller immediately re-shards
    (e.g. a trainer placing state on a mesh)."""
    import jax

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        out = ckptr.restore(os.path.abspath(path), target=template)
    else:
        out = ckptr.restore(os.path.abspath(path))
    return jax.device_put(out) if pin else out
