"""Checkpoint subsystem tests: round-trip, best-metric gating,
full-state resume restore."""

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.core.checkpoint import (CheckpointManager, load_params,
                                       save_params)


def _tree(seed=0):
    k = jax.random.key(seed)
    return {"dense": {"kernel": jax.random.normal(k, (8, 4)),
                      "bias": jnp.zeros((4,))},
            "scale": jnp.asarray(1.5)}


def test_params_roundtrip(tmp_path):
    params = _tree()
    path = str(tmp_path / "params")
    save_params(path, params)
    restored = load_params(path, jax.device_get(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_best_metric_gating(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    t1, t2 = _tree(1), _tree(2)
    assert mngr.save_if_best(1, jax.device_get(t1), "f1", 0.5)
    assert not mngr.save_if_best(2, jax.device_get(t2), "f1", 0.4)
    assert mngr.save_if_best(3, jax.device_get(t2), "f1", 0.6)
    info = mngr.best_info()
    assert info["value"] == 0.6 and info["step"] == 3
    # latest checkpoint corresponds to the best save
    restored = mngr.restore(jax.device_get(t2))
    np.testing.assert_allclose(
        np.asarray(restored["dense"]["kernel"]),
        np.asarray(t2["dense"]["kernel"]))
    mngr.close()


def test_latest_and_retention(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for step in (1, 2, 3):
        mngr.save(step, jax.device_get(_tree(step)))
    assert mngr.latest_step() == 3
    restored = mngr.restore(jax.device_get(_tree(0)))
    np.testing.assert_allclose(
        np.asarray(restored["dense"]["kernel"]),
        np.asarray(_tree(3)["dense"]["kernel"]))
    mngr.close()
