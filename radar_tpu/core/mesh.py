"""Device mesh construction and sharding helpers.

The reference is single-device (``.to(device)``,
``train_expert_models.py:570``; no collectives anywhere — SURVEY.md
§2.3).  Here parallelism is first-class: a 2-D ``("data", "model")``
mesh, NamedSharding helpers, and host-batch sharding utilities.  All
collectives are emitted by XLA from sharding annotations and ride ICI.
"""

from __future__ import annotations

import math
from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(config: MeshConfig | None = None,
               devices: list | None = None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    ``data=-1`` infers the data axis as ``num_devices // model``.
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, config.model)
    if n % model != 0:
        raise ValueError(f"model axis {model} does not divide {n} devices")
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        if config.allow_smaller and data * model < n:
            devices = devices[: data * model]
        else:
            raise ValueError(
                f"mesh {data}x{model} incompatible with {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """Per-leaf NamedShardings for a host batch dict (leading dim = batch)."""
    return {k: data_sharding(mesh, np.ndim(v)) for k, v in batch.items()}


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch, sharding the batch dim over ``data``."""
    return {
        k: jax.device_put(v, data_sharding(mesh, np.ndim(v)))
        for k, v in batch.items()
    }


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)


_ACTIVE_MESH: list[Mesh] = []


@contextmanager
def use_mesh(mesh: Mesh):
    """Context manager tracking the framework's active mesh.

    (Also enters ``jax.sharding.use_mesh`` semantics by simply keeping
    the mesh object available to modules that ask for it.)
    """
    _ACTIVE_MESH.append(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE_MESH.pop()


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH[-1] if _ACTIVE_MESH else None


def maybe_initialize_distributed() -> bool:
    """Initialise ``jax.distributed`` when multi-host env vars are
    present (COORDINATOR_ADDRESS / JAX_PROCESS_COUNT or a TPU pod
    runtime). No-op on a single host. Returns True if initialised.

    Multi-slice/DCN deployments call this before ``build_mesh`` so
    ``jax.devices()`` spans all hosts (see docs/DESIGN.md).
    """
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def single_device_mesh() -> Mesh:
    """A 1x1 mesh — lets every code path be mesh-driven even on one chip."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                (DATA_AXIS, MODEL_AXIS))
