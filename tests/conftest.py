"""Test bootstrap: force an 8-device CPU host platform so every sharding
path (mesh, pjit, shard_map, collectives) is exercised without TPUs —
the multi-node-testing capability the reference lacks (SURVEY.md §4.5).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on this
# single-core host (~12 min cold); a warm .cache/jax cuts re-runs to
# a fraction.  Harmless when cold — entries are written as tests run.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402

from radar_tpu.core.config import tiny_config  # noqa: E402
from radar_tpu.core.mesh import build_mesh  # noqa: E402
from radar_tpu.core.config import MeshConfig  # noqa: E402
from radar_tpu.data.synthetic import SyntheticCXRDataset  # noqa: E402
from radar_tpu.data.tokenizer import Tokenizer  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def tokenizer():
    return Tokenizer.clinical_default()


@pytest.fixture(scope="session")
def dataset(cfg, tokenizer):
    return SyntheticCXRDataset(
        size=cfg.data.synthetic_size,
        image_size=cfg.vision.image_size,
        max_length=cfg.text.max_length,
        tokenizer=tokenizer, seed=0)


@pytest.fixture(scope="session")
def batch(dataset, cfg):
    return next(dataset.batches(cfg.train.batch_size))


@pytest.fixture(scope="session")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return build_mesh(MeshConfig(data=4, model=2))


@pytest.fixture(scope="session")
def mesh_data():
    return build_mesh(MeshConfig(data=8, model=1))
