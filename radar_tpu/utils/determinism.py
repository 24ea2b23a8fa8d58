"""Determinism / race detection utilities.

JAX programs with explicit PRNG keys should be bitwise deterministic;
nondeterminism indicates a real defect (host-side RNG leaking in, data
races in input pipelines, donated-buffer reuse).  ``check_determinism``
re-runs a function and compares outputs bitwise — used in CI over the
train step and the prefetching input pipeline (the only concurrency in
the framework).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def check_determinism(fn: Callable, *args, runs: int = 2,
                      **kwargs) -> bool:
    """Run ``fn`` ``runs`` times; raise AssertionError (with the leaf
    path) on any bitwise output mismatch. Returns True on success."""
    results = [jax.device_get(fn(*args, **kwargs)) for _ in range(runs)]
    first = results[0]
    for r, other in enumerate(results[1:], start=2):
        flat1, tree1 = jax.tree.flatten(first)
        flat2, tree2 = jax.tree.flatten(other)
        assert tree1 == tree2, "output structure differs between runs"
        paths = jax.tree_util.tree_flatten_with_path(first)[0]
        for (path, a), b in zip(paths, flat2):
            if not np.array_equal(np.asarray(a), np.asarray(b),
                                  equal_nan=True):
                raise AssertionError(
                    f"nondeterministic output at {jax.tree_util.keystr(path)} "
                    f"between run 1 and run {r}")
    return True
