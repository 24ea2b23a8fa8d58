"""PRNG key discipline.

All randomness flows through explicit ``jax.random`` keys.  ``KeyStream``
is a tiny host-side helper that hands out fresh keys deterministically
from a seed; jitted code never sees it — it only sees concrete keys.
"""

from __future__ import annotations

import jax


class KeyStream:
    """Deterministic stream of PRNG keys from a single seed."""

    def __init__(self, seed: int | jax.Array):
        self._key = jax.random.key(seed) if isinstance(seed, int) else seed

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int) -> jax.Array:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return jax.numpy.stack(subs)

    def fold_in(self, data: int) -> jax.Array:
        return jax.random.fold_in(self._key, data)
