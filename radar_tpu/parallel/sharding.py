"""Parameter partition rules (tensor parallelism) + sharded-state setup.

The reference has no parallelism of any kind (SURVEY.md §2.3).  Here a
2-D ("data", "model") mesh carries:

- DP: batch dim sharded over ``data`` (gradient psum emitted by XLA);
- TP: transformer weights sharded over ``model`` with the Megatron
  pattern — qkv/fc1 column-parallel (output features sharded), out/fc2
  row-parallel (input features sharded), embeddings vocab-replicated
  with hidden sharded — so each block needs one all-reduce, inserted by
  XLA from the sharding annotations (rides ICI).

Rules are path-regex → PartitionSpec, applied to any of our models.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS

# (regex over "/"-joined param path, spec) — first match wins.
# Specs refer to the *last* dims of the param; leading dims replicated.
_RULES: tuple[tuple[str, P], ...] = (
    # attention projections: q/k/v column-parallel, out row-parallel
    (r"attn/(q|k|v)/kernel$", P(None, MODEL_AXIS)),
    (r"attn/(q|k|v)/bias$", P(MODEL_AXIS)),
    (r"attn/out/kernel$", P(MODEL_AXIS, None)),
    (r"attn/out/bias$", P()),
    # transformer MLPs: fc1 column-, fc2 row-parallel
    (r"mlp/fc1/kernel$", P(None, MODEL_AXIS)),
    (r"mlp/fc1/bias$", P(MODEL_AXIS)),
    (r"mlp/fc2/kernel$", P(MODEL_AXIS, None)),
    (r"mlp/fc2/bias$", P()),
    # patch embed: shard output channels
    (r"patch_embed/kernel$", P(None, None, None, MODEL_AXIS)),
    (r"patch_embed/bias$", P(MODEL_AXIS)),
    # token embeddings: shard hidden dim
    (r"token_embed/embedding$", P(None, MODEL_AXIS)),
    # projection / classifier heads: column-parallel fc1, row-parallel fc2
    (r"(classifier|image_projection|text_projection)/fc1/kernel$",
     P(None, MODEL_AXIS)),
    (r"(classifier|image_projection|text_projection)/fc1/bias$",
     P(MODEL_AXIS)),
    (r"(classifier|image_projection|text_projection)/fc2/kernel$",
     P(MODEL_AXIS, None)),
    # everything else replicated
    (r".*", P()),
)


def spec_for_path(path: str, shape: tuple[int, ...],
                  mesh: Mesh) -> P:
    """Resolve the PartitionSpec for one param, falling back to
    replication when the sharded dim does not divide the axis size."""
    msize = mesh.shape[MODEL_AXIS]
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            if spec == P():
                return spec
            # pad spec to rank, aligned to the trailing dims
            spec_t = tuple(spec)
            full = (None,) * (len(shape) - len(spec_t)) + spec_t
            ok = all(ax is None or shape[i] % msize == 0
                     for i, ax in enumerate(full))
            return P(*full) if ok else P()
    return P()


def _flatten_path(key_path) -> str:
    return "/".join(getattr(k, "key", getattr(k, "idx", str(k))).__str__()
                    for k in key_path)


def param_shardings(params_shape, mesh: Mesh):
    """NamedSharding pytree matching ``params_shape`` (a ShapeDtypeStruct
    pytree from ``jax.eval_shape``) under the TP rules."""
    def leaf(key_path, leaf_shape):
        path = _flatten_path(key_path)
        spec = spec_for_path(path, tuple(leaf_shape.shape), mesh)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(leaf, params_shape)


def state_shardings(state_shape, mesh: Mesh):
    """Shardings for a full TrainState: params + optimizer moments follow
    the TP rules (moments have the same shape as params); scalars
    replicated."""
    def leaf(key_path, leaf_shape):
        path = _flatten_path(key_path)
        shape = tuple(getattr(leaf_shape, "shape", ()))
        if not shape:
            return NamedSharding(mesh, P())
        spec = spec_for_path(path, shape, mesh)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(leaf, state_shape)


def shard_init(init_fn, mesh: Mesh, *args):
    """jit-compile ``init_fn`` with sharded outputs so large params are
    *born* sharded (no host round-trip)."""
    shape = jax.eval_shape(init_fn, *args)
    shardings = state_shardings(shape, mesh)
    return jax.jit(init_fn, out_shardings=shardings)(*args), shardings


def describe_shardings(shardings) -> dict[str, str]:
    out = {}
    def leaf(key_path, s):
        out[_flatten_path(key_path)] = str(s.spec)
        return s
    jax.tree_util.tree_map_with_path(leaf, shardings)
    return out


def count_sharded(shardings) -> int:
    return sum(1 for s in jax.tree.leaves(shardings) if s.spec != P())
