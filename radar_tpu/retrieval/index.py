"""On-device sharded top-k retrieval index.

TPU-native replacement for the reference's CPU FAISS ``IndexFlatIP``
(``modeling_dense_passage_retrieval.py:297-313``): a capacity-padded
embedding matrix lives in device HBM, row-sharded over the mesh's
``data`` axis.  A query is one matmul on the MXU per shard +
``lax.top_k``, followed by an all-gather of per-shard candidates over
ICI and a global merge — implemented with ``shard_map`` so the
collective pattern is explicit.

Also implements — *for real* — the hybrid semantic+observation scoring
the reference only pretends to have (its ``hybrid_alpha`` is dead and
``build_indices`` drops the observation labels; SURVEY.md §0.2.6):
``score = alpha * cosine + (1 - alpha) * observation-Jaccard``.

Fixed shapes throughout: the buffer never changes size; adds write into
the padded capacity; searches mask invalid rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import RetrievalConfig
from ..core.constants import NUM_OBSERVATIONS
from ..core.mesh import DATA_AXIS

NEG_INF = -1e30


def _merge_topk(vals, idx, k, axis_name):
    """All-gather per-shard candidates and take the global top-k."""
    vals_g = jax.lax.all_gather(vals, axis_name, axis=1, tiled=True)
    idx_g = jax.lax.all_gather(idx, axis_name, axis=1, tiled=True)
    top_vals, pos = jax.lax.top_k(vals_g, k)
    top_idx = jnp.take_along_axis(idx_g, pos, axis=1)
    return top_vals, top_idx


class ShardedIndex:
    """Fixed-capacity, device-resident, optionally mesh-sharded index.

    Host-side object owning device buffers:
      embeddings [capacity, dim] (L2-normalised rows),
      observations [capacity, 14] multi-hot,
      valid [capacity] bool.
    """

    def __init__(self, config: RetrievalConfig, mesh: Mesh | None = None):
        if mesh is not None:
            shards = mesh.shape[DATA_AXIS]
            if config.capacity % shards:
                raise ValueError(
                    f"capacity {config.capacity} must divide over "
                    f"{shards} data shards")
        self.config = config
        self.mesh = mesh
        self.count = 0
        dim = config.embedding_dim
        cap = config.capacity
        emb = jnp.zeros((cap, dim), jnp.float32)
        obs = jnp.zeros((cap, NUM_OBSERVATIONS), jnp.float32)
        valid = jnp.zeros((cap,), jnp.bool_)
        if mesh is not None:
            self._emb_sh = NamedSharding(mesh, P(DATA_AXIS, None))
            self._obs_sh = NamedSharding(mesh, P(DATA_AXIS, None))
            self._valid_sh = NamedSharding(mesh, P(DATA_AXIS))
            self._repl = NamedSharding(mesh, P())
            emb = jax.device_put(emb, self._emb_sh)
            obs = jax.device_put(obs, self._obs_sh)
            valid = jax.device_put(valid, self._valid_sh)
        self.embeddings, self.observations, self.valid = emb, obs, valid
        # jitted search executables keyed by k: serving alternates the
        # veto/corroboration neighbour search (top_m, typically 10) with
        # the RAG loop's top_k=5 retrievals every call, so a single-slot
        # cache would rebuild the jit (and, cold, recompile) per flip
        self._search_fns: dict[int, object] = {}
        self._add_fn = None

    # ------------------------------------------------------------------
    def add(self, embeddings: np.ndarray,
            observations: np.ndarray | None = None) -> None:
        """Append rows (host arrays) into the padded buffers."""
        n = embeddings.shape[0]
        if self.count + n > self.config.capacity:
            raise ValueError(
                f"index capacity {self.config.capacity} exceeded "
                f"({self.count} + {n})")
        emb = jnp.asarray(embeddings, jnp.float32)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        if observations is None:
            obs = jnp.zeros((n, NUM_OBSERVATIONS), jnp.float32)
        else:
            obs = jnp.asarray(observations, jnp.float32)

        if self._add_fn is None:
            def _add(buf_e, buf_o, buf_v, e, o, start):
                buf_e = jax.lax.dynamic_update_slice(buf_e, e, (start, 0))
                buf_o = jax.lax.dynamic_update_slice(buf_o, o, (start, 0))
                buf_v = jax.lax.dynamic_update_slice(
                    buf_v, jnp.ones((e.shape[0],), jnp.bool_), (start,))
                return buf_e, buf_o, buf_v
            if self.mesh is not None:
                self._add_fn = jax.jit(
                    _add, donate_argnums=(0, 1, 2),
                    out_shardings=(self._emb_sh, self._obs_sh,
                                   self._valid_sh))
            else:
                self._add_fn = jax.jit(_add, donate_argnums=(0, 1, 2))

        self.embeddings, self.observations, self.valid = self._add_fn(
            self.embeddings, self.observations, self.valid,
            emb, obs, jnp.int32(self.count))
        self.count += n

    # ------------------------------------------------------------------
    def _build_search(self, k: int):
        cfg = self.config
        alpha = cfg.hybrid_alpha

        def score_and_topk(emb, obs, valid, q, q_obs, use_obs):
            sem = jnp.dot(q, emb.T,
                          preferred_element_type=jnp.float32)  # [Q, C]
            inter = q_obs @ obs.T
            union = (jnp.sum(q_obs, -1, keepdims=True)
                     + jnp.sum(obs, -1)[None, :] - inter)
            overlap = inter / jnp.maximum(union, 1e-8)
            hybrid = alpha * sem + (1.0 - alpha) * overlap
            score = jnp.where(use_obs, hybrid, sem)
            score = jnp.where(valid[None, :], score, NEG_INF)
            return jax.lax.top_k(score, k)

        if self.mesh is None:
            def search(emb, obs, valid, q, q_obs, use_obs):
                return score_and_topk(emb, obs, valid, q, q_obs, use_obs)
            return jax.jit(search)

        shard_cap = cfg.capacity // self.mesh.shape[DATA_AXIS]

        def shard_search(emb, obs, valid, q, q_obs, use_obs):
            vals, idx = score_and_topk(emb, obs, valid, q, q_obs, use_obs)
            idx = idx + jax.lax.axis_index(DATA_AXIS).astype(idx.dtype) \
                * shard_cap
            return _merge_topk(vals, idx, k, DATA_AXIS)

        mapped = shard_map(
            shard_search, mesh=self.mesh,
            in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS),
                      P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,  # all_gather+top_k output is replicated
        )
        return jax.jit(mapped)

    def search_device(self, queries, k: int | None = None,
                      query_observations=None):
        """Top-k search returning DEVICE arrays (scores [Q,k],
        ids [Q,k]) with no host sync — the streaming-serving building
        block: callers may queue many batches in flight and read
        results when needed (``search`` is the sync wrapper)."""
        k = k or self.config.top_k
        fn = self._search_fns.get(k)
        if fn is None:
            fn = self._search_fns[k] = self._build_search(k)
        q = jnp.asarray(queries, jnp.float32)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        if query_observations is None:
            q_obs = jnp.zeros((q.shape[0], NUM_OBSERVATIONS), jnp.float32)
            use_obs = jnp.asarray(False)
        else:
            q_obs = jnp.asarray(query_observations, jnp.float32)
            use_obs = jnp.asarray(True)
        return fn(self.embeddings, self.observations,
                               self.valid, q, q_obs, use_obs)

    def search(self, queries: np.ndarray, k: int | None = None,
               query_observations: np.ndarray | None = None):
        """Top-k search. Returns (scores [Q,k], ids [Q,k]) on host.

        With ``query_observations`` ([Q, 14] multi-hot), scoring is the
        hybrid semantic+observation mix; otherwise pure semantic.
        """
        vals, idx = self.search_device(queries, k, query_observations)
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        # mask padding hits (fewer than k valid rows)
        idx = np.where(vals <= NEG_INF / 2, -1, idx)
        return vals, idx

    def search_with_hard_negatives(self, queries: np.ndarray,
                                   k: int | None = None,
                                   num_negatives: int = 3,
                                   query_observations=None):
        """Top-k positives + the next ``num_negatives`` ranks as hard
        negatives (reference ``retrieve_with_hard_negatives`` :320-332)."""
        k = k or self.config.top_k
        vals, idx = self.search(queries, k + num_negatives,
                                query_observations)
        return (vals[:, :k], idx[:, :k]), (vals[:, k:], idx[:, k:])
