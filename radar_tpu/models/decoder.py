"""Report-generation decoder with KV-cached autoregressive decoding.

Net-new vs the reference, which orchestrates an *external* MLLM through
an injected callable and ships only string-returning mocks
(``modeling_iterative_rag.py:198-201,332-333`` — SURVEY.md §0.1).  Here
the generation stage is a real decoder-only transformer:

- training: teacher-forced next-token prediction over
  ``[image-prefix] + context tokens + report tokens``;
- inference: one jitted program — prefill over the padded prompt, then
  ``lax.scan`` over ``max_new_tokens`` greedy/temperature steps with a
  functional KV cache (per-row write positions handle ragged prompt
  lengths without dynamic shapes).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..ops.attention import dot_product_attention
from .layers import Mlp


def _split_heads(x, num_heads):
    b, t, e = x.shape
    return x.reshape(b, t, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


class CachedSelfAttention(nn.Module):
    """Causal self-attention supporting two modes:

    - prefill (``cache=None``): full causal attention over [B, T, E];
      also returns the K/V to seed a decode cache.
    - decode (``cache=(k, v)``): x is [B, 1, E]; K/V are scattered into
      the cache at per-row ``write_pos`` and attention is masked to
      ``valid_len`` slots.
    """
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, cache=None, write_pos=None,
                 valid_len=None, ring=None):
        e = x.shape[-1]
        q = _split_heads(nn.Dense(e, dtype=self.dtype, name="q")(x),
                         self.num_heads)
        k = _split_heads(nn.Dense(e, dtype=self.dtype, name="k")(x),
                         self.num_heads)
        v = _split_heads(nn.Dense(e, dtype=self.dtype, name="v")(x),
                         self.num_heads)

        if cache is None:
            if ring is not None:
                # context-parallel prefill: sequence-sharded ring
                # attention over the given (mesh, axis)
                from ..parallel.context import ring_attention
                mesh, axis = ring
                out = ring_attention(q, k, v, mesh, axis, causal=True,
                                     kv_mask=attn_mask)
                new_kv = (k, v)
                out = nn.Dense(e, dtype=self.dtype,
                               name="out")(_merge_heads(out))
                return out, new_kv
            mask = None
            if attn_mask is not None:  # [B, T] padding mask
                mask = attn_mask[:, None, None, :].astype(bool)
            out = dot_product_attention(q, k, v, mask=mask, causal=True)
            new_kv = (k, v)
        else:
            ck, cv = cache                      # [B, H, S, D]
            s = ck.shape[2]
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], s), 1)
                      == write_pos[:, None])    # [B, S]
            oh = onehot[:, None, :, None].astype(ck.dtype)
            ck = ck * (1 - oh) + k * oh
            cv = cv * (1 - oh) + v * oh
            visible = (jax.lax.broadcasted_iota(jnp.int32,
                                                (x.shape[0], s), 1)
                       <= write_pos[:, None])   # [B, S]
            mask = visible[:, None, None, :]
            out = dot_product_attention(q, ck, cv, mask=mask)
            new_kv = (ck, cv)

        out = nn.Dense(e, dtype=self.dtype, name="out")(_merge_heads(out))
        return out, new_kv


class DecoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, cache=None, write_pos=None,
                 ring=None, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        attn_out, new_kv = CachedSelfAttention(
            self.num_heads, self.dtype, name="attn")(
            h, attn_mask=attn_mask, cache=cache, write_pos=write_pos,
            ring=ring)
        x = x + nn.Dropout(self.dropout_rate)(
            attn_out, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        x = x + Mlp(int(x.shape[-1] * self.mlp_ratio), x.shape[-1],
                    self.dropout_rate, self.dtype, name="mlp")(
            h, deterministic=deterministic)
        return x, new_kv


class ReportDecoder(nn.Module):
    """Decoder-only LM with an optional conditioning prefix embedding
    (the image embedding projected to one prefix token).

    Initialise with a ``[B, config.prefix_dim]`` prefix so the
    projection params exist whether or not a given call passes one.
    """
    config: DecoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.token_embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                    dtype=self.dtype, name="token_embed")
        self.pos_embed = self.param("pos_embed",
                                    nn.initializers.normal(0.02),
                                    (1, cfg.max_length, cfg.hidden_size))
        self.prefix_proj = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                    name="prefix_proj")
        self.blocks = [
            DecoderBlock(cfg.num_heads, cfg.mlp_ratio, cfg.dropout_rate,
                         self.dtype, name=f"block_{i}")
            for i in range(cfg.depth)
        ]
        self.ln_f = nn.LayerNorm(dtype=self.dtype, name="ln_f")
        self.lm_head = nn.Dense(cfg.vocab_size, dtype=self.dtype,
                                name="lm_head")

    def _embed(self, input_ids, positions):
        x = self.token_embed(input_ids)
        pos = jnp.take_along_axis(
            jnp.broadcast_to(self.pos_embed.astype(self.dtype),
                             (input_ids.shape[0],) + self.pos_embed.shape[1:]),
            positions[..., None], axis=1)
        return x + pos

    def __call__(self, input_ids, attention_mask=None,
                 prefix_embedding=None, *, deterministic: bool = True):
        """Teacher-forced forward. Returns logits [B, P+T, V] where P is
        1 when a prefix embedding is given, else 0."""
        b, t = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        x = self._embed(input_ids, positions)
        if prefix_embedding is not None:
            pref = self.prefix_proj(prefix_embedding)[:, None, :]
            x = jnp.concatenate([pref.astype(self.dtype), x], axis=1)
            if attention_mask is not None:
                attention_mask = jnp.concatenate(
                    [jnp.ones((b, 1), attention_mask.dtype),
                     attention_mask], axis=1)
        for block in self.blocks:
            x, _ = block(x, attn_mask=attention_mask,
                         deterministic=deterministic)
        logits = self.lm_head(self.ln_f(x))
        return logits.astype(jnp.float32)

    # -- decode path -----------------------------------------------------
    def prefill(self, input_ids, attention_mask, prefix_embedding=None,
                cache_len: int | None = None, ring=None):
        """Run the prompt through the stack, returning (logits, kv_list)
        padded to ``cache_len`` slots (default ``max_length``) —
        sizing the cache to prompt+new_tokens instead of the full
        position table cuts per-step decode attention proportionally.

        ``ring=(mesh, axis)`` runs the prefill attention context-
        parallel (sequence sharded over the mesh axis, ring K/V
        rotation) for long retrieved-evidence prompts; the returned
        caches are global (the per-shard K/V are what the shard holds),
        ready for ordinary single-program decode.
        """
        cfg = self.config
        b, t = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        x = self._embed(input_ids, positions)
        if prefix_embedding is not None:
            pref = self.prefix_proj(prefix_embedding)[:, None, :]
            x = jnp.concatenate([pref.astype(self.dtype), x], axis=1)
            attention_mask = jnp.concatenate(
                [jnp.ones((b, 1), attention_mask.dtype), attention_mask],
                axis=1)
        cache_len = cache_len or cfg.max_length
        caches = []
        for block in self.blocks:
            x, (k, v) = block(x, attn_mask=attention_mask, ring=ring)
            pad = cache_len - k.shape[2]
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            caches.append((k, v))
        logits = self.lm_head(self.ln_f(x))
        return logits.astype(jnp.float32), caches

    def decode_step(self, token, cache_pos, token_pos, caches):
        """One decode step.

        token [B]; cache_pos [B] = cache slot to write (includes any
        prefix offset); token_pos [B] = sequence position for the
        position embedding (excludes the prefix). Returns
        (logits [B, V], new caches)."""
        x = self.token_embed(token[:, None])
        pos = jnp.take_along_axis(
            jnp.broadcast_to(self.pos_embed.astype(self.dtype),
                             (token.shape[0],) + self.pos_embed.shape[1:]),
            jnp.clip(token_pos, 0,
                     self.config.max_length - 1)[:, None, None],
            axis=1)
        x = x + pos
        new_caches = []
        for block, cache in zip(self.blocks, caches):
            x, kv = block(x, cache=cache, write_pos=cache_pos)
            new_caches.append(kv)
        logits = self.lm_head(self.ln_f(x))[:, 0]
        return logits.astype(jnp.float32), new_caches


def lm_loss(logits, targets, mask):
    """Next-token CE. logits [B, T, V] predicts targets [B, T]."""
    import optax
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], targets[:, 1:])
    m = mask[:, 1:].astype(jnp.float32)
    return jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)


@partial(jax.jit,
         static_argnames=("model", "max_new_tokens", "eos_id",
                          "temperature", "ring"))
def generate(model: ReportDecoder, params, input_ids, attention_mask,
             prefix_embedding=None, rng=None, *,
             max_new_tokens: int = 100, temperature: float = 0.0,
             eos_id: int = 2, banned_mask=None, ring=None):
    """Jitted autoregressive generation.

    Prompts are right-padded; each row decodes from its own length.
    Returns [B, max_new_tokens] generated ids (PAD after EOS).

    ``banned_mask``: optional [vocab] bool array — True entries can
    never be emitted (their logits are forced to -inf before every
    sampling step).  This is the constrained-decoding hook for
    hallucination prevention (contribution 3.3): ban the token ids of
    observation names the expert stage rejects, and the decoder cannot
    write them.

    ``ring``: optional ``(mesh, axis_name)`` — context-parallel ring
    attention for the PREFILL (long prompts sequence-sharded over the
    mesh axis; ``parallel/context.py``); the token-by-token decode
    stays single-program.
    """
    b = input_ids.shape[0]
    lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)  # [B]
    prefix_offset = 0 if prefix_embedding is None else 1
    if ring is not None:
        mesh, axis = ring
        if (input_ids.shape[1] + prefix_offset) % mesh.shape[axis]:
            ring = None   # sequence not CP-divisible: plain prefill

    # cache sized to the worst case of this call, 128-aligned
    need = input_ids.shape[1] + prefix_offset + max_new_tokens
    if need > model.config.max_length + prefix_offset:
        raise ValueError(
            f"prompt ({input_ids.shape[1]}) + max_new_tokens "
            f"({max_new_tokens}) exceeds decoder max_length "
            f"({model.config.max_length}); decode writes would fall "
            f"outside the cache")
    cache_len = min(-(-need // 128) * 128,
                    model.config.max_length + prefix_offset)
    logits, caches = model.apply(
        {"params": params}, input_ids, attention_mask, prefix_embedding,
        method=model.prefill, cache_len=cache_len, ring=ring)
    # logits index of last real token (prefix shifts positions by 1)
    last_idx = lengths - 1 + prefix_offset
    next_logits = jnp.take_along_axis(
        logits, last_idx[:, None, None], axis=1)[:, 0]

    if rng is None:
        rng = jax.random.key(0)

    def sample(logits, key):
        if banned_mask is not None:
            ban = (banned_mask if banned_mask.ndim == 2   # per-row [B, V]
                   else banned_mask[None, :])             # shared [V]
            logits = jnp.where(ban, -1e30, logits)
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits / temperature,
                                      axis=-1).astype(jnp.int32)

    def step(carry, i):
        next_logits, caches, done, key = carry
        key, sub = jax.random.split(key)
        token = sample(next_logits, sub)
        token = jnp.where(done, 0, token)
        done = done | (token == eos_id)
        cache_pos = lengths + prefix_offset + i
        token_pos = lengths + i
        logits, caches = model.apply(
            {"params": params}, token, cache_pos, token_pos, caches,
            method=model.decode_step)
        return (logits, caches, done, key), token

    init = (next_logits, caches, jnp.zeros((b,), bool), rng)
    _, tokens = jax.lax.scan(step, init, jnp.arange(max_new_tokens))
    return tokens.T  # [B, max_new_tokens]
