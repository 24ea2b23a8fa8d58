"""Cross-modal embedder — the reference's BiomedCLIP role
(``modeling_dense_passage_retrieval.py:191-268``): paired vision/text
towers projected into one shared retrieval space (default 512-d,
L2-normalised).

No hub downloads: the towers are our own encoders (optionally warm-
startable from a trained ContrastiveExpert's towers, which share the
module structure).  Unlike the reference there are **no silent
random-embedding fallbacks** on failure (its ``:244,261`` corrupt
results; SURVEY.md §0.2) — errors propagate.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import RetrievalConfig, TextConfig, VisionConfig
from ..models.text import TextEncoder
from ..models.vision import build_vision_tower


class CrossModalEmbedder(nn.Module):
    vision_config: VisionConfig
    text_config: TextConfig
    retrieval_config: RetrievalConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dim = self.retrieval_config.embedding_dim
        self.vision = build_vision_tower(self.vision_config, self.dtype,
                                         name="vision")
        if self.text_config.arch == "bert":
            from ..models.bert import BertTextEncoder
            self.text = BertTextEncoder(self.text_config, self.dtype,
                                        name="text")
        else:
            self.text = TextEncoder(self.text_config, self.dtype,
                                    name="text")
        self.text_projection = nn.Dense(dim, dtype=self.dtype,
                                        name="text_proj")
        self.image_projection = nn.Dense(dim, dtype=self.dtype,
                                         name="image_proj")
        if self.retrieval_config.obs_head:
            # image->observation logits for hybrid query scoring
            # (round-5; config-gated so old param trees still restore)
            from ..core.constants import OBSERVATION_NAMES
            self.obs_head = nn.Dense(len(OBSERVATION_NAMES),
                                     dtype=self.dtype, name="obs_head")

    @staticmethod
    def _normalize(x):
        x = x.astype(jnp.float32)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)

    def encode_text(self, input_ids, attention_mask=None):
        pooled = self.text(input_ids, attention_mask)["pooler_output"]
        return self._normalize(self.text_projection(pooled))

    def text_hidden(self, input_ids, attention_mask=None):
        """Token-level text features [B, S, H] — the PF/SF feature
        streams the knowledge-fusion stage consumes."""
        return self.text(input_ids,
                         attention_mask)["last_hidden_state"]

    def encode_image(self, pixel_values):
        pooled = self.vision(pixel_values)["pooler_output"]
        return self._normalize(self.image_projection(pooled))

    def image_observation_logits(self, pixel_values):
        """[B, 14] observation logits from the image tower (only when
        ``retrieval_config.obs_head``) — the classification signal the
        hybrid image-query score mixes with cosine similarity."""
        pooled = self.vision(pixel_values)["pooler_output"]
        return self.obs_head(pooled).astype(jnp.float32)

    def encode_image_with_obs(self, pixel_values):
        """(embedding [B, D], observation logits [B, 14]) sharing one
        vision forward — what image-query retrieval actually needs."""
        pooled = self.vision(pixel_values)["pooler_output"]
        emb = self._normalize(self.image_projection(pooled))
        return emb, self.obs_head(pooled).astype(jnp.float32)

    def __call__(self, pixel_values, input_ids, attention_mask=None):
        if self.retrieval_config.obs_head:
            # route through the joint method so ``init`` creates the
            # obs_head params (the duplicate deterministic vision
            # forward is CSE'd under jit; training reuses the logits)
            img, _ = self.encode_image_with_obs(pixel_values)
        else:
            img = self.encode_image(pixel_values)
        return img, self.encode_text(input_ids, attention_mask)


class JittedEmbedder:
    """Host-side wrapper: holds params and jit-compiled encode fns."""

    def __init__(self, module: CrossModalEmbedder, params, tokenizer,
                 max_length: int = 128):
        self.module = module
        self.params = params          # pinned on device via the setter
        self.tokenizer = tokenizer
        self.max_length = max_length
        self._encode_text = jax.jit(
            lambda p, ids, m: module.apply({"params": p}, ids, m,
                                           method=module.encode_text))
        self._encode_image = jax.jit(
            lambda p, pv: module.apply({"params": p}, pv,
                                       method=module.encode_image))
        self._text_hidden = jax.jit(
            lambda p, ids, m: module.apply({"params": p}, ids, m,
                                           method=module.text_hidden))
        self._encode_image_obs = (jax.jit(
            lambda p, pv: module.apply(
                {"params": p}, pv,
                method=module.encode_image_with_obs))
            if module.retrieval_config.obs_head else None)

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, p):
        # Orbax restores host numpy; jit re-uploads numpy args on every
        # call (seconds per call through the axon relay) — pin once.
        self._params = None if p is None else jax.device_put(p)

    @classmethod
    def create(cls, vision_config: VisionConfig, text_config: TextConfig,
               retrieval_config: RetrievalConfig, tokenizer,
               rng: jax.Array | None = None, params=None,
               dtype=jnp.float32) -> "JittedEmbedder":
        module = CrossModalEmbedder(vision_config, text_config,
                                    retrieval_config, dtype)
        max_len = min(retrieval_config.max_passage_tokens,
                      text_config.max_length)
        if params is None:
            rng = rng if rng is not None else jax.random.key(0)
            pv = jnp.zeros((1, vision_config.image_size,
                            vision_config.image_size,
                            vision_config.channels), jnp.float32)
            ids = jnp.zeros((1, max_len), jnp.int32)
            mask = jnp.ones_like(ids)
            params = module.init(rng, pv, ids, mask)["params"]
        return cls(module, params, tokenizer, max_len)

    def embed_texts(self, texts: list[str], batch_size: int = 64):
        import numpy as np
        outs = []
        for start in range(0, len(texts), batch_size):
            chunk = texts[start:start + batch_size]
            ids, mask = self.tokenizer.encode_batch(chunk, self.max_length)
            outs.append(np.asarray(
                self._encode_text(self.params, jnp.asarray(ids),
                                  jnp.asarray(mask))))
        return np.concatenate(outs, axis=0)

    def embed_text_hidden(self, texts: list[str], seq_len: int
                          ) -> tuple["np.ndarray", "np.ndarray"]:
        """Token-level features for fusion: ([B, seq_len, H], mask)."""
        import numpy as np
        ids, mask = self.tokenizer.encode_batch(
            texts, min(seq_len, self.max_length))
        feats = np.asarray(self._text_hidden(
            self.params, jnp.asarray(ids), jnp.asarray(mask)))
        if feats.shape[1] < seq_len:
            pad = seq_len - feats.shape[1]
            feats = np.pad(feats, ((0, 0), (0, pad), (0, 0)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return feats, mask.astype(np.float32)

    def embed_images(self, images, batch_size: int = 64):
        import numpy as np
        outs = []
        for start in range(0, len(images), batch_size):
            chunk = jnp.asarray(np.stack(images[start:start + batch_size]))
            outs.append(np.asarray(self._encode_image(self.params, chunk)))
        return np.concatenate(outs, axis=0)

    def embed_images_device(self, images):
        """Embed an already-device-resident [B, H, W, 3] batch in one
        program — no host staging or chunking.  Used by the batched
        serving path, where the image batch is uploaded once (as
        uint8) and preprocessed on device."""
        return self._encode_image(self.params, images)

    @property
    def has_obs_head(self) -> bool:
        return self.module.retrieval_config.obs_head

    def embed_images_with_obs(self, images, batch_size: int = 64):
        """(embeddings [N, D], observation probs [N, 14]) in one
        vision forward per chunk — the hybrid image-query inputs."""
        import numpy as np
        if self._encode_image_obs is None:
            raise ValueError("embedder has no obs_head "
                             "(retrieval_config.obs_head=False)")
        embs, probs = [], []
        for start in range(0, len(images), batch_size):
            chunk = jnp.asarray(np.stack(images[start:start + batch_size]))
            e, lg = self._encode_image_obs(self.params, chunk)
            embs.append(np.asarray(e))
            probs.append(np.asarray(jax.nn.sigmoid(lg)))
        return np.concatenate(embs, 0), np.concatenate(probs, 0)
