"""Dense passage retrieval facade — the reference's
``DensePassageRetrieval`` (``modeling_dense_passage_retrieval.py:334-356``)
over the TPU-native embedder + sharded index.

API parity: ``build_retrieval_database``, ``retrieve_for_text``,
``retrieve_for_image``, ``retrieve_with_hard_negatives``, and the
``create_dpr_model`` factory — plus first-class observation-aware
hybrid retrieval (fixing the reference's dead ``hybrid_alpha``).
"""

from __future__ import annotations

import numpy as np

from ..core.config import RadarConfig
from ..core.logging import get_logger
from .embedder import JittedEmbedder
from .index import ShardedIndex

logger = get_logger("radar_tpu.retrieval")


class DensePassageRetrieval:
    def __init__(self, embedder: JittedEmbedder, index: ShardedIndex):
        self.embedder = embedder
        self.index = index
        self.passages: list[str] = []

    # -- database -----------------------------------------------------------
    def build_retrieval_database(self, passages: list[str],
                                 observations: np.ndarray | None = None,
                                 batch_size: int = 64) -> int:
        """Embed and index report passages (with optional [N, 14]
        multi-hot observation labels for hybrid scoring)."""
        if not passages:
            return 0
        emb = self.embedder.embed_texts(passages, batch_size)
        self.index.add(emb, observations)
        self.passages.extend(passages)
        logger.info("indexed %d passages (total %d)", len(passages),
                    self.index.count)
        return len(passages)

    # -- queries -------------------------------------------------------------
    def _format(self, scores: np.ndarray, ids: np.ndarray) -> list[dict]:
        out = []
        for rank, (s, i) in enumerate(zip(scores.tolist(), ids.tolist())):
            if i < 0:
                continue
            out.append({"rank": rank, "passage_id": int(i),
                        "score": float(s),
                        "passage": self.passages[int(i)]
                        if int(i) < len(self.passages) else ""})
        return out

    def retrieve_for_text(self, text: str, k: int | None = None,
                          query_observations=None) -> list[dict]:
        q = self.embedder.embed_texts([text])
        scores, ids = self.index.search(q, k, query_observations)
        return self._format(scores[0], ids[0])

    def retrieve_for_texts(self, texts: list[str], k: int | None = None,
                           query_observations=None) -> list[list[dict]]:
        """Batched text retrieval: ONE embedder forward + ONE index
        search for all queries (the serving loop's per-iteration calls
        are host-RTT-bound when issued per study)."""
        q = self.embedder.embed_texts(texts)
        scores, ids = self.index.search(q, k, query_observations)
        return [self._format(scores[i], ids[i])
                for i in range(len(texts))]

    def retrieve_for_image(self, image: np.ndarray, k: int | None = None,
                           query_observations=None) -> list[dict]:
        q = self.embedder.embed_images([image])
        scores, ids = self.index.search(q, k, query_observations)
        return self._format(scores[0], ids[0])

    def retrieve_with_hard_negatives(self, text: str,
                                     k: int | None = None,
                                     num_negatives: int = 3
                                     ) -> tuple[list[dict], list[dict]]:
        q = self.embedder.embed_texts([text])
        (pv, pi), (nv, ni) = self.index.search_with_hard_negatives(
            q, k, num_negatives)
        return self._format(pv[0], pi[0]), self._format(nv[0], ni[0])


def create_dpr_model(config: RadarConfig | None = None, tokenizer=None,
                     mesh=None, params=None) -> DensePassageRetrieval:
    """Factory (reference ``create_dpr_model`` :353-356)."""
    from ..data.tokenizer import Tokenizer
    config = config or RadarConfig()
    tokenizer = tokenizer or Tokenizer.clinical_default(
        config.text.vocab_size)
    embedder = JittedEmbedder.create(config.vision, config.text,
                                     config.retrieval, tokenizer,
                                     params=params)
    index = ShardedIndex(config.retrieval, mesh)
    return DensePassageRetrieval(embedder, index)
