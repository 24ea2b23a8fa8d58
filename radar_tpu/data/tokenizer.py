"""Simple deterministic word-level tokenizer.

The reference depends on HuggingFace tokenizers downloaded from the hub
(``train_expert_models.py:560``); this framework never requires network
access: the tokenizer builds its vocabulary from the corpus (or the
clinical constant vocabulary) and round-trips via JSON.  An optional HF
tokenizer can be dropped in anywhere a ``Tokenizer`` is accepted — the
interface is ``encode/decode/encode_batch``.
"""

from __future__ import annotations

import json
import re

import numpy as np

from ..core import constants
from ..utils.io import atomic_write_json

PAD, CLS, SEP, UNK = 0, 1, 2, 3
SPECIALS = ("[PAD]", "[CLS]", "[SEP]", "[UNK]")

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


def _tokenize(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


class Tokenizer:
    def __init__(self, vocab: dict[str, int]):
        self.vocab = dict(vocab)
        self.inv = {i: w for w, i in self.vocab.items()}

    @property
    def special_token_ids(self) -> tuple[int, ...]:
        return (PAD, CLS, SEP, UNK)

    # -- construction -----------------------------------------------------
    @classmethod
    def from_corpus(cls, texts: list[str], vocab_size: int = 8192
                    ) -> "Tokenizer":
        from collections import Counter
        counts = Counter()
        for t in texts:
            counts.update(_tokenize(t))
        vocab = {w: i for i, w in enumerate(SPECIALS)}
        for w, _ in counts.most_common(vocab_size - len(SPECIALS)):
            vocab[w] = len(vocab)
        return cls(vocab)

    @classmethod
    def clinical_default(cls, vocab_size: int = 512) -> "Tokenizer":
        """Vocabulary seeded from the clinical constants — enough for
        synthetic data, demos and tests without any corpus."""
        texts = list(constants.OBSERVATION_NAMES)
        texts += list(constants.OBSERVATION_DESCRIPTIONS)
        texts += list(constants.RAG_OBSERVATION_VOCAB)
        texts += ["indication history comparison technique findings "
                  "impression chest radiograph frontal lateral view "
                  "patient evaluation there is are no seen of the with "
                  "and in stable unchanged increased decreased mild "
                  "moderate severe bilateral right left lower upper lobe "
                  "evidence acute process cases retrieved report",
                  ". , : ; ( ) - clear lungs cardiopulmonary"]
        return cls.from_corpus(texts, vocab_size)

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        atomic_write_json(path, self.vocab)

    @classmethod
    def load(cls, path: str) -> "Tokenizer":
        with open(path) as f:
            return cls(json.load(f))

    # -- encoding ----------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text: str, max_length: int = 128,
               truncate: str = "right") -> tuple[np.ndarray, np.ndarray]:
        """``truncate="left"`` keeps the LAST tokens when the text
        overflows — decoder prompts end with the instruction-critical
        tail (validated-observation line + "Findings:" marker), so
        prompts must drop the head, not the tail (round-2's hidden bug
        was exactly a tail truncation severing the expert stage from
        generation)."""
        words = [self.vocab.get(w, UNK) for w in _tokenize(text)]
        budget = max_length - 2          # room for [CLS] and [SEP]
        if truncate == "left":
            words = words[-budget:]
        else:
            words = words[:budget]
        ids = [CLS] + words + [SEP]
        mask = np.zeros(max_length, np.int32)
        out = np.full(max_length, PAD, np.int32)
        out[: len(ids)] = ids
        mask[: len(ids)] = 1
        return out, mask

    def encode_batch(self, texts: list[str], max_length: int = 128,
                     truncate: str = "right"
                     ) -> tuple[np.ndarray, np.ndarray]:
        pairs = [self.encode(t, max_length, truncate) for t in texts]
        ids = np.stack([p[0] for p in pairs])
        mask = np.stack([p[1] for p in pairs])
        return ids, mask

    def decode(self, ids) -> str:
        words = []
        for i in np.asarray(ids).tolist():
            if i == SEP:
                break
            if i in (PAD, CLS):
                continue
            words.append(self.inv.get(int(i), "[UNK]"))
        return " ".join(words)


class HFTokenizerAdapter:
    """Adapt a ``transformers`` tokenizer to this framework's interface
    (encode/encode_batch/decode with fixed-length numpy outputs), so
    production deployments can use a clinical wordpiece vocabulary
    wherever a ``Tokenizer`` is accepted."""

    def __init__(self, hf_tokenizer):
        self.hf = hf_tokenizer

    @property
    def vocab_size(self) -> int:
        return len(self.hf)

    @property
    def special_token_ids(self) -> tuple[int, ...]:
        return tuple(int(i) for i in self.hf.all_special_ids)

    def _with_side(self, payload, max_length: int, truncate: str):
        prev = self.hf.truncation_side
        self.hf.truncation_side = truncate
        try:
            out = self.hf(payload, padding="max_length",
                          truncation=True, max_length=max_length)
        finally:
            self.hf.truncation_side = prev
        return (np.asarray(out["input_ids"], np.int32),
                np.asarray(out["attention_mask"], np.int32))

    def encode(self, text: str, max_length: int = 128,
               truncate: str = "right"):
        return self._with_side(text, max_length, truncate)

    def encode_batch(self, texts: list[str], max_length: int = 128,
                     truncate: str = "right"):
        return self._with_side(list(texts), max_length, truncate)

    def decode(self, ids) -> str:
        return self.hf.decode(
            [int(i) for i in np.asarray(ids).tolist() if int(i) != 0],
            skip_special_tokens=True)
