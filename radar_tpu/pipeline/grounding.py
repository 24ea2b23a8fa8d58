"""Contribution 3.3 — cross-modal hallucination detection.

The reference PLANS this and ships nothing (``README.md:113-120``:
"Visual grounding module for generated findings; factual consistency
scoring; constrained decoding to prevent hallucinations; entity-level
verification against image" — status "PLANNED").  Real implementation:

- ``GroundingVerifier.verify``: entity-level verification of every
  observation mentioned in a generated report against the expert
  stage's image-conditioned probabilities — each entity gets a
  verdict (``supported`` / ``uncertain`` / ``hallucinated``) and the
  report a factual-consistency score.
- ``banned_token_mask``: the constrained-decoding hook — a [vocab]
  mask of the hallucinated observations' name tokens, enforced inside
  the jitted decode loop (``models/decoder.py:generate(banned_mask=)``)
  so the regenerated report *cannot* emit them.
- ``filter_hallucinated_sentences``: host-side fallback scrub that
  drops sentences asserting an unsupported observation (used on the
  final text so even prompt-copied mentions are removed).

The visual grounding signal is the expert model itself: its
probabilities are computed from the image (+ clinical context), so
"verify the entity against the image" = "check the expert's
image-conditioned probability for that entity" — the same gating RADAR
uses to filter retrieval knowledge, now pointed at the decoder's own
output.
"""

from __future__ import annotations

import re

import numpy as np

from ..core.constants import OBSERVATION_NAMES
from ..core.logging import get_logger
from .observations import ObservationDetector

logger = get_logger("radar_tpu.grounding")

SUPPORTED, UNCERTAIN, HALLUCINATED = "supported", "uncertain", "hallucinated"

# RAG detector vocabulary -> canonical CheXpert-14 name (the detector
# also knows synonyms like "Pulmonary Edema"; map them back before
# indexing into the expert's probability vector)
_ALIAS = {"Pulmonary Edema": "Edema", "Rib Fracture": "Fracture"}


class GroundingVerifier:
    def __init__(self, support_threshold: float = 0.4,
                 hallucination_threshold: float = 0.15,
                 detector: ObservationDetector | None = None):
        """``support_threshold``: expert probability above which a
        mentioned entity counts as image-supported;
        ``hallucination_threshold``: probability below which it counts
        as hallucinated (between the two = uncertain, left alone)."""
        self.support_threshold = support_threshold
        self.hallucination_threshold = hallucination_threshold
        self.detector = detector or ObservationDetector()

    # ------------------------------------------------------------------
    def _prob_for(self, name: str, probs: np.ndarray) -> float | None:
        canon = _ALIAS.get(name, name)
        if canon in OBSERVATION_NAMES:
            return float(probs[OBSERVATION_NAMES.index(canon)])
        return None

    def verify(self, report: str, expert_probs: np.ndarray,
               neighbour_votes: np.ndarray | None = None,
               veto_prob: float = 0.7,
               veto_min_votes: float = 6,
               veto_floor: float = 0.4) -> dict:
        """Entity-level verification of a generated report.

        Returns entities (name/probability/verdict), the hallucinated
        subset, and the factual-consistency score (supported mentions /
        gradeable mentions; 1.0 when nothing is mentioned).

        With ``neighbour_votes`` (per-observation image-neighbour vote
        counts, ``RadarPipeline._neighbour_votes``) the cross-modal
        veto rule also grades mentions: an entity survives only if the
        expert is strongly confident (prob > ``veto_prob``) OR enough
        visual neighbours corroborate it (votes >= ``veto_min_votes``)
        while the expert is at least lukewarm (prob > ``veto_floor``).
        The two models are independently trained, so their false
        positives decorrelate; the floor stops the image-similarity
        prior from overriding an expert refutation (round-3 split-half
        validation, scripts/diagnose_halluc.py: held-out mention halluc
        0.105 -> 0.083 at -2% true mentions).
        """
        probs = np.asarray(expert_probs).reshape(-1)
        votes = (np.asarray(neighbour_votes).reshape(-1)
                 if neighbour_votes is not None else None)
        detected = self.detector.detect_observations(report)
        # dedupe detector synonyms by canonical observation ("pulmonary
        # edema" in text yields both 'Edema' and 'Pulmonary Edema' for
        # ONE mention — grading both inflates num_entities; ADVICE r2)
        canonical = sorted({_ALIAS.get(n, n) for n in detected})
        entities, hallucinated = [], []
        supported = uncertain = gradeable = 0
        for name in canonical:
            if name == "No Finding":
                continue
            p = self._prob_for(name, probs)
            if p is None:
                continue
            gradeable += 1
            vetoed = False
            if votes is not None:
                j = OBSERVATION_NAMES.index(name)
                vetoed = not (p > veto_prob
                              or (p > veto_floor
                                  and votes[j] >= veto_min_votes))
            if p <= self.hallucination_threshold or vetoed:
                verdict = HALLUCINATED
                hallucinated.append(name)
            elif p >= self.support_threshold:
                verdict = SUPPORTED
                supported += 1
            else:
                verdict = UNCERTAIN
                uncertain += 1  # reported separately, not counted as
                # supported (ADVICE r2: folding them in inflated
                # factual_consistency)
            entities.append({"entity": name, "probability": p,
                             "verdict": verdict})
        return {
            "entities": entities,
            "hallucinated": hallucinated,
            # supported / hard-graded mentions; uncertain mentions are
            # excluded from the denominator (neither credit nor blame)
            "factual_consistency": (
                supported / (gradeable - uncertain)
                if gradeable - uncertain else 1.0),
            "num_entities": gradeable,
            "num_uncertain": uncertain,
        }

    # ------------------------------------------------------------------
    def banned_token_mask(self, tokenizer, hallucinated: list[str],
                          vocab_size: int | None = None
                          ) -> np.ndarray | None:
        """[vocab] bool mask of the hallucinated observations' name
        tokens (and their detector synonyms) for constrained decoding.

        Common clinical words shared with benign phrasing ("lung",
        "pleural") are NOT banned — only tokens whose word appears
        exclusively in hallucinated observation names among the
        CheXpert-14 vocabulary, so the constraint removes the entity
        without crippling the report's language.
        """
        if not hallucinated:
            return None
        ban_words = self._name_words(hallucinated)
        keep_words = self._name_words(
            [n for n in OBSERVATION_NAMES if n not in hallucinated])
        ban_words -= keep_words
        if not ban_words:
            return None
        # size to the decoder's logits vocab (may exceed the
        # tokenizer's when the decoder was configured wider)
        mask = np.zeros((vocab_size or tokenizer.vocab_size,), bool)
        # special-token ids come from the tokenizer when it exposes
        # them (the HF adapter does); 0-3 is only the word-tokenizer
        # convention (ADVICE r2)
        special_ids = getattr(tokenizer, "special_token_ids", None)
        # only a MISSING attribute falls back to the word-tokenizer's
        # 0-3 convention; an empty-but-present tuple (an HF tokenizer
        # with no special tokens) means nothing is exempt from banning
        special = set(range(4) if special_ids is None else special_ids)
        hit = False
        for word in ban_words:
            ids, m = tokenizer.encode(word, max_length=4)
            for tid, valid in zip(np.asarray(ids), np.asarray(m)):
                tid = int(tid)
                # bounds-check: an HF tokenizer id can exceed a
                # narrower decoder vocab (ADVICE r2)
                if valid and tid not in special and tid < mask.shape[0]:
                    mask[tid] = True
                    hit = True
        return mask if hit else None

    def _name_words(self, names: list[str]) -> set[str]:
        words = set()
        for name in names:
            for syn in ([name] + [a for a, c in _ALIAS.items()
                                  if c == name]):
                words.update(w.lower() for w in re.findall(r"[a-z]+",
                                                           syn.lower()))
        return words

    # ------------------------------------------------------------------
    def filter_hallucinated_sentences(self, report: str,
                                      hallucinated: list[str]) -> str:
        """Drop sentences that positively assert a hallucinated
        observation (negated mentions are fine — "no pneumothorax" is
        not a hallucination)."""
        if not hallucinated:
            return report
        sentences = re.split(r"(?<=[.!?])\s+", report)
        kept = []
        for s in sentences:
            mentioned = self.detector.detect_observations(s)
            if mentioned & set(hallucinated):
                continue
            kept.append(s)
        out = " ".join(kept).strip()
        return out if out else "No acute cardiopulmonary process."
