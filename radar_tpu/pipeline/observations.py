"""Host-side observation detection and consistency verification for the
iterative RAG loop (reference ``modeling_iterative_rag.py:23-108``).

String-space logic stays on the host by design (SURVEY.md §7.4.3): the
detector's substring matching over a 14-term clinical vocabulary is not
tensor work; jitting it would force tokenised fixed-shape gymnastics for
zero FLOPs.
"""

from __future__ import annotations

import re

from ..core import constants

# Negation cues that flip a following observation mention to negative
# ("no pleural effusion", "without evidence of pneumothorax"...).  The
# reference's detector has no negation handling
# (``modeling_iterative_rag.py:38-49``) which mis-detects negative
# mentions as positives on real report text; fixed here per SURVEY §0.2.
_NEGATION_RE = re.compile(
    r"\b(no|not|without|absent|negative|denies|denied|resolved|"
    r"free of|clear of|rules? out|ruled out|excludes?)\b")
_SENTENCE_BREAKS = ".;:\n"
_NEG_WINDOW = 48  # chars of left context a cue can act across


class ObservationDetector:
    """Substring-matching detector over the clinical vocabulary, with
    simple negation-scope handling (``negation_aware=False`` restores
    the reference's raw substring behavior)."""

    def __init__(self, vocab: tuple[str, ...] | None = None,
                 negation_aware: bool = True):
        self.vocab = tuple(vocab or constants.RAG_OBSERVATION_VOCAB)
        self.negation_aware = negation_aware

    @staticmethod
    def _negated_at(lower: str, start: int) -> bool:
        """True when a negation cue precedes ``start`` within the same
        sentence and the last ``_NEG_WINDOW`` chars."""
        window = lower[max(0, start - _NEG_WINDOW):start]
        for b in _SENTENCE_BREAKS:
            cut = window.rfind(b)
            if cut != -1:
                window = window[cut + 1:]
        return bool(_NEGATION_RE.search(window))

    def detect_observations(self, text: str) -> set[str]:
        if not text:
            return set()
        lower = text.lower()
        found = set()
        for obs in self.vocab:
            term = obs.lower()
            if not self.negation_aware:
                if term in lower:
                    found.add(obs)
                continue
            start = 0
            while True:
                pos = lower.find(term, start)
                if pos == -1:
                    break
                if not self._negated_at(lower, pos):
                    found.add(obs)
                    break
                start = pos + len(term)
        return found

    def find_missing_observations(self, generated_text: str,
                                  reference_text: str) -> set[str]:
        return (self.detect_observations(reference_text)
                - self.detect_observations(generated_text))


class ConsistencyVerifier:
    """Jaccard agreement of detected observations across generations
    (reference ``ConsistencyVerifier`` :64-108)."""

    def __init__(self, detector: ObservationDetector | None = None,
                 threshold: float = 0.7):
        self.detector = detector or ObservationDetector()
        self.threshold = threshold

    def compute_consistency(self, generations: list[str]) -> float:
        if len(generations) < 2:
            return 1.0
        obs_sets = [self.detector.detect_observations(g)
                    for g in generations]
        union = set().union(*obs_sets)
        if not union:
            return 1.0
        inter = set(obs_sets[0])
        for s in obs_sets[1:]:
            inter &= s
        return len(inter) / len(union)

    def find_consistent_observations(self, generations: list[str]
                                     ) -> set[str]:
        """Observations present in a majority of generations."""
        if not generations:
            return set()
        counts: dict[str, int] = {}
        for g in generations:
            for obs in self.detector.detect_observations(g):
                counts[obs] = counts.get(obs, 0) + 1
        majority = len(generations) / 2
        return {obs for obs, c in counts.items() if c >= majority}


class TargetedRetriever:
    """Build retrieval queries for missing observations and rank
    retrieved passages by coverage + diversity
    (reference ``TargetedRetriever`` :110-153)."""

    def __init__(self, detector: ObservationDetector | None = None):
        self.detector = detector or ObservationDetector()

    def build_retrieval_query(self, missing: set[str]) -> str:
        if not missing:
            return ""
        return "Cases with " + ", ".join(sorted(missing))

    def rank_retrieved_passages(self, passages: list[str],
                                missing: set[str],
                                seen_passages: set[str] | None = None,
                                retrieval_scores: list[float] | None = None
                                ) -> list[str]:
        """Score = coverage of missing observations + novelty bonus
        (+ a small normalized retrieval-score term when the retriever
        supplies scores — the reference threads scores through its
        ranking the same way, ``modeling_iterative_rag.py:237-246``)."""
        seen = seen_passages or set()
        norm = [0.0] * len(passages)
        if retrieval_scores:
            lo, hi = min(retrieval_scores), max(retrieval_scores)
            span = (hi - lo) or 1.0
            norm = [0.4 * (s - lo) / span for s in retrieval_scores]
        scored = []
        for i, p in enumerate(passages):
            obs = self.detector.detect_observations(p)
            coverage = len(obs & missing)
            diversity = 0.5 if p not in seen else 0.0
            scored.append((coverage + diversity + norm[i], i, p))
        scored.sort(key=lambda t: (-t[0], t[1]))
        return [p for _, _, p in scored]
