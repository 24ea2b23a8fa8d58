"""Host-side observation detection and consistency verification for the
iterative RAG loop (reference ``modeling_iterative_rag.py:23-108``).

String-space logic stays on the host by design (SURVEY.md §7.4.3): the
detector's substring matching over a 14-term clinical vocabulary is not
tensor work; jitting it would force tokenised fixed-shape gymnastics for
zero FLOPs.
"""

from __future__ import annotations

from ..core import constants


class ObservationDetector:
    """Substring-matching detector over the clinical vocabulary."""

    def __init__(self, vocab: tuple[str, ...] | None = None):
        self.vocab = tuple(vocab or constants.RAG_OBSERVATION_VOCAB)

    def detect_observations(self, text: str) -> set[str]:
        if not text:
            return set()
        lower = text.lower()
        return {obs for obs in self.vocab if obs.lower() in lower}

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
                                seen_passages: set[str] | None = None
                                ) -> list[str]:
        """Score = coverage of missing observations + novelty bonus."""
        seen = seen_passages or set()
        scored = []
        for p in passages:
            obs = self.detector.detect_observations(p)
            coverage = len(obs & missing)
            diversity = 0.5 if p not in seen else 0.0
            scored.append((coverage + diversity, p))
        scored.sort(key=lambda t: -t[0])
        return [p for _, p in scored]
