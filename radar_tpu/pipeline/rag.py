"""Iterative retrieval-augmented generation orchestrator.

Parity with the reference's
``IterativeRetrievalAugmentedGeneration.generate_with_iterative_retrieval``
(``modeling_iterative_rag.py:188-315``): generate → detect missing
observations → targeted re-retrieval → append evidence → regenerate,
until complete/consistent or ``max_iterations``; plus
``generate_with_verification`` N-sample self-consistency.

The loop is host logic; generation/retrieval are injected callables
(the reference's dependency-injection shape, ``:198-201``), so a mock
generator, the compiled ``ReportDecoder`` (``radar_tpu.models.decoder``)
and a real retrieval index are interchangeable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from ..core.config import RAGConfig
from ..core.logging import get_logger
from .observations import (ConsistencyVerifier, ObservationDetector,
                           TargetedRetriever)

logger = get_logger("radar_tpu.rag")

RetrievalFn = Callable[[str, int], list[str]]
GenerationFn = Callable[[str], str]


@dataclass
class RetrievalState:
    """Mutable loop state (reference ``IterativeRetrieval`` :155-186)."""
    iteration: int = 0
    retrieved_passages: list[str] = field(default_factory=list)
    seen_passages: set = field(default_factory=set)
    cumulative_observations: set = field(default_factory=set)
    queries: list[str] = field(default_factory=list)

    def update(self, query: str, passages: list[str],
               observations: set[str]) -> None:
        self.iteration += 1
        self.queries.append(query)
        self.retrieved_passages.extend(passages)
        self.seen_passages.update(passages)
        self.cumulative_observations.update(observations)


class IterativeRAG:
    def __init__(self, config: RAGConfig | None = None):
        self.config = config or RAGConfig()
        self.detector = ObservationDetector()
        self.verifier = ConsistencyVerifier(
            self.detector, self.config.consistency_threshold)
        self.retriever = TargetedRetriever(self.detector)

    # ------------------------------------------------------------------
    def plan_iteration(self, generations: list[str],
                       cumulative_observations: set,
                       reference_text: str | None
                       ) -> tuple[bool, set, set]:
        """Shared per-study loop decision (used by the single-study loop
        and the batched serving path so they cannot drift).

        Returns (done, missing, detected): ``done`` when the latest
        generation is complete (no missing observations) or, without a
        reference, self-consistent across generations.
        """
        gen = generations[-1]
        detected = self.detector.detect_observations(gen)
        if reference_text:
            missing = self.detector.find_missing_observations(
                gen, reference_text)
        else:
            consistency = self.verifier.compute_consistency(generations)
            if (len(generations) >= 2
                    and consistency >= self.config.consistency_threshold):
                return True, set(), detected
            missing = cumulative_observations - detected
        if not missing:
            return True, set(), detected
        return False, missing, detected

    def generate_with_iterative_retrieval(
            self, initial_findings: str,
            retrieval_function: RetrievalFn,
            generation_function: GenerationFn,
            reference_text: str | None = None) -> dict:
        """The main loop (reference ``:198-275``).

        Without ``reference_text`` (inference), completeness is judged
        by self-consistency across successive generations; with it
        (evaluation), by missing-observation detection.
        """
        cfg = self.config
        state = RetrievalState()
        context = initial_findings
        generations: list[str] = []
        consistency = 0.0

        for iteration in range(cfg.max_iterations):
            generated = generation_function(context)
            generations.append(generated)

            done, missing, detected = self.plan_iteration(
                generations, state.cumulative_observations,
                reference_text)
            state.cumulative_observations.update(detected)
            if done:
                logger.debug("complete/consistent after %d iterations",
                             iteration + 1)
                break

            query = self.retriever.build_retrieval_query(missing)
            passages = retrieval_function(query, cfg.top_k)
            ranked = self.retriever.rank_retrieved_passages(
                passages, missing, state.seen_passages)
            state.update(query, ranked, detected)

            from .prompts import build_regeneration_prompt
            context = build_regeneration_prompt(
                generated, ranked[: cfg.evidence_passages])

        final_consistency = self.verifier.compute_consistency(generations)
        consistent = self.verifier.find_consistent_observations(generations)
        return {
            "generations": generations,
            "final_text": generations[-1] if generations else "",
            "num_iterations": len(generations),
            "consistency_score": final_consistency,
            "consistent_observations": sorted(consistent),
            "cumulative_observations": sorted(
                state.cumulative_observations),
            "retrieved_passages": state.retrieved_passages,
            "queries": state.queries,
        }

    # ------------------------------------------------------------------
    def generate_with_verification(self, initial_findings: str,
                                   retrieval_function: RetrievalFn,
                                   generation_function: GenerationFn,
                                   num_samples: int | None = None) -> dict:
        """N-sample self-consistency: run the loop N times, return the
        sample surfacing the most observations (reference ``:277-315``)."""
        n = num_samples or self.config.num_verification_samples
        samples = [
            self.generate_with_iterative_retrieval(
                initial_findings, retrieval_function, generation_function)
            for _ in range(n)
        ]
        texts = [s["final_text"] for s in samples]
        consistency = self.verifier.compute_consistency(texts)
        consistent = self.verifier.find_consistent_observations(texts)
        best = max(samples, key=lambda s: len(
            self.detector.detect_observations(s["final_text"])))
        return {
            "best_generation": best["final_text"],
            "all_generations": texts,
            "consistency_score": consistency,
            "consistent_observations": sorted(consistent),
            "num_samples": n,
        }


def create_iterative_rag_model(config: RAGConfig | None = None
                               ) -> IterativeRAG:
    """Factory (reference ``create_iterative_rag_model`` :317-320)."""
    return IterativeRAG(config)
