"""Canonical prompt formats — ONE source of truth shared by decoder LM
training and the serving pipeline, so the model is trained on exactly
the strings it will be prompted with (a format mismatch here silently
destroys generation quality)."""

from __future__ import annotations

EVIDENCE_HEADER = "Retrieved Evidence:"


def build_prompt(clinical_context: str,
                 validated_observations=None) -> str:
    """Stage-1 prompt: clinical context + expert-validated observations."""
    s = f"Clinical context: {clinical_context}"
    if validated_observations:
        s += ("\nValidated observations: "
              + ", ".join(sorted(validated_observations)))
    return s + "\nFindings:"


def build_regeneration_prompt(generated: str, evidence: list[str]) -> str:
    """RAG-iteration prompt: previous generation + targeted evidence."""
    ev = "\n".join(evidence)
    return f"{generated}\n\n{EVIDENCE_HEADER}\n{ev}"
