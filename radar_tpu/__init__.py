"""radar_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the RADAR multimodal-radiology reference.

Public surface (lazily imported to keep `import radar_tpu` light):

    from radar_tpu import RadarConfig, tiny_config, serving_config
    from radar_tpu import create_model, RadarPipeline, create_dpr_model
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("RADAR_PLATFORM"):
    # Force a JAX platform at import (e.g. RADAR_PLATFORM=cpu to run
    # CLIs on the host while the TPU is busy, or under the axon relay
    # where the JAX_PLATFORMS env var is overridden by sitecustomize —
    # see .claude/skills/verify/SKILL.md).
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["RADAR_PLATFORM"])

_EXPORTS = {
    "RadarConfig": "radar_tpu.core.config",
    "tiny_config": "radar_tpu.core.config",
    "serving_config": "radar_tpu.core.config",
    "build_mesh": "radar_tpu.core.mesh",
    "create_model": "radar_tpu.models.experts",
    "ReportDecoder": "radar_tpu.models.decoder",
    "generate": "radar_tpu.models.decoder",
    "AttentionKnowledgeFusion": "radar_tpu.fusion.fusion",
    "create_dpr_model": "radar_tpu.retrieval.dpr",
    "ShardedIndex": "radar_tpu.retrieval.index",
    "IterativeRAG": "radar_tpu.pipeline.rag",
    "RadarPipeline": "radar_tpu.pipeline.radar",
    "Tokenizer": "radar_tpu.data.tokenizer",
    "SyntheticCXRDataset": "radar_tpu.data.synthetic",
    "ExpertModelDataset": "radar_tpu.data.dataset",
    "ExpertTrainer": "radar_tpu.core.trainer",
    # contributions 3.1-3.3 (planned-but-unshipped in the reference)
    "TemporalComparator": "radar_tpu.models.temporal",
    "MultiTaskExpert": "radar_tpu.models.multitask",
    "GroundingVerifier": "radar_tpu.pipeline.grounding",
    "SyntheticLongitudinalDataset": "radar_tpu.data.synthetic",
    # production serving frontend (net-new vs the reference, which has
    # no serving layer at all — SURVEY.md §0.1)
    "RadarServer": "radar_tpu.serving.server",
    "ServerConfig": "radar_tpu.serving.server",
    "RadarHTTPServer": "radar_tpu.serving.http",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'radar_tpu' has no attribute {name!r}")
