"""Typed configuration system.

One dataclass per subsystem, a top-level ``RadarConfig`` aggregating
them, YAML load/save, and dotted-path overrides.  Replaces the
reference's per-script argparse sprawl and its empty ``configs/*.yaml``
(reference ``configs/{radar,knowledge,expert_model}.yaml`` are 0 bytes;
see SURVEY.md §0.2.4) with one config surface driving every entry point.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any

import yaml


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML scalar/maps into the declared dataclass field type."""
    if is_dataclass(typ) and isinstance(value, dict):
        return _from_dict(typ, value)
    origin = getattr(typ, "__origin__", None)
    if origin is tuple and isinstance(value, (list, tuple)):
        args = typ.__args__
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(_coerce(v, args[0]) for v in value)
        return tuple(_coerce(v, t) for v, t in zip(value, args))
    if typ in (int, float, str, bool) and value is not None:
        return typ(value)
    return value


def _from_dict(cls: type, data: dict) -> Any:
    kwargs = {}
    names = {f.name: f for f in fields(cls)}
    for key, value in data.items():
        if key not in names:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}; "
                           f"valid keys: {sorted(names)}")
        kwargs[key] = _coerce(value, names[key].type_resolved
                              if hasattr(names[key], "type_resolved")
                              else _resolve_type(cls, names[key]))
    return cls(**kwargs)


def _resolve_type(cls: type, f: dataclasses.Field) -> Any:
    # dataclass field types may be strings under `from __future__ import
    # annotations`; resolve them against the defining module.
    typ = f.type
    if isinstance(typ, str):
        import sys
        mod = sys.modules[cls.__module__]
        typ = eval(typ, vars(mod))  # noqa: S307 - trusted, our own modules
    return typ


def _to_dict(obj: Any) -> Any:
    if is_dataclass(obj):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    return obj


class ConfigBase:
    """Mixin: YAML round-trip + dotted overrides for config dataclasses."""

    @classmethod
    def from_dict(cls, data: dict) -> "ConfigBase":
        return _from_dict(cls, data or {})

    @classmethod
    def from_yaml(cls, path: str) -> "ConfigBase":
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    def to_dict(self) -> dict:
        return _to_dict(self)

    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    def override(self, **dotted: Any) -> "ConfigBase":
        """Return a copy with dotted-path overrides applied.

        ``cfg.override(**{"vision.depth": 4, "train.lr": 3e-4})``
        (dots may be written as ``__`` for kwargs-friendliness).
        """
        data = self.to_dict()
        for key, value in dotted.items():
            parts = key.replace("__", ".").split(".")
            node = data
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"unknown config path {key!r}")
            node[parts[-1]] = value
        return type(self).from_dict(data)


@dataclass(frozen=True)
class VisionConfig(ConfigBase):
    """Vision encoder: plain ViT (TPU-native default) or hierarchical
    SwinV2 (``arch="swinv2"`` — the reference's actual backbone,
    ``train_expert_models.py:555``; HF-importable)."""
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768   # ViT width / SwinV2 embed_dim
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    drop_path_rate: float = 0.0
    pool: str = "cls"  # "cls" | "mean"
    channels: int = 3
    arch: str = "vit"  # "vit" | "swinv2"
    quant: str = "none"  # "none" | "int8" (W8A8 serving, ops/quant.py)
    # pad the token sequence up to this length with masked tokens
    # (0 = off).  ViT-B/16 at 224px gives S=197 — a poor MXU lane count
    # (pads to 256 inside every attention matmul tile with 23% waste);
    # explicit padding to 256 with a fused key mask reclaims it while
    # keeping outputs exact (padded rows never pool).
    seq_pad_to: int = 0
    # fuse the three E->E Q/K/V projections of every self-attention
    # into one E->3E GEMM (round-5 MFU lever: one big MXU matmul with
    # a single weight load instead of three).  Changes the param tree
    # ("qkv" replaces "q"/"k"/"v"), so it is opt-in and OFF for any
    # checkpoint-compatible path.
    fused_qkv: bool = False
    # swinv2-only: per-stage depths/heads + attention window
    depths: tuple[int, ...] = (2, 2, 6, 2)
    stage_heads: tuple[int, ...] = ()   # () -> num_heads * 2**stage
    window_size: int = 8


@dataclass(frozen=True)
class TextConfig(ConfigBase):
    """BERT-class clinical text encoder (the reference's
    Bio_ClinicalBERT role, ``train_expert_models.py:556``)."""
    vocab_size: int = 8192
    max_length: int = 512
    hidden_size: int = 768
    depth: int = 6
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    arch: str = "preln"  # "preln" (TPU-native) | "bert" (HF-importable)
    quant: str = "none"  # "none" | "int8" (W8A8 serving, ops/quant.py)
    fused_qkv: bool = False  # one E->3E QKV GEMM (see VisionConfig)


@dataclass(frozen=True)
class ExpertConfig(ConfigBase):
    """Shared expert-head configuration (all four variants)."""
    num_observations: int = 14
    hidden_size: int = 512
    dropout_rate: float = 0.3
    # uncertainty variant (reference modeling_expert_model_uncertainty.py)
    mc_samples: int = 10
    init_temperature: float = 1.5
    confidence_threshold: float = 0.5
    # gnn variant (reference modeling_expert_model_gnn.py)
    gat_heads: int = 4
    gat_hidden: int = 256
    gat_layers: int = 2
    gat_dropout: float = 0.1   # attention dropout (0.3 is too noisy on
                               # a 14-node graph; measured in training)
    loss_bce_weight: float = 1.0
    loss_consistency_weight: float = 0.1
    loss_correlation_weight: float = 0.05
    # contrastive variant (reference modeling_expert_model_contrastive.py)
    projection_dim: int = 256
    contrastive_init_logit_scale: float = 2.6592  # ln(1/0.07)
    hard_negative_low: float = 0.3
    hard_negative_high: float = 1.0
    hard_negative_margin: float = 0.5


@dataclass(frozen=True)
class RetrievalConfig(ConfigBase):
    """Cross-modal dense retrieval (reference
    ``modeling_dense_passage_retrieval.py:183-188``), rebuilt as an
    on-device sharded top-k index."""
    embedding_dim: int = 512
    top_k: int = 5
    hybrid_alpha: float = 0.5     # semantic vs observation-overlap mix
    capacity: int = 65536         # padded index capacity (static shape)
    shard_axis: str = "data"
    query_batch: int = 64
    max_passage_tokens: int = 128
    #: embedder training objective: "diagonal" (own-pair InfoNCE),
    #: "multipos" (positives = label-Jaccard>=0.5 pairs, mirroring the
    #: eval relevance definition), or "blend" (multipos with the own
    #: pair up-weighted ``blend_self_weight``x).  CPU pilot, 16 epochs
    #: at 4096-passage scale (Jaccard>=0.5 relevance): diagonal 0.914
    #: image MRR vs blend 0.859 vs multipos 0.60 — the instance-level
    #: pairing signal beats relevance-matched soft targets once the
    #: schedule lets training run to convergence.  "exact" (round-5)
    #: keeps the diagonal base but masks in-batch exact-label-set
    #: duplicates out of the denominators and adds an own-pair ranking
    #: hinge on near-miss label sets — targets the EXACT-set relevance
    #: headline (models/losses.exact_ranking_infonce).
    objective: str = "diagonal"
    blend_self_weight: float = 4.0
    #: round-5: give the embedder an image->observation head (BCE-
    #: trained alongside the contrastive objective) and score image
    #: queries with the index's hybrid semantic+observation rule.
    #: Exact-set relevance needs all 13 pathology bits right — a job
    #: for a classifier, not a metric space: the pure-semantic image
    #: query tops out ~0.69 exact-set MRR while label information is
    #: demonstrably recoverable from the image (experts hit 0.95
    #: macro-F1 on the same pixels).  Param-gated so pre-round-5
    #: checkpoints (no head) keep restoring.
    obs_head: bool = False
    #: weight of the BCE observation loss in embedder training
    obs_head_weight: float = 1.0


@dataclass(frozen=True)
class FusionConfig(ConfigBase):
    """PF<->SF knowledge fusion (reference
    ``modeling_knowledge_fusion.py:12-22``)."""
    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 2
    dropout_rate: float = 0.1
    conflict_threshold: float = 0.5
    image_modulation_scale: float = 0.1
    max_findings_len: int = 64


@dataclass(frozen=True)
class DecoderConfig(ConfigBase):
    """Report-generation decoder (net-new vs the reference, which
    injects an external MLLM callable — ``modeling_iterative_rag.py:198``)."""
    vocab_size: int = 8192
    hidden_size: int = 512
    depth: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    max_length: int = 512
    max_new_tokens: int = 100
    prefix_dim: int = 512   # dim of the conditioning (image) embedding


@dataclass(frozen=True)
class RAGConfig(ConfigBase):
    """Iterative RAG loop (reference ``modeling_iterative_rag.py:12-20``)."""
    max_iterations: int = 3
    top_k: int = 5
    consistency_threshold: float = 0.7
    max_new_tokens: int = 100
    num_verification_samples: int = 3
    evidence_passages: int = 2    # passages appended to context per iter
    # image-neighbour corroboration (round-3): observations voted by
    # >= min_votes of the top_m visually-nearest indexed reports, with
    # expert prob in (prob_floor, threshold], join the loop's expected
    # set. 0 disables.  Defaults precision-tuned by
    # scripts/corroborate_sweep.py (leak-free, gnn expert, 128
    # studies): 10/6/0.35 gives candidate precision 0.83 vs 0.33 at
    # the old 5/3/0.15 — the loop only adds what it can defend, so it
    # beats single-pass on micro-F1 without inflating hallucination
    # (loop 0.827 vs single-pass 0.818, halluc flat).
    corroborate_top_m: int = 10
    corroborate_min_votes: int = 6
    corroborate_prob_floor: float = 0.35
    # cross-modal veto (round-3, VERDICT r2 #4): an expert-positive
    # observation (prob > threshold) only enters the prompt/expected
    # set if the expert is strongly confident (prob > veto_prob) OR at
    # least veto_min_votes of the veto_top_m visually-nearest indexed
    # reports carry it.  Rule first chosen by offline sweep on 256
    # leak-free studies (0.6/7: mention precision 0.859 -> 0.924 at
    # recall 0.924 -> 0.849); round-3 48-study CPU pilots then showed
    # 0.7/6 at-or-better on every pipeline metric in all four modes
    # (informative halluc 0.040 -> 0.030, BLEU-4 +0.002, micro-F1
    # +0.004; leak-free equal F1, +0.003 BLEU).  veto_top_m=0
    # disables; the veto also auto-disables when the index was built
    # without observation labels.
    veto_top_m: int = 10
    veto_min_votes: int = 6
    veto_prob: float = 0.7
    # mention-level veto (grounding pass): the SAME cross-modal rule,
    # pointed at the final report's mentions — a mention survives only
    # if prob > veto_mention_prob or votes >= veto_mention_votes.
    # Stricter than the decision veto because a scrubbed FP mention is
    # pure win (the sentence is removed) while a vetoed decision only
    # shrinks the prompt set.  48-study leak-free CPU pilot: 0.7/6
    # beats 0.6/7 on every metric (halluc 0.077 vs 0.088, BLEU-4 0.326
    # vs 0.314, micro-F1 0.795 vs 0.782).
    # a mention survives if prob > veto_mention_prob, or if votes >=
    # veto_mention_votes AND prob > veto_mention_floor: neighbour votes
    # are an image-similarity prior, so they may rescue a mention the
    # expert is lukewarm on but must not override one the expert
    # refutes (round-3 split-half validation: the floor cuts held-out
    # mention halluc 0.105 -> 0.083 at -2% true mentions; the
    # floor-less rule let corroboration-channel FPs with p~0.25 and
    # 9-10 votes survive into the final text).
    veto_mention_prob: float = 0.7
    veto_mention_votes: int = 6
    veto_mention_floor: float = 0.4


@dataclass(frozen=True)
class MeshConfig(ConfigBase):
    """Device mesh layout. data*model must divide the device count."""
    data: int = -1   # -1: infer (all remaining devices)
    model: int = 1
    allow_smaller: bool = True


@dataclass(frozen=True)
class TrainConfig(ConfigBase):
    batch_size: int = 32
    eval_batch_size: int = 64
    num_epochs: int = 10
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    schedule: str = "cosine"        # "cosine" | "constant"
    grad_clip_norm: float = 1.0
    nan_guard: bool = True   # drop non-finite updates on-device
    seed: int = 0
    compute_dtype: str = "bfloat16"  # dtype of activations / matmuls
    remat: bool = False              # jax.checkpoint the encoder blocks
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    log_every: int = 50
    # contrastive two-phase schedule
    pretrain_epochs: int = 5
    pretrain_learning_rate: float = 1e-4


@dataclass(frozen=True)
class DataConfig(ConfigBase):
    data_dir: str = "data"
    annotation_file: str = "annotation.json"
    clinical_context_file: str = "clinical_context.json"
    observation_file: str = "observation.json"
    splits_file: str = "splits.json"
    num_workers: int = 4
    synthetic: bool = False
    synthetic_size: int = 512


@dataclass(frozen=True)
class RadarConfig(ConfigBase):
    """Top-level config aggregating every subsystem."""
    vision: VisionConfig = field(default_factory=VisionConfig)
    text: TextConfig = field(default_factory=TextConfig)
    expert: ExpertConfig = field(default_factory=ExpertConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    rag: RAGConfig = field(default_factory=RAGConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)


def serving_config() -> RadarConfig:
    """Inference-optimised expert preset: ViT-B/32 vision tower (full
    768 width, 4x fewer tokens than /16) + 4-layer/512 clinical-text
    tower.  Measured 5.3k CXR images/sec/chip on TPU v5e at batch 512
    (the BASELINE.json north star is 5k) — clinical context strings are
    short, so the shallower text tower loses little.
    """
    return RadarConfig.from_dict({
        "vision": {"patch_size": 32},
        "text": {"depth": 4, "hidden_size": 512, "num_heads": 8},
        # fusion consumes the text tower's token features; dims must match
        "fusion": {"hidden_size": 512, "num_heads": 8},
        "train": {"eval_batch_size": 512},
    })


def tiny_config() -> RadarConfig:
    """A CPU-friendly config for tests and the dataset-free demo."""
    return RadarConfig.from_dict({
        "vision": {"image_size": 64, "patch_size": 16, "hidden_size": 128,
                   "depth": 2, "num_heads": 4},
        "text": {"vocab_size": 512, "max_length": 64, "hidden_size": 128,
                 "depth": 2, "num_heads": 4},
        "expert": {"hidden_size": 128, "gat_hidden": 64, "mc_samples": 5,
                   "projection_dim": 64},
        "retrieval": {"embedding_dim": 64, "capacity": 256},
        "fusion": {"hidden_size": 128, "num_heads": 4, "num_layers": 2,
                   "max_findings_len": 16},
        "decoder": {"vocab_size": 512, "hidden_size": 128, "depth": 2,
                    "num_heads": 4, "max_length": 128, "max_new_tokens": 16,
                    "prefix_dim": 64},
        "train": {"batch_size": 8, "eval_batch_size": 8, "warmup_steps": 2,
                  "compute_dtype": "float32"},
        "data": {"synthetic": True, "synthetic_size": 32},
    })
