"""Shared CLI plumbing: argument groups, dataset construction
(synthetic or real-JSON), mesh setup."""

from __future__ import annotations

import argparse
import os

from ..core.config import MeshConfig, RadarConfig
from ..core.logging import get_logger
from ..core.mesh import build_mesh
from ..data.dataset import ExpertModelDataset
from ..data.synthetic import SyntheticCXRDataset
from ..data.tokenizer import Tokenizer

logger = get_logger("radar_tpu.cli")


def add_data_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--image_path", type=str,
                        default="./data/mimic_cxr/images/",
                        help="Root path for images")
    parser.add_argument("--annotation_path", type=str,
                        default="./data/mimic_cxr/annotation.json")
    parser.add_argument("--clinical_context_path", type=str,
                        default="./data/mimic_cxr/clinical_context.json")
    parser.add_argument("--observation_path", type=str,
                        default="./data/mimic_cxr/observation.json")
    parser.add_argument("--synthetic", action="store_true",
                        help="Use the synthetic dataset (no files needed)")
    parser.add_argument("--synthetic_size", type=int, default=256)
    parser.add_argument("--synthetic_noise", type=float, default=None,
                        help="Override the synthetic image noise sigma "
                             "(default 0.35) — distribution-shift eval")
    parser.add_argument("--synthetic_shift_seed", type=int, default=0,
                        help="Offset the synthetic generator seed "
                             "family (held-out distribution eval)")
    parser.add_argument("--context_leak_fraction", type=float,
                        default=1.0,
                        help="Fraction of synthetic samples whose "
                             "clinical context names the positive "
                             "observations (train with ~0.5 to stop "
                             "the models copying labels from prompts)")


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config (configs/radar.yaml schema)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="Tensor-parallel axis size")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true",
                        help="Tiny model config (CPU-friendly)")
    parser.add_argument("--set", action="append", default=[],
                        dest="config_overrides", metavar="KEY=VALUE",
                        help="Dotted config override, e.g. "
                             "--set retrieval.capacity=8192 (repeatable)")
    parser.add_argument("--hf_tokenizer", type=str, default=None,
                        help="Local HuggingFace tokenizer directory "
                             "(production wordpiece vocab, e.g. "
                             "Bio_ClinicalBERT's); default is the "
                             "self-contained clinical word tokenizer")


def _parse_override_value(raw: str):
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            pass
    return raw


def load_config(args) -> RadarConfig:
    from ..core.config import tiny_config
    if args.config:
        cfg = RadarConfig.from_yaml(args.config)
    elif getattr(args, "tiny", False):
        cfg = tiny_config()
    else:
        cfg = RadarConfig()
    overrides = {}
    if getattr(args, "batch_size", None):
        overrides["train.batch_size"] = args.batch_size
    if getattr(args, "epochs", None):
        overrides["train.num_epochs"] = args.epochs
    if getattr(args, "learning_rate", None):
        overrides["train.learning_rate"] = args.learning_rate
    if getattr(args, "pretrain_epochs", None) and getattr(
            args, "pretrain", False):
        overrides["train.pretrain_epochs"] = args.pretrain_epochs
    if getattr(args, "seed", None) is not None:
        overrides["train.seed"] = args.seed
    for kv in getattr(args, "config_overrides", None) or []:
        key, sep, raw = kv.partition("=")
        if not sep:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        overrides[key] = _parse_override_value(raw)
    if overrides:
        cfg = cfg.override(**overrides)
    if getattr(args, "pretrain", None) is False:
        cfg = cfg.override(**{"train.pretrain_epochs": 0})
    return cfg


def make_tokenizer(args, cfg: RadarConfig):
    """The CLI tokenizer: an HF wordpiece tokenizer from a local
    directory when ``--hf_tokenizer`` is given (real-data deployments —
    its vocab size must match ``cfg.text.vocab_size``), otherwise the
    self-contained clinical word tokenizer."""
    if getattr(args, "hf_tokenizer", None):
        import transformers

        from ..data.tokenizer import HFTokenizerAdapter
        tok = HFTokenizerAdapter(transformers.AutoTokenizer.from_pretrained(
            args.hf_tokenizer))
        if tok.vocab_size != cfg.text.vocab_size:
            logger.warning(
                "hf tokenizer vocab %d != text.vocab_size %d — override "
                "with --set text.vocab_size=%d (and decoder.vocab_size "
                "if the decoder shares the vocabulary)",
                tok.vocab_size, cfg.text.vocab_size, tok.vocab_size)
        return tok
    return Tokenizer.clinical_default(cfg.text.vocab_size)


def make_mesh(args, batch_size: int | None = None):
    """Build the CLI mesh; the data axis is clamped to a divisor of the
    batch size so small-batch runs still shard cleanly."""
    import math

    import jax
    n = len(jax.devices())
    model = max(1, args.mesh_model)
    data = n // model
    if batch_size:
        data = math.gcd(batch_size, data)
    if data * model < n:
        logger.info("using %d of %d devices (mesh %dx%d for batch %s)",
                    data * model, n, data, model, batch_size)
    return build_mesh(MeshConfig(data=data, model=model))


def build_datasets(args, cfg: RadarConfig, tokenizer: Tokenizer,
                   splits=("train", "val")) -> dict:
    """Returns {split: dataset}. Synthetic datasets mirror the real
    dataset's batch contract (pixel_values pre-normalised)."""
    out = {}
    if args.synthetic or not os.path.exists(args.annotation_path):
        if not args.synthetic:
            logger.warning("annotation file %s not found; falling back "
                           "to synthetic data", args.annotation_path)
        sizes = {"train": args.synthetic_size,
                 "val": max(32, args.synthetic_size // 4),
                 "test": max(32, args.synthetic_size // 4)}
        leak = getattr(args, "context_leak_fraction", 1.0)
        noise = getattr(args, "synthetic_noise", None)
        # scale the shift far past any per-index seed the base splits
        # use (label seed 100+i, per-image noise seeds seed+7+idx):
        # an additive offset < dataset size would REUSE training noise
        # draws and base split label seeds — not a held-out family
        shift = (getattr(args, "synthetic_shift_seed", 0) or 0) * 100_000
        for i, split in enumerate(splits):
            kw = {} if noise is None else {"noise": noise}
            out[split] = SyntheticCXRDataset(
                sizes.get(split, 64), cfg.vision.image_size,
                cfg.text.max_length, seed=100 + i + shift,
                tokenizer=tokenizer, leak_fraction=leak, **kw)
    else:
        for split in splits:
            out[split] = ExpertModelDataset(
                args.image_path, args.annotation_path,
                args.clinical_context_path, args.observation_path,
                tokenizer, split=split,
                image_size=cfg.vision.image_size,
                max_text_length=cfg.text.max_length)
    return out


def batch_iterator_factory(dataset, batch_size: int, *, shuffle=False,
                           seed=0):
    """Callable returning a fresh epoch iterator, with device-side
    image preprocessing for real datasets."""
    is_real = isinstance(dataset, ExpertModelDataset)

    def factory(epoch_seed=None):
        s = seed if epoch_seed is None else epoch_seed
        for batch in dataset.batches(batch_size, shuffle=shuffle, seed=s):
            if is_real:
                batch = dataset.device_batch(batch)
            yield batch
    return factory


def steps_per_epoch(dataset, batch_size: int) -> int:
    return max(1, len(dataset) // batch_size)


def apply_embedder_meta(cfg, checkpoint_dir: str):
    """Rebuild-compatibility shim: if ``checkpoint_dir`` carries an
    ``embedder_meta.json`` (written by train_retrieval_system since
    round 5), override the retrieval-config fields that change the
    embedder's PARAM TREE (obs_head) so restore sites reconstruct the
    module the checkpoint was trained with — without every eval/serve
    caller having to repeat ``--set retrieval.obs_head=true``."""
    import dataclasses
    import json as _json
    import os as _os
    meta_path = _os.path.join(checkpoint_dir, "embedder_meta.json")
    try:
        with open(meta_path) as f:
            meta = _json.load(f)
    except (OSError, ValueError):
        return cfg
    obs_head = bool(meta.get("obs_head", False))
    if obs_head == cfg.retrieval.obs_head:
        return cfg
    return dataclasses.replace(
        cfg, retrieval=dataclasses.replace(cfg.retrieval,
                                           obs_head=obs_head))
