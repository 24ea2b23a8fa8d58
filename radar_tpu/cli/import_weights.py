"""Convert HuggingFace checkpoints into radar_tpu tower params.

Completes the pretrained-backbone story (reference downloads
SwinV2/Bio_ClinicalBERT at runtime, ``train_expert_models.py:555-561``):
point this at locally saved ``ViTModel`` / ``BertModel`` checkpoints and
get Orbax param trees our ``VisionTransformer`` / ``BertTextEncoder``
load directly.  No network access — the checkpoint must already be on
disk (``save_pretrained`` format).

Usage:
    python -m radar_tpu.cli.import_weights --vision /path/to/vit \
        --text /path/to/bert --output ./checkpoints/imported/
"""

from __future__ import annotations

import argparse
import json
import os

from ..core.checkpoint import save_params
from ..core.logging import get_logger
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.import")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Import HF tower weights into radar_tpu format")
    parser.add_argument("--vision", type=str, default=None,
                        help="Local ViTModel checkpoint directory")
    parser.add_argument("--swinv2", type=str, default=None,
                        help="Local Swinv2Model checkpoint directory "
                             "(the reference's actual vision backbone)")
    parser.add_argument("--text", type=str, default=None,
                        help="Local BertModel checkpoint directory")
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args(argv)
    if not (args.vision or args.text or args.swinv2):
        raise SystemExit("pass --vision, --swinv2 and/or --text")

    import transformers

    summary = {}
    os.makedirs(args.output, exist_ok=True)

    if args.vision:
        from ..utils.hf_import import import_vision_tower
        hf = transformers.ViTModel.from_pretrained(args.vision)
        cfg, params = import_vision_tower(hf)
        save_params(os.path.join(args.output, "vision"), params)
        cfg.to_yaml(os.path.join(args.output, "vision_config.yaml"))
        summary["vision"] = {"hidden_size": cfg.hidden_size,
                             "depth": cfg.depth,
                             "image_size": cfg.image_size}
        logger.info("imported vision tower: %s", summary["vision"])

    if args.swinv2:
        from ..utils.hf_import import import_swinv2_tower
        hf = transformers.Swinv2Model.from_pretrained(args.swinv2)
        cfg, params = import_swinv2_tower(hf)
        save_params(os.path.join(args.output, "vision"), params)
        cfg.to_yaml(os.path.join(args.output, "vision_config.yaml"))
        summary["vision"] = {"hidden_size": cfg.hidden_size,
                             "depths": list(cfg.depths),
                             "window_size": cfg.window_size,
                             "arch": "swinv2",
                             "image_size": cfg.image_size}
        logger.info("imported swinv2 tower: %s", summary["vision"])

    if args.text:
        from ..models.bert import import_text_tower
        hf = transformers.BertModel.from_pretrained(args.text)
        cfg, params = import_text_tower(hf)
        save_params(os.path.join(args.output, "text"), params)
        cfg.to_yaml(os.path.join(args.output, "text_config.yaml"))
        summary["text"] = {"hidden_size": cfg.hidden_size,
                           "depth": cfg.depth,
                           "vocab_size": cfg.vocab_size}
        logger.info("imported text tower: %s", summary["text"])

    atomic_write_json(os.path.join(args.output, "import_summary.json"), summary, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
