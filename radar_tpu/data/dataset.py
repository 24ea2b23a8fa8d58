"""MIMIC-CXR dataset layer.

Same on-disk contract as the reference (``train_expert_models.py:68-162``):

- ``annotation.json``: ``{split: {id: {image_path, findings/report, …}}}``
  with split keys ``train``/``val``/``test`` (``valid`` aliases ``val``);
- ``clinical_context.json``: ``{study_id: {Indication, History,
  Comparison, Technique}}``;
- ``observation.json``: ``{id: [observation names]}`` from the
  CheXpert-14 vocabulary.

TPU-first: host code only decodes and stacks uint8 images; resize +
normalisation run on device as one jitted program
(``preprocess_images``), so the input pipeline feeds HBM at full
bandwidth.  Includes the truncated-JSON brace-matching recovery the
reference duplicates in three files
(``modeling_dense_passage_retrieval.py:112-152``).
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants
from ..core.logging import get_logger
from .tokenizer import Tokenizer

logger = get_logger("radar_tpu.data")

# ImageNet statistics, the convention the reference's HF processors use.
IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


def load_json_with_recovery(path: str):
    """Load JSON; on truncation, recover the longest valid prefix by
    brace matching (the reference's ``_extract_valid_json`` behavior)."""
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        content = f.read()
    try:
        return json.loads(content)
    except json.JSONDecodeError:
        logger.warning("truncated JSON in %s; recovering valid prefix",
                       path)
    depth = 0
    in_string = False
    escape = False
    last_complete = -1
    for i, ch in enumerate(content):
        if escape:
            escape = False
            continue
        if ch == "\\" and in_string:
            escape = True
            continue
        if ch == '"':
            in_string = not in_string
            continue
        if in_string:
            continue
        if ch in "{[":
            depth += 1
        elif ch in "}]":
            depth -= 1
            if depth == 0:
                last_complete = i
    if last_complete >= 0:
        return json.loads(content[: last_complete + 1])
    # salvage object prefix: cut at last complete value and close braces
    for cut in range(len(content) - 1, 0, -1):
        for closer in ("}", "]}", "}}", '"}}'):
            try:
                return json.loads(content[:cut] + closer)
            except json.JSONDecodeError:
                continue
    raise json.JSONDecodeError("unrecoverable JSON", content, 0)


@partial(jax.jit, static_argnames=("size",))
def preprocess_images(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """uint8 [B, H, W, 3] → normalised float32 [B, size, size, 3].

    Bilinear resize + scale + ImageNet normalisation, one fused XLA
    program on device (the reference does this per-sample on host via
    PIL/torchvision — ``modeling_dense_passage_retrieval.py:35-59``).
    """
    x = images.astype(jnp.float32) / 255.0
    if images.shape[1] != size or images.shape[2] != size:
        x = jax.image.resize(
            x, (images.shape[0], size, size, images.shape[3]), "bilinear")
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)
    return (x - mean) / std


def construct_clinical_context(context: dict) -> str:
    """4-field context string (reference ``:155-161``)."""
    parts = [f"{key}: {context[key]}"
             for key in ("Indication", "History", "Comparison", "Technique")
             if context.get(key)]
    return "\n".join(parts) if parts else "No clinical context available."


def labels_from_observations(observations: list[str]) -> np.ndarray:
    labels = np.zeros(constants.NUM_OBSERVATIONS, np.float32)
    for obs in observations:
        if obs in constants.OBSERVATION_NAMES:
            labels[constants.OBSERVATION_NAMES.index(obs)] = 1.0
    return labels


class ExpertModelDataset:
    """Indexable dataset over the annotation/context/observation JSONs."""

    def __init__(self, root_path: str, annotation_path: str,
                 clinical_context_path: str, observation_path: str,
                 tokenizer: Tokenizer, split: str = "train",
                 image_size: int = 224, max_text_length: int = 512):
        self.root_path = root_path
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.max_text_length = max_text_length
        annotations = load_json_with_recovery(annotation_path)
        self.clinical_contexts = load_json_with_recovery(
            clinical_context_path)
        self.observations = load_json_with_recovery(observation_path)
        split_key = "val" if split == "valid" else split
        data = annotations.get(split_key, {})
        self.samples = [
            {"id": idx, "image_path": s["image_path"],
             "report": s.get("findings") or s.get("report", ""),
             "observations": self.observations[idx]}
            for idx, s in data.items()
            if ("findings" in s or "report" in s)
            and idx in self.observations
        ]
        logger.info("loaded %d samples for split %r", len(self.samples),
                    split)

    def __len__(self):
        return len(self.samples)

    @staticmethod
    def _study_id(sample: dict) -> str:
        """Study directory from a MIMIC-style path.

        Handles both 'files/pXX/pXXXXXXXX/sYYYYYYYY/img.jpg' and
        'pXX/pXXXXXXXX/sYYYYYYYY/img.jpg' by picking the component that
        looks like a study dir ('s' + digits); falls back to the
        third component (the reference's convention,
        ``train_expert_models.py:127``) and finally the sample id.
        """
        parts = sample["image_path"].split("/")
        for p in parts[:-1]:
            if len(p) > 1 and p[0] == "s" and p[1:].isdigit():
                return p
        return parts[2] if len(parts) > 2 else sample["id"]

    def get_passages(self) -> list[str]:
        """All report passages (the reference's
        ``MIMICCXRDataLoader.get_passages``, dpr.py:154) — no image IO."""
        return [s["report"] for s in self.samples]

    def get_observations(self) -> np.ndarray:
        """[N, 14] multi-hot observation matrix (the reference's
        ``get_observations_list`` role, dpr.py:163)."""
        return np.stack([labels_from_observations(s["observations"])
                         for s in self.samples])

    def sample_meta(self, idx: int) -> dict:
        """Text/label fields WITHOUT decoding the image — use for
        retrieval-DB and LM-corpus construction over large datasets."""
        sample = self.samples[idx]
        context = self.clinical_contexts.get(self._study_id(sample), {})
        return {
            "id": sample["id"],
            "report": sample["report"],
            "labels": labels_from_observations(sample["observations"]),
            "clinical_context": construct_clinical_context(context),
        }

    def _load_image(self, rel_path: str) -> np.ndarray:
        from PIL import Image
        path = os.path.join(self.root_path, rel_path)
        with Image.open(path) as img:
            return np.asarray(img.convert("RGB"), np.uint8)

    def __getitem__(self, idx: int) -> dict:
        sample = self.samples[idx]
        study_id = self._study_id(sample)
        context = self.clinical_contexts.get(study_id, {})
        context_text = construct_clinical_context(context)
        ids, mask = self.tokenizer.encode(context_text,
                                          self.max_text_length)
        rids, rmask = self.tokenizer.encode(sample["report"],
                                            self.max_text_length)
        return {
            "id": sample["id"],
            "image": self._load_image(sample["image_path"]),
            "input_ids": ids,
            "attention_mask": mask,
            "report_ids": rids,
            "report_mask": rmask,
            "labels": labels_from_observations(sample["observations"]),
            "report": sample["report"],
            "clinical_context": context_text,
        }

    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = True):
        """Dict-of-array host batches; images raw uint8 (device
        preprocessing happens in the train step via
        ``preprocess_images``)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        end = (len(self) // batch_size * batch_size
               if drop_remainder else len(self))
        for start in range(0, end, batch_size):
            items = [self[i] for i in order[start:start + batch_size]]
            # resize raggedly-sized raw images on host only if needed
            imgs = []
            for it in items:
                im = it["image"]
                imgs.append(im)
            hw = {(i.shape[0], i.shape[1]) for i in imgs}
            if len(hw) > 1:  # ragged: fall back to PIL host resize
                from PIL import Image
                imgs = [np.asarray(
                    Image.fromarray(i).resize(
                        (self.image_size, self.image_size)), np.uint8)
                    for i in imgs]
            batch = {
                "raw_images": np.stack(imgs),
                "input_ids": np.stack([i["input_ids"] for i in items]),
                "attention_mask": np.stack(
                    [i["attention_mask"] for i in items]),
                "report_ids": np.stack([i["report_ids"] for i in items]),
                "report_mask": np.stack(
                    [i["report_mask"] for i in items]),
                "labels": np.stack([i["labels"] for i in items]),
            }
            yield batch

    def device_batch(self, batch: dict) -> dict:
        """Finish preprocessing on device: resize+normalise images."""
        out = {k: v for k, v in batch.items() if k != "raw_images"}
        out["pixel_values"] = preprocess_images(
            jnp.asarray(batch["raw_images"]), self.image_size)
        return out
