"""Synthetic MIMIC-CXR-shaped data with *learnable* structure.

Fills the role of the reference's dataset-free demo backbones
(``demo_expert_models.py:54-86``) but as a first-class fake backend:
labels, images, clinical context and report text are mutually
consistent, so training on synthetic data genuinely improves real
metrics — tests can assert learning, not just shapes.

Generation scheme (deterministic in the seed):
- labels: structured Bernoulli over the 14 observations with the
  clinical exclusivity respected ("No Finding" zeroes pathologies);
- image: each positive observation adds a fixed spatial Gaussian
  blob pattern into a noise background;
- clinical context: "Indication: … History: …" template mentioning the
  positive observation names (the reference constructs the same
  4-field context string, ``train_expert_models.py:155-161``);
- report: template findings sentences per positive observation.
"""

from __future__ import annotations

import numpy as np

from ..core import constants
from .tokenizer import Tokenizer

_CONTEXT_TMPL = ("Indication: {ind}. History: evaluation of {obs}. "
                 "Comparison: none. Technique: frontal chest radiograph.")

_FINDING_SENTENCES = {
    name: desc for name, desc in zip(constants.OBSERVATION_NAMES,
                                     constants.OBSERVATION_DESCRIPTIONS)
}


def sample_labels(rng: np.random.Generator, n: int,
                  positive_rate: float = 0.18) -> np.ndarray:
    """Structured multi-hot labels [n, 14] respecting exclusivity."""
    num = constants.NUM_OBSERVATIONS
    labels = (rng.random((n, num)) < positive_rate).astype(np.float32)
    # correlated pairs co-fire more often
    for i, j in constants.CORRELATED_PAIRS:
        both = rng.random(n) < 0.5
        labels[both, j] = np.maximum(labels[both, j], labels[both, i])
    no_finding = labels[:, :13].sum(axis=1) == 0
    labels[:, 13] = no_finding.astype(np.float32)
    labels[no_finding == 0, 13] = 0.0
    return labels


def _blob_patterns(image_size: int, num: int, seed: int = 1234
                   ) -> np.ndarray:
    """One fixed spatial pattern per observation, [num, H, W]."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    pats = np.zeros((num, image_size, image_size), np.float32)
    for k in range(num):
        cy, cx = rng.uniform(0.2, 0.8, 2) * image_size
        sig = rng.uniform(0.08, 0.2) * image_size
        pats[k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2))
    return pats


def report_text(label_row: np.ndarray) -> str:
    pos = [constants.OBSERVATION_NAMES[i]
           for i in range(len(label_row)) if label_row[i] > 0.5]
    if not pos or pos == ["No Finding"]:
        return ("No Finding. The lungs are clear. No acute "
                "cardiopulmonary process.")
    sents = [f"{name}. {_FINDING_SENTENCES[name]}." for name in pos]
    return " ".join(sents)


def context_text(label_row: np.ndarray, leak_labels: bool = True) -> str:
    """Clinical-context string for a label row.

    ``leak_labels=True`` (default) mentions the positive observation
    names in the History field — realistic for MIMIC-style indications
    but it leaks ground truth into the decoder prompt, inflating
    pipeline observation-F1 (ADVICE.md r1).  ``leak_labels=False``
    produces a generic indication for leakage-free evaluation.
    """
    if leak_labels:
        pos = [constants.OBSERVATION_NAMES[i]
               for i in range(len(label_row)) if label_row[i] > 0.5]
        obs = ", ".join(pos) if pos else "routine screening"
    else:
        obs = "acute cardiopulmonary process"
    return _CONTEXT_TMPL.format(ind="chest pain and dyspnea", obs=obs)


class SyntheticCXRDataset:
    """Finite, indexable synthetic dataset mirroring the real dataset's
    sample dict layout (pixel_values/input_ids/attention_mask/labels +
    report/context strings + image_id)."""

    def __init__(self, size: int, image_size: int = 64,
                 max_length: int = 64, seed: int = 0,
                 tokenizer: Tokenizer | None = None,
                 noise: float = 0.35, leak_labels: bool = True,
                 leak_fraction: float | None = None):
        """``leak_fraction`` (overrides ``leak_labels``): per-sample
        probability that the clinical context mentions the positive
        observation names.  Training with a mixed fraction (~0.5)
        forces the models to learn the image signal instead of copying
        labels out of the prompt (the leakage failure mode ADVICE r1
        flagged); 1.0 = always leak (MIMIC-like informative
        indications), 0.0 = leakage-free eval."""
        self.size = size
        self.image_size = image_size
        self.max_length = max_length
        self.tokenizer = tokenizer or Tokenizer.clinical_default()
        rng = np.random.default_rng(seed)
        self.labels = sample_labels(rng, size)
        self.patterns = _blob_patterns(image_size,
                                       constants.NUM_OBSERVATIONS)
        self.noise = noise
        self._img_rng_seed = seed + 7
        self.reports = [report_text(r) for r in self.labels]
        if leak_fraction is None:
            leak_fraction = 1.0 if leak_labels else 0.0
        leak = rng.random(size) < leak_fraction
        self.leak_mask = leak
        self.contexts = [context_text(r, bool(leak[i]))
                         for i, r in enumerate(self.labels)]
        ids, mask = self.tokenizer.encode_batch(self.contexts, max_length)
        self.input_ids, self.attention_mask = ids, mask
        # report tokens for image<->report contrastive objectives: the
        # report always describes the labels, while the context is
        # generic in (1 - leak_fraction) of samples — aligning image
        # embeddings to the REPORT is what teaches the image pathway
        # (round-3: leak-free contrastive/embedder fix)
        rids, rmask = self.tokenizer.encode_batch(self.reports, max_length)
        self.report_ids, self.report_mask = rids, rmask

    def __len__(self) -> int:
        return self.size

    def image(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(self._img_rng_seed + idx)
        img = rng.normal(0.5, self.noise,
                         (self.image_size, self.image_size)).astype(
            np.float32)
        sig = (self.labels[idx] @ self.patterns.reshape(
            constants.NUM_OBSERVATIONS, -1)).reshape(
            self.image_size, self.image_size)
        img = np.clip(img + sig, 0.0, 2.0)
        return np.repeat(img[..., None], 3, axis=-1)

    def get_passages(self) -> list[str]:
        return list(self.reports)

    def get_observations(self) -> np.ndarray:
        return self.labels.copy()

    def sample_meta(self, idx: int) -> dict:
        """Text/label fields without generating the image (uniform API
        with ExpertModelDataset.sample_meta)."""
        return {
            "id": f"synth_{idx:06d}",
            "report": self.reports[idx],
            "labels": self.labels[idx],
            "clinical_context": self.contexts[idx],
        }

    def __getitem__(self, idx: int) -> dict:
        return {
            "image_id": f"synth_{idx:06d}",
            "pixel_values": self.image(idx),
            "input_ids": self.input_ids[idx],
            "attention_mask": self.attention_mask[idx],
            "labels": self.labels[idx],
            "report": self.reports[idx],
            "clinical_context": self.contexts[idx],
        }

    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = True):
        """Yield dict-of-array batches (host numpy)."""
        order = np.arange(self.size)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        end = (self.size // batch_size * batch_size
               if drop_remainder else self.size)
        for start in range(0, end, batch_size):
            idx = order[start:start + batch_size]
            imgs = np.stack([self.image(i) for i in idx])
            yield {
                "pixel_values": imgs,
                "input_ids": self.input_ids[idx],
                "attention_mask": self.attention_mask[idx],
                "labels": self.labels[idx],
                "report_ids": self.report_ids[idx],
                "report_mask": self.report_mask[idx],
            }


class SyntheticLongitudinalDataset:
    """Paired prior/current studies for temporal modeling (contribution
    3.1).  The prior labels are sampled like a normal study; the
    current labels are a per-observation Markov transition (improve:
    positive resolves, worsen: new finding appears), so ground-truth
    progression classes derive exactly and the image pairs carry a
    learnable change signal (same blob patterns, independent
    acquisition noise)."""

    def __init__(self, size: int, image_size: int = 64, seed: int = 0,
                 improve_rate: float = 0.3, worsen_rate: float = 0.06,
                 noise: float = 0.35, positive_rate: float = 0.18):
        """``improve_rate``/``worsen_rate``/``positive_rate`` control
        change enrichment: at the defaults ~90% of (pair, observation)
        cells are Stable, so train/eval with raised rates for balanced
        sampling (VERDICT r2 #3)."""
        self.size = size
        self.image_size = image_size
        self.noise = noise
        rng = np.random.default_rng(seed)
        self.prior_labels = sample_labels(rng, size, positive_rate)
        cur = self.prior_labels.copy()
        improve = rng.random(cur.shape) < improve_rate
        worsen = rng.random(cur.shape) < worsen_rate
        cur = np.where((cur > 0.5) & improve, 0.0, cur)
        cur = np.where((cur < 0.5) & worsen, 1.0, cur)
        # keep "No Finding" (idx 13) consistent with the pathologies
        no_finding = cur[:, :13].sum(axis=1) == 0
        cur[:, 13] = no_finding.astype(np.float32)
        self.labels = cur.astype(np.float32)
        self.patterns = _blob_patterns(image_size,
                                       constants.NUM_OBSERVATIONS)
        self._seed = seed + 7

    def __len__(self) -> int:
        return self.size

    def _image(self, labels_row: np.ndarray, idx: int,
               salt: int) -> np.ndarray:
        rng = np.random.default_rng(self._seed + idx * 2 + salt)
        img = rng.normal(0.5, self.noise,
                         (self.image_size, self.image_size)).astype(
            np.float32)
        sig = (labels_row @ self.patterns.reshape(
            constants.NUM_OBSERVATIONS, -1)).reshape(
            self.image_size, self.image_size)
        return np.repeat(np.clip(img + sig, 0.0, 2.0)[..., None], 3, -1)

    def __getitem__(self, idx: int) -> dict:
        return {
            "pixel_values": self._image(self.labels[idx], idx, 0),
            "prior_pixel_values": self._image(self.prior_labels[idx],
                                              idx, 1),
            "labels": self.labels[idx],
            "prior_labels": self.prior_labels[idx],
        }

    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = True):
        order = np.arange(self.size)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        end = (self.size // batch_size * batch_size
               if drop_remainder else self.size)
        for start in range(0, end, batch_size):
            idx = order[start:start + batch_size]
            yield {
                "pixel_values": np.stack(
                    [self._image(self.labels[i], i, 0) for i in idx]),
                "prior_pixel_values": np.stack(
                    [self._image(self.prior_labels[i], i, 1)
                     for i in idx]),
                "labels": self.labels[idx],
                "prior_labels": self.prior_labels[idx],
            }
