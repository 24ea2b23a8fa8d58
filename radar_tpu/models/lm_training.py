"""Report-decoder LM training (contribution 2.3's generation stage) —
*real*, unlike the reference's LSTM stand-in on random tensors
(``train_retrieval_system.py:191-200`` — SURVEY.md §0.2.3).

Teacher-forced next-token prediction on ``context [SEP] report`` token
streams, optionally conditioned on an image-embedding prefix — this is
the model the iterative-RAG loop drives at inference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import RadarConfig
from ..core.logging import get_logger
from ..core.training import make_optimizer
from ..data.tokenizer import Tokenizer
from ..utils.contention import maybe_yield
from .decoder import ReportDecoder, lm_loss

logger = get_logger("radar_tpu.lm")


def make_lm_examples(contexts: list[str], reports: list[str],
                     tokenizer: Tokenizer, max_length: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Token streams ``context [SEP] report [SEP]`` with a loss mask
    covering only the report span.

    The context is LEFT-truncated: decoder prompts end with the
    instruction-critical tail (validated-observation line + the
    "Findings:" marker), so overflow must drop the head — and serving
    (``pipeline/radar.py``) encodes prompts the same way."""
    ids_all, attn_all, loss_mask_all = [], [], []
    for ctx, rep in zip(contexts, reports):
        ctx_ids, _ = tokenizer.encode(ctx, max_length // 2,
                                      truncate="left")
        ctx_len = int((ctx_ids != 0).sum())
        rep_ids, _ = tokenizer.encode(rep, max_length - ctx_len)
        rep_ids = rep_ids[1:]  # drop the leading [CLS]
        rep_len = int((rep_ids != 0).sum())
        ids = np.zeros(max_length, np.int32)
        ids[:ctx_len] = ctx_ids[:ctx_len]
        ids[ctx_len:ctx_len + rep_len] = rep_ids[:rep_len]
        attn = np.zeros(max_length, np.int32)
        attn[:ctx_len + rep_len] = 1
        lmask = np.zeros(max_length, np.int32)
        lmask[ctx_len:ctx_len + rep_len] = 1
        ids_all.append(ids)
        attn_all.append(attn)
        loss_mask_all.append(lmask)
    return (np.stack(ids_all), np.stack(attn_all),
            np.stack(loss_mask_all))


def make_pipeline_lm_examples(metas: list[dict], tokenizer: Tokenizer,
                              max_length: int, seed: int = 0,
                              regen_fraction: float = 0.5,
                              obs_drop: float = 0.1,
                              obs_add: float = 0.1):
    """LM examples in the *serving* prompt formats (pipeline/prompts.py):

    - stage-1: ``build_prompt(context, validated_obs)`` → report, with
      validated observations taken from the ground-truth labels (what
      the expert injects at serving time), each dropped w.p.
      ``obs_drop`` and a spurious one added w.p. ``obs_add`` — the
      serving-time expert's detections are NOISY (precision/recall
      ~0.6-0.9 depending on context informativeness), and a decoder
      trained only on perfect validated lines learns to ignore them
      off-distribution (round-2 finding: leak-free pipeline obs-F1
      stuck at 0.22 while the expert gate ran at 0.6);
    - regeneration: a draft missing 1-2 observation sentences +
      ``Retrieved Evidence`` passages (one covering the missing
      observations, optionally one distractor — serving retrieval is
      noisy) → the complete report (the RAG-iteration mode).

    The TARGET stays the ground-truth report either way, so the
    decoder learns "write the validated observations, robustly".

    ``metas``: dicts with clinical_context/report/labels.
    """
    import numpy as np

    from ..core import constants
    from ..pipeline.prompts import build_prompt, build_regeneration_prompt

    from ..pipeline.observations import ObservationDetector

    det = ObservationDetector()
    rng = np.random.default_rng(seed)
    prompts, targets = [], []
    for i, m in enumerate(metas):
        obs_names = [constants.OBSERVATION_NAMES[j]
                     for j in range(len(constants.OBSERVATION_NAMES))
                     if m["labels"][j] > 0.5]
        # serving-noise-matched validated line
        noisy_obs = [o for o in obs_names if rng.random() > obs_drop]
        if rng.random() < obs_add:
            extra = constants.OBSERVATION_NAMES[
                int(rng.integers(len(constants.OBSERVATION_NAMES)))]
            if extra not in noisy_obs:
                noisy_obs.append(extra)
        regen = None
        if rng.random() < regen_fraction and len(metas) > 1:
            sents = [s for s in m["report"].split(". ") if s]
            droppable = [k for k, s in enumerate(sents)
                         if det.detect_observations(s)]
            n_drop = min(len(droppable), 1 + int(rng.random() < 0.4))
            if len(sents) > n_drop and droppable:
                drop = set(int(k) for k in rng.choice(
                    droppable, size=n_drop, replace=False))
                missing_obs = set()
                for k in drop:
                    missing_obs |= det.detect_observations(sents[k])
                draft = ". ".join(s for j, s in enumerate(sents)
                                  if j not in drop)
                cands = [j for j, other in enumerate(metas)
                         if j != i and (missing_obs
                                        & det.detect_observations(
                                            other["report"]))]
                if cands:
                    ev = [metas[int(rng.choice(cands))]["report"]]
                    if rng.random() < 0.5:
                        # distractor passage: serving retrieval often
                        # returns partially-relevant neighbours too
                        other = int(rng.integers(len(metas)))
                        if other != i:
                            ev.append(metas[other]["report"])
                    # regeneration prompts carry the validated line too
                    # (mirrors serving: the loop re-states expected
                    # observations so later decodes stay anchored to
                    # the expert stage)
                    regen = build_regeneration_prompt(draft, ev,
                                                      noisy_obs)
        prompts.append(regen if regen is not None
                       else build_prompt(m["clinical_context"],
                                         noisy_obs))
        targets.append(m["report"])
    return make_lm_examples(prompts, targets, tokenizer, max_length)


def train_decoder_lm(config: RadarConfig,
                     batches: Callable[[], Iterable[dict]],
                     num_epochs: int | None = None, seed: int = 0,
                     steps_per_epoch: int | None = None):
    """Train the ReportDecoder. ``batches()`` yields dicts with
    input_ids/attention_mask/loss_mask (+ optional prefix_embedding).
    Returns (module, params, history)."""
    module = ReportDecoder(config.decoder)
    sample = next(iter(batches()))
    prefix = sample.get("prefix_embedding")
    if prefix is None:
        prefix = jnp.zeros((sample["input_ids"].shape[0],
                            config.decoder.prefix_dim), jnp.float32)
    params = module.init(jax.random.key(seed),
                         jnp.asarray(sample["input_ids"]),
                         jnp.asarray(sample["attention_mask"]),
                         jnp.asarray(prefix))["params"]
    epochs = num_epochs or config.train.num_epochs
    # real steps/epoch + the ACTUAL epoch count so the cosine schedule
    # spans the run (the default 100 x config-epochs let long
    # --lm_epochs runs spend most of their steps at lr~0: round-3 chain
    # log showed decoder loss frozen at 0.3411 from epoch 2 of 12);
    # callers that know the dataset length pass it — the counting
    # fallback walks a full extra epoch of the generator
    if steps_per_epoch is None:
        steps_per_epoch = sum(1 for _ in batches())
    tx = make_optimizer(dataclasses.replace(config.train,
                                            num_epochs=epochs),
                        steps_per_epoch=steps_per_epoch)
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        pe = batch.get("prefix_embedding")
        logits = module.apply({"params": params}, batch["input_ids"],
                              batch["attention_mask"], pe)
        if pe is not None:
            logits = logits[:, 1:]  # drop the prefix position
        return lm_loss(logits, batch["input_ids"], batch["loss_mask"])

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    history = []
    for epoch in range(epochs):
        maybe_yield()
        losses = []
        for batch in batches():
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "perplexity": float(np.exp(np.mean(losses)))})
        logger.info("decoder epoch %d: loss %.4f ppl %.1f", epoch,
                    history[-1]["loss"], history[-1]["perplexity"])
    return module, params, history
