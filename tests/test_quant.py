"""Int8 (W8A8) serving-path tests: the dynamic-quant dot_general must
track the float path closely enough that expert predictions are
unchanged, with identical param trees (no re-export needed)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.models.experts import create_model
from radar_tpu.ops.quant import int8_dot_general


def test_int8_dot_general_matches_float():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    w = rng.normal(size=(128, 96)).astype(np.float32)
    dn = (((1,), (0,)), ((), ()))
    exact = np.asarray(jax.lax.dot_general(x, w, dn))
    quant = np.asarray(int8_dot_general(x, w, dn))
    rel = np.abs(quant - exact).max() / np.abs(exact).max()
    assert rel < 0.02, rel


def test_int8_dot_general_3d_activations():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 16, 32)).astype(np.float32)
    w = rng.normal(size=(32, 24)).astype(np.float32)
    dn = (((2,), (0,)), ((), ()))
    exact = np.asarray(jax.lax.dot_general(x, w, dn))
    quant = np.asarray(int8_dot_general(x, w, dn))
    assert quant.shape == exact.shape
    rel = np.abs(quant - exact).max() / np.abs(exact).max()
    assert rel < 0.02, rel


import pytest


@pytest.mark.parametrize("qmode", ["int8", "aqt"])
def test_quantized_expert_prediction_parity(cfg, batch, qmode):
    """Same params, quant towers on: logits stay close and the top
    observation ranking is preserved (the serving contract).  Covers
    both the hand-rolled W8A8 kernel and the AQT v2 backend."""
    float_model = create_model("baseline", cfg.vision, cfg.text,
                               cfg.expert)
    vq = dataclasses.replace(cfg.vision, quant=qmode)
    tq = dataclasses.replace(cfg.text, quant=qmode)
    quant_model = create_model("baseline", vq, tq, cfg.expert)

    params = float_model.init(jax.random.key(0), batch["pixel_values"],
                              batch["input_ids"],
                              batch["attention_mask"])["params"]
    lf = np.asarray(float_model.apply(
        {"params": params}, batch["pixel_values"], batch["input_ids"],
        batch["attention_mask"]))
    lq = np.asarray(quant_model.apply(
        {"params": params}, batch["pixel_values"], batch["input_ids"],
        batch["attention_mask"]))
    assert lq.shape == lf.shape
    denom = np.abs(lf).max() + 1e-9
    assert np.abs(lq - lf).max() / denom < 0.15
    # per-row argmax (the observation the pipeline gates hardest on)
    agree = np.mean(np.argmax(lq, -1) == np.argmax(lf, -1))
    assert agree >= 0.75, agree
