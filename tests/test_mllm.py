"""Decoder (report-generation) tests — fills the reference's empty
``tests/test_mllm.py`` intent.  The key invariant: KV-cached greedy
decoding must exactly match repeated full teacher-forced forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.core.config import DecoderConfig
from radar_tpu.models.decoder import ReportDecoder, generate, lm_loss

CFG = DecoderConfig(vocab_size=128, hidden_size=64, depth=2, num_heads=4,
                    max_length=64, max_new_tokens=8, prefix_dim=32)


@pytest.fixture(scope="module")
def decoder():
    model = ReportDecoder(CFG)
    ids = jnp.zeros((2, 10), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    prefix = jnp.zeros((2, CFG.prefix_dim), jnp.float32)
    params = model.init(jax.random.key(0), ids, mask, prefix)["params"]
    return model, params


def test_teacher_forced_shapes(decoder):
    model, params = decoder
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 128, (2, 10)),
                      jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    logits = model.apply({"params": params}, ids, mask)
    assert logits.shape == (2, 10, 128)
    prefix = jnp.ones((2, 32), jnp.float32)
    logits_p = model.apply({"params": params}, ids, mask, prefix)
    assert logits_p.shape == (2, 11, 128)
    loss = lm_loss(logits, ids, mask)
    assert np.isfinite(float(loss)) and float(loss) > 0


def _greedy_reference(model, params, prompt, steps):
    """Greedy decoding via repeated FULL forward passes (no cache)."""
    ids = prompt
    for _ in range(steps):
        mask = jnp.ones_like(ids)
        logits = model.apply({"params": params}, ids, mask)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
    return ids[:, prompt.shape[1]:]


def test_kv_cache_matches_full_forward(decoder):
    model, params = decoder
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(4, 128, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    steps = 6
    ref = _greedy_reference(model, params, prompt, steps)
    out = generate(model, params, prompt, mask,
                   max_new_tokens=steps, temperature=0.0, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ragged_prompts_decode_independently(decoder):
    """A row padded to the batch max must decode as if unpadded."""
    model, params = decoder
    rng = np.random.default_rng(2)
    short = jnp.asarray(rng.integers(4, 128, (1, 4)), jnp.int32)
    steps = 5
    ref = _greedy_reference(model, params, short, steps)
    # same prompt, right-padded to length 9 inside a ragged batch
    padded = jnp.concatenate(
        [short, jnp.zeros((1, 5), jnp.int32)], axis=1)
    other = jnp.asarray(rng.integers(4, 128, (1, 9)), jnp.int32)
    batch_ids = jnp.concatenate([padded, other], axis=0)
    batch_mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0, 0],
                              [1, 1, 1, 1, 1, 1, 1, 1, 1]], jnp.int32)
    out = generate(model, params, batch_ids, batch_mask,
                   max_new_tokens=steps, temperature=0.0, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(out[0:1]), np.asarray(ref))


def test_eos_stops_generation(decoder):
    model, params = decoder
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    mask = jnp.ones((1, 3), jnp.int32)
    out = np.asarray(generate(model, params, prompt, mask,
                              max_new_tokens=8, temperature=0.0,
                              eos_id=2))
    if 2 in out[0].tolist():
        k = out[0].tolist().index(2)
        assert (out[0, k + 1:] == 0).all()


def test_prefix_conditioning_changes_output(decoder):
    model, params = decoder
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(4, 128, (1, 5)), jnp.int32)
    mask = jnp.ones((1, 5), jnp.int32)
    p1 = jnp.ones((1, 32), jnp.float32) * 2.0
    p2 = -jnp.ones((1, 32), jnp.float32) * 2.0
    o1 = model.apply({"params": params}, prompt, mask, p1)
    o2 = model.apply({"params": params}, prompt, mask, p2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_sampled_generation_runs(decoder):
    model, params = decoder
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    mask = jnp.ones((1, 3), jnp.int32)
    out = generate(model, params, prompt, mask, rng=jax.random.key(1),
                   max_new_tokens=4, temperature=1.0, eos_id=-1)
    assert out.shape == (1, 4)
    assert (np.asarray(out) >= 0).all()


def test_generate_rejects_cache_overflow(decoder):
    model, params = decoder
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        4, 128, (1, CFG.max_length)), jnp.int32)
    mask = jnp.ones_like(prompt)
    with pytest.raises(ValueError, match="max_new_tokens"):
        generate(model, params, prompt, mask, max_new_tokens=8,
                 temperature=0.0)
