"""Unit tests for the four expert variants — fills the reference's empty
``tests/test_expert_model.py`` intent (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.core import constants
from radar_tpu.core.config import ExpertConfig
from radar_tpu.core.training import (baseline_loss_fn, create_train_state,
                                     gnn_loss_fn, make_eval_step,
                                     make_train_step)
from radar_tpu.models import losses as L
from radar_tpu.models.experts import (EXPERT_REGISTRY, count_params,
                                      create_model)
from radar_tpu.models.uncertainty import (calibrate_temperature,
                                          fit_thresholds,
                                          mc_dropout_predict)


def _model(cfg, kind):
    return create_model(kind, cfg.vision, cfg.text, cfg.expert)


@pytest.mark.parametrize("kind", sorted(EXPERT_REGISTRY))
def test_forward_shapes(cfg, batch, kind):
    model = _model(cfg, kind)
    params = model.init(jax.random.key(0), batch["pixel_values"],
                        batch["input_ids"], batch["attention_mask"])["params"]
    logits = model.apply({"params": params}, batch["pixel_values"],
                         batch["input_ids"], batch["attention_mask"])
    assert logits.shape == (batch["labels"].shape[0],
                            constants.NUM_OBSERVATIONS)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()
    assert count_params(params) > 0


@pytest.mark.parametrize("kind", ["baseline", "gnn"])
def test_one_train_step_reduces_loss(cfg, batch, kind):
    model = _model(cfg, kind)
    state = create_train_state(model, jax.random.key(0), batch, cfg.train)
    loss_fn = (baseline_loss_fn if kind == "baseline"
               else gnn_loss_fn(cfg.expert))
    step = make_train_step(model, loss_fn)
    rng = jax.random.key(1)
    _, m0 = step(state, batch, rng)
    state = create_train_state(model, jax.random.key(0), batch, cfg.train)
    losses = []
    for _ in range(8):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(float(m0["grad_norm"]))


def test_mc_dropout_uncertainty(cfg, batch):
    model = _model(cfg, "uncertainty")
    params = model.init(jax.random.key(0), batch["pixel_values"],
                        batch["input_ids"], batch["attention_mask"])["params"]
    out = mc_dropout_predict(model, params, batch["pixel_values"],
                             batch["input_ids"], batch["attention_mask"],
                             jax.random.key(7), num_samples=5)
    b = batch["labels"].shape[0]
    n = constants.NUM_OBSERVATIONS
    assert out["mean_probs"].shape == (b, n)
    assert out["std_probs"].shape == (b, n)
    assert float(out["std_probs"].max()) > 0.0   # dropout actually varies
    assert (out["mean_probs"].min() >= 0) and (out["mean_probs"].max() <= 1)
    # determinism in the rng
    out2 = mc_dropout_predict(model, params, batch["pixel_values"],
                              batch["input_ids"], batch["attention_mask"],
                              jax.random.key(7), num_samples=5)
    np.testing.assert_allclose(out["mean_probs"], out2["mean_probs"],
                               rtol=1e-5)


def test_temperature_calibration_reduces_nll():
    rng = np.random.default_rng(0)
    # true log-odds are mild; labels drawn from them; logits 5x sharper
    z = rng.normal(0, 1.0, (256, 14))
    labels = (rng.random(z.shape) < 1 / (1 + np.exp(-z))).astype(np.float32)
    logits = jnp.asarray(5.0 * z, jnp.float32)
    t = calibrate_temperature(logits, jnp.asarray(labels), 1.5)
    assert float(t) > 1.0     # must soften overconfident logits
    import optax
    nll_before = float(jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits, labels)))
    nll_after = float(jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits / t, labels)))
    assert nll_after < nll_before


def test_fit_thresholds_beats_default():
    rng = np.random.default_rng(1)
    labels = (rng.random((512, 14)) < 0.2).astype(np.float32)
    # probabilities informative but mis-centred around 0.3
    probs = np.clip(labels * 0.4 + rng.random(labels.shape) * 0.3, 0, 1)
    ts = fit_thresholds(jnp.asarray(probs), jnp.asarray(labels))
    assert ts.shape == (14,)
    from radar_tpu.eval.metrics import f1_scores
    f1_tuned = float(f1_scores((jnp.asarray(probs) > ts).astype(jnp.float32),
                               jnp.asarray(labels))["macro_f1"])
    f1_default = float(f1_scores((jnp.asarray(probs) > 0.5).astype(
        jnp.float32), jnp.asarray(labels))["macro_f1"])
    assert f1_tuned >= f1_default


def test_gnn_losses_behave():
    # consistency: worst case is No Finding AND pathologies all positive
    bad = jnp.full((4, 14), 8.0)     # all observations confidently positive
    good = jnp.full((4, 14), -8.0).at[:, 13].set(8.0)  # only No Finding
    assert float(L.consistency_loss(bad)) > float(L.consistency_loss(good))
    # correlation loss: disagreement between correlated pairs is penalised
    disagree = jnp.zeros((4, 14)).at[:, 0].set(8.0).at[:, 1].set(-8.0)
    agree = jnp.zeros((4, 14)).at[:, 0].set(8.0).at[:, 1].set(8.0)
    assert float(L.correlation_loss(disagree)) > float(
        L.correlation_loss(agree))


def test_contrastive_loss_prefers_aligned_embeddings(cfg):
    k = jax.random.key(0)
    emb = jax.random.normal(k, (8, 16))
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    labels = jnp.eye(8, 14)
    aligned, _ = L.contrastive_loss(emb, emb, 14.0, labels, cfg.expert)
    shuffled = emb[::-1]
    misaligned, _ = L.contrastive_loss(emb, shuffled, 14.0, labels,
                                       cfg.expert)
    assert float(aligned) < float(misaligned)


def test_multi_positive_infonce_t2i_targets_column_normalized():
    """Regression: with asymmetric positive counts across the batch the
    t2i targets must be the column-normalization of the (symmetric)
    positive-weight matrix — equal to the row-normalized ``targets`` —
    not ``targets.T``, whose rows don't sum to 1 and mis-weight texts."""
    import optax

    # item0={A,B}, item1={A}, item2={B}: Jaccard(0,1)=Jaccard(0,2)=0.5
    # (positive at min_jaccard=0.5) but Jaccard(1,2)=0 -> row positive
    # counts 3,2,2: normalizing rows vs columns of targets differs.
    labels = jnp.zeros((3, 14)).at[0, 0].set(1).at[0, 1].set(1) \
        .at[1, 0].set(1).at[2, 1].set(1)
    k = jax.random.key(3)
    img = jax.random.normal(k, (3, 16))
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = jax.random.normal(jax.random.key(4), (3, 16))
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    cfg = ExpertConfig(hard_negative_low=2.0)  # disable hinge term
    total, parts = L.multi_positive_infonce(img, txt, 7.0, labels,
                                            config=cfg)

    weights = np.array([[1., 1., 1.], [1., 1., 0.], [1., 0., 1.]])
    targets = weights / weights.sum(axis=1, keepdims=True)
    sim = 7.0 * np.asarray(img @ txt.T)
    good = 0.5 * (
        float(jnp.mean(optax.softmax_cross_entropy(sim, targets)))
        + float(jnp.mean(optax.softmax_cross_entropy(sim.T, targets))))
    bad = 0.5 * (
        float(jnp.mean(optax.softmax_cross_entropy(sim, targets)))
        + float(jnp.mean(optax.softmax_cross_entropy(sim.T, targets.T))))
    assert abs(float(parts["contrastive"]) - good) < 1e-5
    assert abs(good - bad) > 1e-4    # the old code measurably differed


def test_clinical_graph_structure():
    adj = constants.clinical_adjacency()
    assert adj.shape == (14, 14)
    assert (adj == adj.T).all()
    assert np.allclose(np.diag(adj), 1.0)
    assert adj[0, 1] == 1.0 and adj[9, 10] == 1.0
    assert adj[3, 8] == 0.0  # Lung Lesion and Pneumothorax unconnected


def test_eval_step_sharded(cfg, batch, mesh_data):
    model = _model(cfg, "baseline")
    params = model.init(jax.random.key(0), batch["pixel_values"],
                        batch["input_ids"], batch["attention_mask"])["params"]
    from radar_tpu.core.mesh import shard_batch
    from radar_tpu.core.training import replicate_state
    params = replicate_state(params, mesh_data)
    sbatch = shard_batch(mesh_data, batch)
    step = make_eval_step(model, mesh_data)
    logits = step(params, sbatch)
    assert logits.shape == (batch["labels"].shape[0], 14)


def test_bert_arch_text_tower(cfg, batch):
    """Experts accept the HF-importable BERT text tower via config."""
    import dataclasses
    bert_cfg = dataclasses.replace(cfg.text, arch="bert")
    model = create_model("baseline", cfg.vision, bert_cfg, cfg.expert)
    params = model.init(jax.random.key(0), batch["pixel_values"],
                        batch["input_ids"], batch["attention_mask"])["params"]
    logits = model.apply({"params": params}, batch["pixel_values"],
                         batch["input_ids"], batch["attention_mask"])
    assert logits.shape == (batch["labels"].shape[0], 14)
    assert "layer_0" in params["towers"]["text"]


def test_guarded_step_skips_nonfinite(cfg, batch):
    """Failure detection: a NaN batch must not corrupt the train state."""
    model = _model(cfg, "baseline")
    state = create_train_state(model, jax.random.key(0), batch, cfg.train)
    step = make_train_step(model, baseline_loss_fn, guard=True)
    rng = jax.random.key(1)
    poisoned = dict(batch)
    poisoned["pixel_values"] = np.full_like(batch["pixel_values"], np.nan)
    p_before = jax.device_get(state.params)
    state2, m = step(state, poisoned, rng)
    assert float(m["skipped_nonfinite"]) == 1.0
    p_after = jax.device_get(state2.params)
    for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(p_after)):
        np.testing.assert_array_equal(a, b)
    assert int(state2.step) == 1  # step still advances
    # a clean batch afterwards trains normally
    state3, m2 = step(state2, batch, rng)
    assert float(m2["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(m2["loss"]))


def test_train_step_is_deterministic(cfg, batch):
    """Bitwise determinism of the jitted train step (race detection:
    explicit PRNG keys mean any run-to-run difference is a defect)."""
    from radar_tpu.utils.determinism import check_determinism
    model = _model(cfg, "baseline")
    state = create_train_state(model, jax.random.key(0), batch, cfg.train)
    step = make_train_step(model, baseline_loss_fn)
    rng = jax.random.key(1)

    def run():
        # fresh state each run (step donates its input)
        s = create_train_state(model, jax.random.key(0), batch,
                               cfg.train)
        s, m = step(s, batch, rng)
        return {"params": s.params, "loss": m["loss"]}

    assert check_determinism(run)


def test_vision_seq_padding_exact(cfg):
    """seq_pad_to pads the token sequence with masked tokens for MXU
    lane tiling; outputs must be EXACT vs the unpadded tower (same
    params — no new parameters are introduced)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from radar_tpu.models.vision import VisionTransformer
    vcfg = cfg.vision
    padded_cfg = dataclasses.replace(vcfg, seq_pad_to=24)
    base = VisionTransformer(vcfg)
    padded = VisionTransformer(padded_cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0.5, 0.3, (2, vcfg.image_size, vcfg.image_size, 3)), jnp.float32)
    params = base.init(jax.random.key(0), x)["params"]
    out_b = base.apply({"params": params}, x)
    out_p = padded.apply({"params": params}, x)
    assert out_p["last_hidden_state"].shape == \
        out_b["last_hidden_state"].shape
    np.testing.assert_allclose(np.asarray(out_p["pooler_output"]),
                               np.asarray(out_b["pooler_output"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p["last_hidden_state"]),
                               np.asarray(out_b["last_hidden_state"]),
                               rtol=2e-5, atol=2e-5)


def test_exact_ranking_infonce_masks_dupes_and_ranks_confusers():
    """The "exact" retrieval objective (round-5): (1) an in-batch pair
    with an IDENTICAL pathology label set is masked out of the softmax
    denominators (it is a true positive under exact-set relevance, so
    its presence must not raise the loss); (2) a near-miss label set
    (high Jaccard, not equal) scoring above the own pair incurs a
    ranking hinge; (3) the gradient direction prefers the own passage
    ranked above the confuser."""
    import optax

    # items 0,1 share the exact set {A,B}; item 2 = {A,B,C} (jac 2/3,
    # a confuser); item 3 = {D} (plain negative)
    labels = (jnp.zeros((4, 14)).at[0, 0].set(1).at[0, 1].set(1)
              .at[1, 0].set(1).at[1, 1].set(1)
              .at[2, 0].set(1).at[2, 1].set(1).at[2, 2].set(1)
              .at[3, 3].set(1))
    k = jax.random.key(7)
    img = jax.random.normal(k, (4, 16))
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = jax.random.normal(jax.random.key(8), (4, 16))
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    cfg = ExpertConfig()

    total, parts = L.exact_ranking_infonce(img, txt, 7.0, labels,
                                           config=cfg)
    # (1) duplicate masking: recompute the base by hand with the
    # (0,1)/(1,0) entries removed from the denominators
    sim = 7.0 * np.asarray(img @ txt.T)
    masked = sim.copy()
    masked[0, 1] = masked[1, 0] = -1e9
    t = np.arange(4)
    want = 0.5 * (
        float(jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            jnp.asarray(masked), t)))
        + float(jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            jnp.asarray(masked.T), t))))
    assert abs(float(parts["contrastive"]) - want) < 1e-4
    assert float(parts["mean_dupes"]) == pytest.approx(0.5)

    # (2+3) ranking hinge: craft embeddings where the confuser passage
    # outranks the own passage for image 0 -> hinge positive, and the
    # fixed version (own on top) scores strictly lower
    e = np.eye(4, 16, dtype=np.float32)
    img2 = jnp.asarray(e)
    bad_txt = e.copy()
    bad_txt[[0, 2]] = bad_txt[[2, 0]]        # passage 2 where 0 should be
    good_total, good_parts = L.exact_ranking_infonce(
        img2, jnp.asarray(e), 7.0, labels, config=cfg)
    bad_total, bad_parts = L.exact_ranking_infonce(
        img2, jnp.asarray(bad_txt), 7.0, labels, config=cfg)
    assert float(bad_parts["rank_hinge"]) > float(
        good_parts["rank_hinge"])
    assert float(good_total) < float(bad_total)
