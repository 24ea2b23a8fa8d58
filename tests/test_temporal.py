"""Contribution 3.1 (temporal modeling) tests: progression label
derivation, comparator shapes/grads, statement generation, learning
signal through the training CLI, and the pipeline serving hook."""

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.data.synthetic import SyntheticLongitudinalDataset
from radar_tpu.models.temporal import (IMPROVED, STABLE, WORSENED,
                                       TemporalComparator,
                                       comparison_statements,
                                       derive_progression_labels,
                                       temporal_loss_fn)


def test_progression_label_derivation():
    prior = np.zeros((1, 14), np.float32)
    current = np.zeros((1, 14), np.float32)
    prior[0, 1] = 1.0                    # Cardiomegaly resolves
    current[0, 9] = 1.0                  # Pleural Effusion appears
    prog = np.asarray(derive_progression_labels(prior, current))[0]
    assert prog[1] == IMPROVED
    assert prog[9] == WORSENED
    assert prog[2] == STABLE


def test_comparison_statements():
    prog = np.full(14, STABLE)
    assert "No significant interval change" in comparison_statements(prog)
    prog[1] = IMPROVED
    prog[9] = WORSENED
    s = comparison_statements(prog)
    assert "Interval improvement in Cardiomegaly." in s
    assert "Interval worsening of Pleural Effusion." in s


def test_comparator_shapes_and_grads(cfg):
    ds = SyntheticLongitudinalDataset(8, cfg.vision.image_size, seed=0)
    batch = next(ds.batches(4))
    model = TemporalComparator(cfg.vision, cfg.expert)
    params = model.init(jax.random.key(0), batch["pixel_values"],
                        batch["prior_pixel_values"])["params"]
    out = jax.jit(model.apply)({"params": params}, batch["pixel_values"],
                               batch["prior_pixel_values"])
    assert out["progression_logits"].shape == (4, 14, 3)
    loss_fn = temporal_loss_fn(cfg.expert)
    (loss, aux), grads = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(model, p, batch, jax.random.key(1)),
        has_aux=True))(params)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(aux["progression_accuracy"]) <= 1.0
    # the siamese tower is shared: exactly one vision param subtree
    assert "vision" in params and "prior_vision" not in params
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in jax.tree.leaves(grads))))
    assert gnorm > 0


def test_longitudinal_dataset_consistency():
    ds = SyntheticLongitudinalDataset(32, 32, seed=3)
    prog = np.asarray(derive_progression_labels(ds.prior_labels,
                                                ds.labels))
    # transitions exist in both directions at these rates
    assert (prog == IMPROVED).sum() > 0
    assert (prog == WORSENED).sum() > 0
    assert (prog == STABLE).sum() > (prog != STABLE).sum()
    s = ds[0]
    assert s["pixel_values"].shape == s["prior_pixel_values"].shape


def test_temporal_cli_trains_and_pipeline_hook(tmp_path, cfg, tokenizer):
    from radar_tpu.cli.train_temporal import main
    r = main(["--tiny", "--synthetic", "--synthetic_size", "48",
              "--epochs", "2", "--output_dir", str(tmp_path / "ck"),
              "--output_path", str(tmp_path / "temporal.json")])
    losses = [h["train_loss"] for h in r["history"]]
    assert losses[-1] < losses[0]
    assert 0.0 <= r["validation"]["progression_macro_f1"] <= 1.0

    # serving hook: prior image conditions the decoder prompt
    from radar_tpu.core.checkpoint import CheckpointManager
    from radar_tpu.models.temporal import TemporalComparator
    from radar_tpu.pipeline.radar import RadarPipeline
    import os
    model = TemporalComparator(cfg.vision, cfg.expert)
    ds = SyntheticLongitudinalDataset(4, cfg.vision.image_size, seed=1)
    b = next(ds.batches(2))
    params = model.init(jax.random.key(0), b["pixel_values"],
                        b["prior_pixel_values"])["params"]
    mngr = CheckpointManager(os.path.join(str(tmp_path / "ck"),
                                          "comparator"))
    params = mngr.restore(jax.device_get(params))
    mngr.close()

    prompts = []

    class _SpyPipe(RadarPipeline):
        def _make_generation_fn(self, image_embedding, **kw):
            def fn(context):
                prompts.append(context)
                return "The lungs are clear."
            return fn

    pipe = _SpyPipe(cfg, tokenizer, temporal_model=model,
                    temporal_params=params)
    out = pipe.generate_report(b["pixel_values"][0], "Indication: f/u",
                               prior_image=b["prior_pixel_values"][0])
    assert "comparison" in out
    assert "Comparison:" in prompts[0]
    assert out["comparison"] in prompts[0]


def test_temporal_artifact_per_class_floors():
    """Regression gate on the checked-in round-3 artifact (VERDICT r2
    #3 done-criterion): progression macro-F1 >= 0.60 with Improved AND
    Worsened F1 >= 0.40, at BOTH the change-enriched training rates and
    the natural transition rates."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "temporal_evaluation.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("no temporal artifact checked in")
    d = json.load(open(path))
    for block in ("validation", "validation_natural_rates"):
        v = d.get(block)
        assert v is not None, f"{block} missing from artifact"
        assert v["progression_macro_f1"] >= 0.60, block
        assert v["per_class"]["improved"]["f1"] >= 0.40, block
        assert v["per_class"]["worsened"]["f1"] >= 0.40, block


def test_temporal_batched_serving_parity(cfg, tokenizer):
    """Batched serving (contribution 3.1): prior images run through ONE
    batched progression forward and the comparison statements condition
    every study's prompt — parity with generate_report(prior_image=…)."""
    import jax
    import numpy as np

    from radar_tpu.data.synthetic import SyntheticLongitudinalDataset
    from radar_tpu.models.temporal import TemporalComparator
    from radar_tpu.pipeline.radar import RadarPipeline

    model = TemporalComparator(cfg.vision, cfg.expert)
    ds = SyntheticLongitudinalDataset(4, cfg.vision.image_size, seed=3)
    b = next(ds.batches(2))
    params = model.init(jax.random.key(0), b["pixel_values"],
                        b["prior_pixel_values"])["params"]

    prompts = []

    class _SpyPipe(RadarPipeline):
        def _batch_generate(self, contexts, image_embeddings,
                            banned_mask=None):
            prompts.append(list(contexts))
            return ["The lungs are clear."] * len(contexts)

    pipe = _SpyPipe(cfg, tokenizer, temporal_model=model,
                    temporal_params=params)
    out = pipe.generate_reports_batch(
        [np.asarray(b["pixel_values"][i]) for i in range(2)],
        ["Indication: f/u", "Indication: f/u"],
        prior_images=[np.asarray(b["prior_pixel_values"][i])
                      for i in range(2)])
    assert len(out) == 2
    for i in range(2):
        assert "comparison" in out[i]
        assert len(out[i]["progression"]) == 14
        assert "Comparison:" in prompts[0][i]
        assert out[i]["comparison"] in prompts[0][i]
