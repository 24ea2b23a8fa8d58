"""End-to-end integration test — fills the reference's empty
``tests/test_integration.py`` intent (SURVEY.md §4): train a tiny
baseline expert on synthetic data until it learns, build a retrieval
database, and run the full two-stage RADAR pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.core.mesh import shard_batch
from radar_tpu.core.training import (baseline_loss_fn, create_train_state,
                                     make_eval_step, make_train_step,
                                     replicate_state)
from radar_tpu.eval.metrics import f1_scores
from radar_tpu.models.decoder import ReportDecoder
from radar_tpu.models.experts import create_model
from radar_tpu.pipeline.radar import RadarPipeline
from radar_tpu.retrieval.dpr import create_dpr_model


def test_expert_learns_on_synthetic_data(cfg, dataset):
    """Training on the structured synthetic set must beat chance."""
    model = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    batch0 = next(dataset.batches(16))
    tcfg = cfg.train.override(learning_rate=1e-3, num_epochs=12,
                              schedule="constant")
    state = create_train_state(model, jax.random.key(0), batch0, tcfg,
                               steps_per_epoch=2)
    step = make_train_step(model, baseline_loss_fn)
    rng = jax.random.key(1)
    first_loss = last_loss = None
    for epoch in range(12):
        for batch in dataset.batches(16, shuffle=True, seed=epoch):
            state, m = step(state, batch, rng)
            if first_loss is None:
                first_loss = float(m["loss"])
            last_loss = float(m["loss"])
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)

    eval_step = make_eval_step(model)
    logits = eval_step(state.params, batch0)
    preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    f1 = float(f1_scores(preds, jnp.asarray(batch0["labels"]))["micro_f1"])
    assert f1 > 0.25, f1   # visible signal (tiny model, 4 epochs)


def test_sharded_training_matches_single_device(cfg, dataset, mesh_data):
    """The same train step on an 8-way data mesh must produce the same
    loss trajectory as single-device (same seed, same data)."""
    model = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    batch = next(dataset.batches(16))
    rng = jax.random.key(1)

    state1 = create_train_state(model, jax.random.key(0), batch, cfg.train)
    step1 = make_train_step(model, baseline_loss_fn)
    losses1 = []
    for _ in range(3):
        state1, m = step1(state1, batch, rng)
        losses1.append(float(m["loss"]))

    state2 = create_train_state(model, jax.random.key(0), batch, cfg.train)
    state2 = replicate_state(state2, mesh_data)
    step2 = make_train_step(model, baseline_loss_fn, mesh_data)
    sbatch = shard_batch(mesh_data, batch)
    losses2 = []
    for _ in range(3):
        state2, m = step2(state2, sbatch, rng)
        losses2.append(float(m["loss"]))

    np.testing.assert_allclose(losses1, losses2, rtol=2e-3)


def test_full_radar_pipeline(cfg, dataset, tokenizer):
    """Two-stage pipeline end-to-end on synthetic data with an
    untrained tiny decoder: structure and plumbing must hold."""
    expert = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    sample = dataset[0]
    pv = jnp.asarray(sample["pixel_values"])[None]
    ids = jnp.asarray(sample["input_ids"])[None]
    mask = jnp.asarray(sample["attention_mask"])[None]
    expert_params = expert.init(jax.random.key(0), pv, ids, mask)["params"]

    dpr = create_dpr_model(cfg, tokenizer)
    passages = [dataset[i]["report"] for i in range(8)]
    obs = np.stack([dataset[i]["labels"] for i in range(8)])
    dpr.build_retrieval_database(passages, obs)

    dec_cfg = cfg.decoder
    decoder = ReportDecoder(dec_cfg)
    did = jnp.zeros((1, 8), jnp.int32)
    dmask = jnp.ones((1, 8), jnp.int32)
    dprefix = jnp.zeros((1, dec_cfg.prefix_dim), jnp.float32)
    decoder_params = decoder.init(jax.random.key(1), did, dmask,
                                  dprefix)["params"]

    pipe = RadarPipeline(cfg, tokenizer, expert, expert_params, dpr,
                         decoder, decoder_params)
    out = pipe.generate_report(sample["pixel_values"],
                               sample["clinical_context"],
                               reference_text=sample["report"])
    assert isinstance(out["report"], str)
    assert out["iterations"] >= 1
    assert 0.0 <= out["consistency_score"] <= 1.0
    assert isinstance(out["expert_observations"], dict)
    assert isinstance(out["retrieved_passages"], list)
    # per-stage latency breakdown: the serving-latency diagnostic
    timings = out["timings"]
    for stage in ("image_embed", "expert", "preliminary_decode",
                  "rag_loop"):
        assert timings[stage] > 0.0, stage
    assert all(v >= 0.0 for v in timings.values())


def test_oracle_targeting_drives_loop_expected(cfg, dataset, tokenizer):
    """The --oracle_targeting diagnostic (loop-value ceiling witness):
    ``generate_report(oracle_expected=…)`` must replace the loop's
    expected set (normally expert-confident ∪ corroborated) with the
    given names restricted to the detector vocabulary, while the expert
    stage still runs (prompt/constrained-decode inputs unchanged)."""
    expert = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    sample = dataset[0]
    pv = jnp.asarray(sample["pixel_values"])[None]
    ids = jnp.asarray(sample["input_ids"])[None]
    mask = jnp.asarray(sample["attention_mask"])[None]
    expert_params = expert.init(jax.random.key(0), pv, ids, mask)["params"]
    decoder = ReportDecoder(cfg.decoder)
    decoder_params = decoder.init(
        jax.random.key(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32))["params"]
    pipe = RadarPipeline(cfg, tokenizer, expert, expert_params, None,
                         decoder, decoder_params)

    oracle = {"Edema", "Cardiomegaly", "Not A Real Observation"}
    out = pipe.generate_report(sample["pixel_values"],
                               sample["clinical_context"],
                               oracle_expected=oracle)
    assert set(out["rag"]["expected_observations"]) == {
        "Edema", "Cardiomegaly"}
    # expert stage untouched by the oracle
    assert isinstance(out["expert_observations"], dict)

    # eval-layer wiring: oracle mode derives the set from the labels
    # and tags the artifact
    from radar_tpu.eval.pipeline_eval import evaluate_pipeline
    res = evaluate_pipeline(pipe, [{
        "pixel_values": sample["pixel_values"],
        "clinical_context": sample["clinical_context"],
        "report": sample["report"],
        "labels": sample["labels"],
    }], oracle_targeting=True)
    assert res["targeting"] == "oracle"


def test_pipeline_pins_params_on_device(cfg, dataset, tokenizer):
    """Host-numpy param pytrees (what Orbax restores) must be pinned
    to device at pipeline construction — jit re-uploads numpy args on
    EVERY call, and through the TPU relay that re-transfer dominated
    quality-preset serving latency (~15 s/study for ~0.3 s compute)."""
    expert = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    sample = dataset[0]
    pv = jnp.asarray(sample["pixel_values"])[None]
    ids = jnp.asarray(sample["input_ids"])[None]
    mask = jnp.asarray(sample["attention_mask"])[None]
    expert_params = jax.device_get(     # host numpy, like a restore
        expert.init(jax.random.key(0), pv, ids, mask)["params"])
    assert isinstance(jax.tree.leaves(expert_params)[0], np.ndarray)

    decoder = ReportDecoder(cfg.decoder)
    decoder_params = jax.device_get(decoder.init(
        jax.random.key(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32))["params"])

    pipe = RadarPipeline(cfg, tokenizer, expert, expert_params,
                         None, decoder, decoder_params)
    for tree in (pipe.expert_params, pipe.decoder_params):
        for leaf in jax.tree.leaves(tree):
            assert isinstance(leaf, jax.Array), type(leaf)

    # post-construction reassignment must stay pinned too
    pipe.decoder_params = jax.device_get(pipe.decoder_params)
    for leaf in jax.tree.leaves(pipe.decoder_params):
        assert isinstance(leaf, jax.Array), type(leaf)

    # the embedder's params setter must pin external (re)assignments
    dpr = create_dpr_model(cfg, tokenizer)
    dpr.embedder.params = jax.device_get(dpr.embedder.params)
    for leaf in jax.tree.leaves(dpr.embedder.params):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_expert_ensemble_probability_averaging(cfg, dataset, tokenizer):
    """Probability-averaged expert ensembling (round-3): the pipeline's
    expert stage with extra members must gate on the MEAN of the
    members' calibrated probabilities against the MEAN of their
    per-class thresholds — the decorrelated-FP veto that a single
    expert cannot provide."""
    sample = dataset[0]
    pv = jnp.asarray(sample["pixel_values"])[None]
    ids = jnp.asarray(sample["input_ids"])[None]
    mask = jnp.asarray(sample["attention_mask"])[None]

    m1 = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    p1 = m1.init(jax.random.key(0), pv, ids, mask)["params"]
    m2 = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    p2 = m2.init(jax.random.key(7), pv, ids, mask)["params"]

    n_obs = int(np.asarray(sample["labels"]).shape[-1])
    th1 = np.full(n_obs, 0.5, np.float32)
    th2 = np.full(n_obs, 0.7, np.float32)

    solo = RadarPipeline(cfg, tokenizer, m1, p1,
                         expert_thresholds=th1)
    duo = RadarPipeline(cfg, tokenizer, m1, p1,
                        expert_thresholds=th1,
                        ensemble=[(m2, p2, th2)])

    probs1 = solo._expert_probs(pv, ids, mask)
    solo2 = RadarPipeline(cfg, tokenizer, m2, p2,
                          expert_thresholds=th2)
    probs2 = solo2._expert_probs(pv, ids, mask)
    mean = duo._expert_probs(pv, ids, mask)
    np.testing.assert_allclose(mean, (probs1 + probs2) / 2, atol=1e-6)
    np.testing.assert_allclose(duo._thresholds(),
                               (th1 + th2) / 2, atol=1e-6)

    # the single-study expert stage must use the ensemble gate too
    out = duo.predict_observations(sample["pixel_values"],
                                   sample["clinical_context"])
    np.testing.assert_allclose(out["probs"], mean[0], atol=1e-6)


def test_trained_decoder_generates_true_observations(cfg, tokenizer):
    """Train the report decoder on synthetic (context -> report) pairs
    and verify greedy generation surfaces the ground-truth observations
    — the end-to-end generation quality the reference can't test (its
    generator is a mock)."""
    from radar_tpu.data.synthetic import SyntheticCXRDataset
    from radar_tpu.models.decoder import generate
    from radar_tpu.models.lm_training import (make_lm_examples,
                                              train_decoder_lm)
    from radar_tpu.pipeline.observations import ObservationDetector

    tcfg = cfg.override(**{"train.learning_rate": 3e-3,
                           "train.num_epochs": 15,
                           "train.schedule": "constant"})
    ds = SyntheticCXRDataset(64, cfg.vision.image_size,
                             cfg.text.max_length, tokenizer=tokenizer,
                             seed=0)
    contexts = [ds[i]["clinical_context"] for i in range(64)]
    reports = [ds[i]["report"] for i in range(64)]
    ids, attn, lmask = make_lm_examples(contexts, reports, tokenizer,
                                        tcfg.decoder.max_length)

    def batches():
        for s in range(0, 64, 16):
            yield {"input_ids": ids[s:s + 16],
                   "attention_mask": attn[s:s + 16],
                   "loss_mask": lmask[s:s + 16]}

    module, params, hist = train_decoder_lm(tcfg, batches)
    assert hist[-1]["perplexity"] < 1.5, hist[-1]

    det = ObservationDetector()
    hits = 0
    n = 6
    for i in range(n):
        cid, cmask = tokenizer.encode(contexts[i], 48)
        out = generate(module, params, jnp.asarray(cid)[None],
                       jnp.asarray(cmask)[None], max_new_tokens=30,
                       temperature=0.0)
        text = tokenizer.decode(np.asarray(out)[0])
        true_obs = det.detect_observations(reports[i])
        got_obs = det.detect_observations(text)
        if (true_obs & got_obs) or (not true_obs and not got_obs):
            hits += 1
    assert hits >= n - 1, f"only {hits}/{n} generations matched"


def test_batched_pipeline_matches_contract(cfg, dataset, tokenizer):
    """Batched serving path: one expert forward + batched decodes across
    studies; per-study outputs keep the single-study contract."""
    expert = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    s = dataset[0]
    pv = jnp.asarray(s["pixel_values"])[None]
    ids = jnp.asarray(s["input_ids"])[None]
    mask = jnp.asarray(s["attention_mask"])[None]
    expert_params = expert.init(jax.random.key(0), pv, ids, mask)["params"]

    dpr = create_dpr_model(cfg, tokenizer)
    dpr.build_retrieval_database(
        [dataset[i]["report"] for i in range(8)],
        np.stack([dataset[i]["labels"] for i in range(8)]))

    decoder = ReportDecoder(cfg.decoder)
    dparams = decoder.init(
        jax.random.key(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32))["params"]

    pipe = RadarPipeline(cfg, tokenizer, expert, expert_params, dpr,
                         decoder, dparams)
    images = [dataset[i]["pixel_values"] for i in range(3)]
    contexts = [dataset[i]["clinical_context"] for i in range(3)]
    refs = [dataset[i]["report"] for i in range(3)]
    results = pipe.generate_reports_batch(images, contexts, refs)
    assert len(results) == 3
    for r in results:
        assert isinstance(r["report"], str)
        assert 1 <= r["iterations"] <= cfg.rag.max_iterations
        assert 0.0 <= r["consistency_score"] <= 1.0
        assert isinstance(r["expert_observations"], dict)


def test_pipeline_uncertainty_expert_path(cfg, dataset, tokenizer):
    """The pipeline routes an UncertaintyExpert through the MC-dropout
    + calibrated-threshold confident-observation gate."""
    expert = create_model("uncertainty", cfg.vision, cfg.text, cfg.expert)
    s = dataset[0]
    pv = jnp.asarray(s["pixel_values"])[None]
    ids = jnp.asarray(s["input_ids"])[None]
    mask = jnp.asarray(s["attention_mask"])[None]
    params = expert.init(jax.random.key(0), pv, ids, mask)["params"]
    pipe = RadarPipeline(cfg, tokenizer, expert, params)
    out = pipe.predict_observations(s["pixel_values"],
                                    s["clinical_context"])
    assert out["uncertainty"] is not None
    assert out["uncertainty"].shape == (14,)
    assert isinstance(out["confident_observations"], dict)


def test_serving_prompt_budget_preserves_validated_line(cfg, tokenizer):
    """Round-2 regression pin: the serving prompt budget must equal LM
    training's context budget (decoder.max_length // 2) and a typical
    stage-1 prompt — context + validated-observations line — must fit
    it un-truncated.  The old budget (max_len - max_new - 1 = 27 on
    the tiny preset) chopped the validated line off every prompt and
    silently severed the expert stage from generation."""
    import numpy as np

    from radar_tpu.data.synthetic import context_text
    from radar_tpu.pipeline.prompts import build_prompt
    from radar_tpu.pipeline.radar import RadarPipeline

    budget = object.__new__(RadarPipeline)
    budget.config = cfg
    max_prompt, max_new = RadarPipeline._prompt_budget(budget)
    assert max_prompt == cfg.decoder.max_length // 2
    assert max_prompt + max_new <= cfg.decoder.max_length

    labels = np.zeros(14, np.float32)
    labels[[1, 9]] = 1.0
    prompt = build_prompt(context_text(labels, leak_labels=False),
                          ["Cardiomegaly", "Pleural Effusion"])
    ids, mask = tokenizer.encode(prompt, max_prompt)
    decoded = tokenizer.decode(np.asarray(ids))
    assert "findings" in decoded.lower()          # trailing marker survives
    assert "cardiomegaly" in decoded.lower()      # validated line survives
