"""Targeting stacker (val-fitted logistic keep-rule) tests.

The stacker replaces the hand cross-modal veto on the loop's expected
set (radar_tpu/pipeline/targeting.py; offline evidence
results/targeting_stacker_sweep.json).  These tests pin: the fit
learns a non-axis-aligned boundary the rectangle veto cannot, the
save/load contract, the pipeline-side member-count guard, and the
serving paths actually consulting the stacker."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.core.constants import OBSERVATION_NAMES
from radar_tpu.pipeline.targeting import (TargetingStacker,
                                          build_features,
                                          fit_logistic,
                                          fit_positive_keep_stacker,
                                          neighbour_vote_features)

N_OBS = len(OBSERVATION_NAMES)
NF = OBSERVATION_NAMES.index("No Finding")


def _synthetic_features(rng: np.random.Generator, n: int, m: int = 3):
    """Member prob stack + vote features where the keep/drop boundary
    is member-agreement-shaped (NOT the hand veto's rectangle): a cell
    is a true positive iff at least two members score it high."""
    stack = rng.uniform(0.0, 1.0, size=(m, n, N_OBS)).astype(np.float32)
    labels = ((stack > 0.6).sum(0) >= 2).astype(np.float32)
    votes10 = rng.integers(0, 11, size=(n, N_OBS)).astype(np.float32)
    votes20 = votes10 + rng.integers(0, 11, size=(n, N_OBS))
    swv10 = votes10 * rng.uniform(0.3, 1.0, size=(n, N_OBS))
    return stack, labels, votes10, votes20.astype(np.float32), \
        swv10.astype(np.float32)


def test_fit_learns_non_axis_aligned_boundary():
    rng = np.random.default_rng(0)
    stack, labels, v10, v20, swv = _synthetic_features(rng, 256)
    th = np.full(N_OBS, 0.33, np.float32)   # wide positive region
    st = fit_positive_keep_stacker(stack, labels, th, v10, v20, swv)
    # held-out split from the same generative process
    stack2, labels2, v10b, v20b, swvb = _synthetic_features(
        np.random.default_rng(1), 256)
    keep = st.keep_mask(stack2, v10b, v20b, swvb)
    mean = stack2.mean(0)
    pos = mean > th
    pos[:, NF] = False
    lab = labels2 > 0.5
    # stacker-kept positives must be cleaner than raw positives AND
    # than the hand rectangle (mean > 0.7 | votes >= 6) on this
    # agreement-shaped boundary
    def prec(mask):
        return (mask & lab).sum() / max(mask.sum(), 1)
    raw_p = prec(pos)
    rect_p = prec(pos & ((mean > 0.7) | (v10b >= 6)))
    stk_p = prec(pos & keep)
    assert stk_p > raw_p + 0.05, (stk_p, raw_p)
    assert stk_p > rect_p + 0.05, (stk_p, rect_p)
    # and it must not collapse recall
    def rec(mask):
        return (mask & lab).sum() / max(lab.sum(), 1)
    assert rec(pos & keep) > 0.5 * rec(pos)


def test_keep_mask_exempts_no_finding():
    w = np.full(4 + 1 + 5 + 3 + (1 + 2) + N_OBS + 1, -10.0)  # drop all
    st = TargetingStacker(weights=w, tau=0.5, n_members=1)
    stack = np.full((1, 4, N_OBS), 0.9, np.float32)
    z = np.zeros((4, N_OBS), np.float32)
    keep = st.keep_mask(stack, z, z, z)
    assert keep[:, NF].all()
    off = np.ones(N_OBS, bool)
    off[NF] = False
    assert not keep[:, off].any()


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    stack, labels, v10, v20, swv = _synthetic_features(rng, 64)
    th = np.full(N_OBS, 0.33, np.float32)
    st = fit_positive_keep_stacker(stack, labels, th, v10, v20, swv,
                                   tau=0.6, meta={"val_seed": 55})
    path = str(tmp_path / "stacker.json")
    st.save(path)
    st2 = TargetingStacker.load(path)
    np.testing.assert_allclose(st2.weights, st.weights)
    assert st2.tau == 0.6 and st2.n_members == 3
    assert st2.meta["val_seed"] == 55
    np.testing.assert_array_equal(st2.keep_mask(stack, v10, v20, swv),
                                  st.keep_mask(stack, v10, v20, swv))
    # feature-spec mismatch must refuse to load, not mis-predict
    payload = json.load(open(path))
    payload["features"] = "something-else"
    json.dump(payload, open(path, "w"))
    with pytest.raises(ValueError, match="feature spec"):
        TargetingStacker.load(path)


def test_member_count_guard(cfg, dataset, tokenizer):
    """A stacker fitted for 3 members must refuse a solo pipeline at
    construction (positional member-prob columns)."""
    from radar_tpu.models.experts import create_model
    from radar_tpu.pipeline.radar import RadarPipeline
    expert = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    s = dataset[0]
    params = expert.init(
        jax.random.key(0), jnp.asarray(s["pixel_values"])[None],
        jnp.asarray(s["input_ids"])[None],
        jnp.asarray(s["attention_mask"])[None])["params"]
    w = np.zeros(4 + 3 + 5 + 3 + (3 + 2) + N_OBS + 1)
    st = TargetingStacker(weights=w, n_members=3)
    with pytest.raises(ValueError, match="fitted for 3"):
        RadarPipeline(cfg, tokenizer, expert, params, stacker=st)


def test_neighbour_vote_features_depths():
    obs = np.zeros((30, N_OBS), np.float32)
    obs[:, 1] = 1.0            # every passage carries observation 1
    obs[:15, 2] = 1.0          # first half carries observation 2
    ids = np.arange(20)[None].astype(np.int64)       # one query, k=20
    scores = np.linspace(1.0, 0.5, 20)[None].astype(np.float32)
    vf = neighbour_vote_features(ids, scores, obs, count=30)
    assert vf["votes10"][0, 1] == 10 and vf["votes20"][0, 1] == 20
    assert vf["votes10"][0, 2] == 10 and vf["votes20"][0, 2] == 15
    # swv10 = sum of the top-10 scores for obs 1
    np.testing.assert_allclose(vf["swv10"][0, 1], scores[0, :10].sum(),
                               rtol=1e-5)
    # invalid ids are ignored
    ids_bad = ids.copy()
    ids_bad[0, :5] = -1
    vf2 = neighbour_vote_features(ids_bad, scores, obs, count=30)
    assert vf2["votes10"][0, 1] == 5


def _tiny_pipeline(cfg, dataset, tokenizer, stacker=None):
    from radar_tpu.models.decoder import ReportDecoder
    from radar_tpu.models.experts import create_model
    from radar_tpu.pipeline.radar import RadarPipeline
    from radar_tpu.retrieval.dpr import create_dpr_model
    expert = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    s = dataset[0]
    params = expert.init(
        jax.random.key(0), jnp.asarray(s["pixel_values"])[None],
        jnp.asarray(s["input_ids"])[None],
        jnp.asarray(s["attention_mask"])[None])["params"]
    dpr = create_dpr_model(cfg, tokenizer)
    passages = [dataset[i]["report"] for i in range(24)]
    obs = np.stack([dataset[i]["labels"] for i in range(24)])
    dpr.build_retrieval_database(passages, obs)
    decoder = ReportDecoder(cfg.decoder)
    dec_params = decoder.init(
        jax.random.key(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32))["params"]
    return RadarPipeline(cfg, tokenizer, expert, params, dpr, decoder,
                         dec_params, stacker=stacker)


def test_gate_positives_consults_stacker(cfg, dataset, tokenizer):
    """_gate_positives must route through the stacker when one is
    loaded (all-drop stacker empties the positives; all-keep stacker
    preserves them even where the hand veto would drop), and fall back
    to the hand veto when neighbour features are missing."""
    n_feat = 4 + 1 + 5 + 3 + (1 + 2) + N_OBS
    drop = TargetingStacker(weights=np.full(n_feat + 1, -10.0),
                            n_members=1)
    keep = TargetingStacker(weights=np.concatenate(
        [np.zeros(n_feat), [10.0]]), n_members=1)
    pipe = _tiny_pipeline(cfg, dataset, tokenizer, stacker=drop)
    n = 3
    probs = np.full((n, N_OBS), 0.55, np.float32)   # lukewarm positives
    decisions = np.ones((n, N_OBS), bool)
    stack = probs[None]
    votes = np.zeros((n, N_OBS), np.float32)        # veto would drop too
    nbr_ids = np.tile(np.arange(20)[None], (n, 1))
    nbr_scores = np.ones((n, 20), np.float32)
    gated = pipe._gate_positives(probs, decisions, votes, stack,
                                 nbr_ids, nbr_scores)
    off = np.ones(N_OBS, bool)
    off[NF] = False
    assert not gated[:, off].any()
    assert gated[:, NF].all()

    pipe.stacker = keep
    gated = pipe._gate_positives(probs, decisions, votes, stack,
                                 nbr_ids, nbr_scores)
    assert gated.all()     # hand veto (p<=0.7, votes<6) would drop all

    # neighbour features missing -> falls back to the hand veto
    gated = pipe._gate_positives(probs, decisions, votes, stack,
                                 None, None)
    assert not gated[:, off].any()


def test_pipeline_end_to_end_with_stacker(cfg, dataset, tokenizer,
                                          tmp_path):
    """generate_report and the batched path run end-to-end with a
    stacker loaded (search depth widens to 20, scores captured)."""
    rng = np.random.default_rng(3)
    stack, labels, v10, v20, swv = _synthetic_features(rng, 64, m=1)
    th = np.full(N_OBS, 0.33, np.float32)
    st = fit_positive_keep_stacker(stack, labels, th, v10, v20, swv)
    pipe = _tiny_pipeline(cfg, dataset, tokenizer, stacker=st)
    s = dataset[0]
    out = pipe.generate_report(s["pixel_values"], s["clinical_context"])
    assert isinstance(out["report"], str)
    outs = pipe.generate_reports_batch(
        [dataset[i]["pixel_values"] for i in range(2)],
        [dataset[i]["clinical_context"] for i in range(2)])
    assert len(outs) == 2 and all(isinstance(o["report"], str)
                                  for o in outs)


def test_fit_cli_and_eval_knob(tmp_path):
    """fit_targeting_stacker CLI writes a loadable stacker (solo
    untrained expert — exercises the path, not the numbers) and
    evaluate_pipeline --targeting_stacker consumes it."""
    from radar_tpu.cli.fit_targeting_stacker import main as fit_main
    out = str(tmp_path / "stacker.json")
    rows = fit_main(["--synthetic", "--tiny", "--synthetic_size", "32",
                     "--num_samples", "8", "--passages", "16",
                     "--retrieval_checkpoint", str(tmp_path / "none"),
                     "--leakage_free", "--val_seed", "55",
                     "--output", out])
    assert "no_veto" in rows
    st = TargetingStacker.load(out)
    assert st.n_members == 1
    from radar_tpu.cli.evaluate_pipeline import main as eval_main
    r = eval_main(["--synthetic", "--tiny", "--synthetic_size", "32",
                   "--num_samples", "2", "--passages", "16",
                   "--retrieval_checkpoint", str(tmp_path / "none"),
                   "--targeting_stacker", out,
                   "--output_path", str(tmp_path / "pe.json")])
    assert np.isfinite(r["bleu_4"])


def test_fit_refuses_degenerate_region():
    """Advisor round-3: an (near-)empty fit region yields all-zero
    weights -> keep_probs 0.5 everywhere -> every positive dropped at
    tau=0.5.  The fit must refuse instead of saving that artifact."""
    rng = np.random.default_rng(2)
    stack, labels, v10, v20, swv = _synthetic_features(rng, 8)
    th = np.full(N_OBS, 0.999, np.float32)   # region ~empty
    with pytest.raises(ValueError, match="fit region"):
        fit_positive_keep_stacker(stack, labels, th, v10, v20, swv)


def test_feature_spec_tracks_vote_constants():
    """The swv depth is derived from SWV_TOP_M everywhere (advisor
    round-3: a hardcoded m==10 silently dropped the feature if
    VOTE_TOP_MS changed)."""
    from radar_tpu.pipeline.targeting import (FEATURE_SPEC, SWV_TOP_M,
                                              VOTE_TOP_MS)
    assert f"swv{SWV_TOP_M}" in FEATURE_SPEC
    for m in VOTE_TOP_MS:
        assert f"votes{m}" in FEATURE_SPEC


def test_standardization_roundtrips_and_scale_robustness(tmp_path):
    """The fitted feature scaler ships inside the stacker file and
    keep decisions are invariant to it being applied at serve time
    (fit/serve parity); loading a pre-scaler file (no feat_mean) still
    works."""
    rng = np.random.default_rng(3)
    stack, labels, v10, v20, swv = _synthetic_features(rng, 128)
    th = np.full(N_OBS, 0.33, np.float32)
    st = fit_positive_keep_stacker(stack, labels, th, v10, v20, swv)
    assert st.feat_mean is not None and st.feat_std is not None
    path = str(tmp_path / "st.json")
    st.save(path)
    st2 = TargetingStacker.load(path)
    np.testing.assert_allclose(st2.feat_mean, st.feat_mean)
    np.testing.assert_array_equal(st2.keep_mask(stack, v10, v20, swv),
                                  st.keep_mask(stack, v10, v20, swv))
    # legacy file without a scaler loads as identity
    payload = json.load(open(path))
    payload.pop("feat_mean"); payload.pop("feat_std")
    json.dump(payload, open(path, "w"))
    st3 = TargetingStacker.load(path)
    assert st3.feat_mean is None
    st3.keep_mask(stack, v10, v20, swv)  # still functional
