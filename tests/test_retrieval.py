"""Retrieval subsystem tests: exactness of the sharded on-device top-k
index vs brute force, hybrid observation-aware scoring, hard negatives,
and the DPR facade round trip."""

import numpy as np
import pytest

from radar_tpu.core.config import RetrievalConfig, tiny_config
from radar_tpu.retrieval.dpr import create_dpr_model
from radar_tpu.retrieval.index import ShardedIndex


def _random_embeddings(n, d, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_index_matches_bruteforce():
    cfg = RetrievalConfig(embedding_dim=32, capacity=128, top_k=5)
    idx = ShardedIndex(cfg)
    emb = _random_embeddings(100, 32)
    idx.add(emb)
    q = _random_embeddings(7, 32, seed=1)
    scores, ids = idx.search(q, k=5)
    ref = q @ emb.T
    ref_ids = np.argsort(-ref, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(
        scores, np.take_along_axis(ref, ref_ids, axis=1), rtol=1e-5)


def test_search_executable_cached_per_k():
    """Regression: serving alternates the corroboration neighbour
    search (top_m) with the RAG top_k every call — the jitted search
    must be cached per k, not rebuilt on every flip, and stay exact."""
    cfg = RetrievalConfig(embedding_dim=32, capacity=128, top_k=5)
    idx = ShardedIndex(cfg)
    emb = _random_embeddings(100, 32)
    idx.add(emb)
    q = _random_embeddings(4, 32, seed=2)
    ref = np.argsort(-(q @ emb.T), axis=1)
    for k in (5, 10, 5, 10):
        _, ids = idx.search(q, k=k)
        np.testing.assert_array_equal(ids, ref[:, :k])
    assert set(idx._search_fns) == {5, 10}
    fn5 = idx._search_fns[5]
    idx.search(q, k=5)
    assert idx._search_fns[5] is fn5   # not rebuilt on reuse


def test_sharded_index_matches_unsharded(mesh_data):
    cfg = RetrievalConfig(embedding_dim=32, capacity=128, top_k=5)
    emb = _random_embeddings(100, 32)
    q = _random_embeddings(7, 32, seed=1)
    plain = ShardedIndex(cfg)
    plain.add(emb)
    sharded = ShardedIndex(cfg, mesh_data)
    sharded.add(emb)
    s0, i0 = plain.search(q, k=5)
    s1, i1 = sharded.search(q, k=5)
    np.testing.assert_allclose(s0, s1, rtol=1e-5)
    np.testing.assert_array_equal(i0, i1)


def test_padding_rows_never_returned():
    cfg = RetrievalConfig(embedding_dim=16, capacity=64, top_k=10)
    idx = ShardedIndex(cfg)
    idx.add(_random_embeddings(4, 16))
    scores, ids = idx.search(_random_embeddings(2, 16, seed=3), k=10)
    assert (ids[:, 4:] == -1).all()       # only 4 valid rows
    assert set(ids[:, :4].flatten().tolist()) == {0, 1, 2, 3}


def test_capacity_overflow_raises():
    cfg = RetrievalConfig(embedding_dim=8, capacity=16)
    idx = ShardedIndex(cfg)
    idx.add(_random_embeddings(16, 8))
    with pytest.raises(ValueError, match="capacity"):
        idx.add(_random_embeddings(1, 8))


def test_hybrid_observation_scoring_changes_ranking():
    cfg = RetrievalConfig(embedding_dim=16, capacity=64, top_k=3,
                          hybrid_alpha=0.5)
    idx = ShardedIndex(cfg)
    rng = np.random.default_rng(0)
    emb = _random_embeddings(20, 16)
    obs = np.zeros((20, 14), np.float32)
    obs[7, 1] = 1.0  # passage 7 mentions Cardiomegaly
    idx.add(emb, obs)
    q = emb[3:4] + 0.01 * rng.normal(size=(1, 16)).astype(np.float32)
    q_obs = np.zeros((1, 14), np.float32)
    q_obs[0, 1] = 1.0  # query asks about Cardiomegaly
    _, ids_sem = idx.search(q, k=3)
    _, ids_hyb = idx.search(q, k=3, query_observations=q_obs)
    assert ids_sem[0, 0] == 3              # semantic: nearest neighbour
    assert 7 in ids_hyb[0].tolist()        # hybrid promotes obs match


def test_hard_negatives_are_next_ranks():
    cfg = RetrievalConfig(embedding_dim=16, capacity=64, top_k=3)
    idx = ShardedIndex(cfg)
    emb = _random_embeddings(30, 16)
    idx.add(emb)
    q = _random_embeddings(1, 16, seed=2)
    (pv, pi), (nv, ni) = idx.search_with_hard_negatives(
        q, k=3, num_negatives=2)
    full_s, full_i = idx.search(q, k=5)
    np.testing.assert_array_equal(pi, full_i[:, :3])
    np.testing.assert_array_equal(ni, full_i[:, 3:])
    assert (pv.min() >= nv.max())


def test_dpr_facade_roundtrip():
    cfg = tiny_config()
    dpr = create_dpr_model(cfg)
    passages = [
        "Cardiomegaly with enlarged cardiac silhouette",
        "Pneumothorax with air in the pleural space",
        "Pleural effusion with fluid in the pleural cavity",
        "No finding with normal chest radiograph appearance",
        "Consolidation with dense opacification of lung tissue",
    ]
    n = dpr.build_retrieval_database(passages)
    assert n == 5 and dpr.index.count == 5
    results = dpr.retrieve_for_text(passages[1], k=3)
    assert results[0]["passage"] == passages[1]   # self-retrieval top-1
    assert results[0]["rank"] == 0
    # image query executes end-to-end
    img = np.random.default_rng(0).normal(
        0.5, 0.3, (cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    img_results = dpr.retrieve_for_image(img, k=2)
    assert len(img_results) == 2
    pos, neg = dpr.retrieve_with_hard_negatives(passages[0], k=2,
                                                num_negatives=2)
    assert len(pos) == 2 and len(neg) == 2


def test_relevance_curve_strict_headline():
    """Verdict r3 weak #5: jaccard>=0.5 saturated (284.6 relevant per
    query).  The evaluator now reports a strictness ladder and headlines
    the exact-set definition; exact-set relevant sets must be subsets of
    the looser ones, and the headline must equal the strictest entry."""
    import numpy as np
    from radar_tpu.eval.retrieval_eval import (RELEVANCE_TAUS,
                                               relevance_sets)

    rng = np.random.default_rng(0)
    q = (rng.uniform(size=(16, 14)) < 0.25).astype(np.float32)
    p = (rng.uniform(size=(64, 14)) < 0.25).astype(np.float32)
    loose = relevance_sets(q, p, min_jaccard=0.5)
    strict = relevance_sets(q, p, min_jaccard=1.0)
    for s, l in zip(strict, loose):
        assert s <= l
    # exact-set means identical pathology sets
    for qi, row in enumerate(strict):
        for pj in row:
            assert (q[qi, :13] == p[pj, :13]).all()
    assert RELEVANCE_TAUS[-1] == 1.0


def test_dpr_evaluator_curve_structure(cfg, tokenizer):
    import numpy as np
    from radar_tpu.eval.retrieval_eval import DPREvaluator, _tau_name
    from radar_tpu.retrieval.dpr import create_dpr_model

    rng = np.random.default_rng(0)
    n, nq = 48, 8
    dpr = create_dpr_model(cfg, tokenizer)
    passages = [f"passage about finding {i % 5}" for i in range(n)]
    plabels = (rng.uniform(size=(n, 14)) < 0.3).astype(np.float32)
    dpr.build_retrieval_database(passages, plabels)
    qlabels = plabels[:nq]
    rep = DPREvaluator(dpr).evaluate(
        [f"query about finding {i % 5}" for i in range(nq)],
        qlabels, plabels)
    assert set(rep["relevance_curve"]) == {"jaccard_0.5", "jaccard_0.75",
                                           "exact_set"}
    # headline == strictest entry
    strict = rep["relevance_curve"]["exact_set"]
    assert rep["mean_reciprocal_rank"] == strict["mean_reciprocal_rank"]
    assert rep["relevance"].startswith("exact")
    # monotone: stricter relevance cannot have MORE relevant passages
    assert (strict["mean_relevant_per_query"]
            <= rep["relevance_curve"]["jaccard_0.5"]
                  ["mean_relevant_per_query"])
    assert _tau_name(1.0) == "exact_set"


def test_embedder_obs_head_round_trip(cfg, tokenizer):
    """retrieval.obs_head=True adds an image->observation head to the
    embedder param tree (initialized through __call__ so save/restore
    templates are complete), embed_images_with_obs returns probs, and
    the eval path scores image queries with the hybrid rule."""
    import dataclasses
    import jax

    from radar_tpu.retrieval.embedder import JittedEmbedder

    c = dataclasses.replace(
        cfg, retrieval=dataclasses.replace(cfg.retrieval, obs_head=True,
                                           capacity=64))
    emb = JittedEmbedder.create(c.vision, c.text, c.retrieval, tokenizer,
                                rng=jax.random.key(0))
    assert emb.has_obs_head
    assert "obs_head" in emb.params
    imgs = [np.zeros((c.vision.image_size, c.vision.image_size, 3),
                     np.float32) for _ in range(3)]
    e, p = emb.embed_images_with_obs(imgs)
    assert e.shape == (3, c.retrieval.embedding_dim)
    assert p.shape == (3, 14) and (p >= 0).all() and (p <= 1).all()

    # plain embedder refuses the joint call
    emb2 = JittedEmbedder.create(cfg.vision, cfg.text, cfg.retrieval,
                                 tokenizer, rng=jax.random.key(0))
    assert not emb2.has_obs_head
    with pytest.raises(ValueError, match="obs_head"):
        emb2.embed_images_with_obs(imgs)


def test_apply_embedder_meta_round_trip(tmp_path, cfg):
    """embedder_meta.json written at train time flips obs_head at
    restore sites; absence or garbage leaves the config unchanged."""
    import json

    from radar_tpu.cli.common import apply_embedder_meta

    assert apply_embedder_meta(cfg, str(tmp_path)).retrieval.obs_head \
        is False
    (tmp_path / "embedder_meta.json").write_text(
        json.dumps({"obs_head": True, "objective": "exact"}))
    c2 = apply_embedder_meta(cfg, str(tmp_path))
    assert c2.retrieval.obs_head is True
    (tmp_path / "embedder_meta.json").write_text("not json")
    assert apply_embedder_meta(cfg, str(tmp_path)).retrieval.obs_head \
        is False
