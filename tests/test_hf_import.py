"""HF weight-import equivalence: a randomly-initialised local
``transformers.ViTModel`` must produce (numerically) the same outputs
as our ``VisionTransformer`` under the converted params. No downloads."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_vit_import_forward_equivalence():
    import jax.numpy as jnp

    from radar_tpu.models.vision import VisionTransformer
    from radar_tpu.utils.hf_import import import_vision_tower

    hf_config = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, num_channels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf_model = transformers.ViTModel(hf_config,
                                     add_pooling_layer=True).eval()

    cfg, params = import_vision_tower(hf_model)
    model = VisionTransformer(cfg)

    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf_model(
            pixel_values=torch.tensor(images.transpose(0, 3, 1, 2)))
    ours = model.apply({"params": params}, jnp.asarray(images))

    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(), atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(ours["pooler_output"]),
        hf_out.pooler_output.numpy(), atol=2e-3, rtol=2e-2)


def test_swinv2_import_forward_equivalence():
    """Shifted windows, patch merging, cosine attention and log-CPB all
    line up with ``transformers.Swinv2Model`` under imported weights —
    the reference's real backbone (``train_expert_models.py:555``)."""
    import jax.numpy as jnp

    from radar_tpu.models.swin import SwinV2Transformer
    from radar_tpu.utils.hf_import import import_swinv2_tower

    hf_config = transformers.Swinv2Config(
        image_size=32, patch_size=4, embed_dim=24,
        depths=[2, 2], num_heads=[2, 4], window_size=4,
        mlp_ratio=2.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    torch.manual_seed(0)
    hf_model = transformers.Swinv2Model(hf_config,
                                        add_pooling_layer=True).eval()

    cfg, params = import_swinv2_tower(hf_model)
    assert cfg.arch == "swinv2" and cfg.depths == (2, 2)
    model = SwinV2Transformer(cfg)

    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf_model(
            pixel_values=torch.tensor(images.transpose(0, 3, 1, 2)))
    ours = model.apply({"params": params}, jnp.asarray(images))

    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(), atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(ours["pooler_output"]),
        hf_out.pooler_output.numpy(), atol=2e-3, rtol=2e-2)


def test_swinv2_shifted_window_path_differs_and_is_stable():
    """The 8x8-grid config exercises real shifted windows (grid >
    window); outputs must be finite and shift masks must matter."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.core.config import VisionConfig
    from radar_tpu.models.swin import SwinV2Transformer, _shift_mask

    cfg = VisionConfig(image_size=32, patch_size=4, hidden_size=16,
                       num_heads=2, arch="swinv2", depths=(2,),
                       stage_heads=(2,), window_size=4, mlp_ratio=2.0)
    model = SwinV2Transformer(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out["last_hidden_state"])).all()
    # grid 8x8, window 4, shift 2 -> cross-region pairs masked
    m = _shift_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == -100.0).any() and (m == 0.0).any()


def test_bert_import_forward_equivalence():
    import jax.numpy as jnp

    from radar_tpu.models.bert import BertTextEncoder, import_text_tower

    hf_config = transformers.BertConfig(
        vocab_size=100, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf_model = transformers.BertModel(hf_config,
                                      add_pooling_layer=True).eval()
    cfg, params = import_text_tower(hf_model)
    model = BertTextEncoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0

    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask))
    ours = model.apply({"params": params}, jnp.asarray(ids),
                       jnp.asarray(mask))
    # compare non-padded positions only (HF computes pads too but they
    # are meaningless downstream)
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"])[0],
        hf_out.last_hidden_state.numpy()[0], atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"])[1, :10],
        hf_out.last_hidden_state.numpy()[1, :10], atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(ours["pooler_output"]),
        hf_out.pooler_output.numpy(), atol=2e-3, rtol=2e-2)


def test_embedder_warm_start_from_hf_towers():
    """BiomedCLIP-role warm start: imported ViT+BERT tower weights graft
    into the retrieval embedder and drive its encode paths."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.core.config import RetrievalConfig, TextConfig
    from radar_tpu.data.tokenizer import Tokenizer
    from radar_tpu.models.bert import import_text_tower
    from radar_tpu.retrieval.embedder import JittedEmbedder
    from radar_tpu.utils.hf_import import (import_vision_tower,
                                           warm_start_embedder_params)

    torch.manual_seed(0)
    vit = transformers.ViTModel(transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128)).eval()
    bert = transformers.BertModel(transformers.BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64)).eval()

    vcfg, vparams = import_vision_tower(vit)
    tcfg, tparams = import_text_tower(bert)
    rcfg = RetrievalConfig(embedding_dim=32, capacity=64,
                           max_passage_tokens=16)
    tok = Tokenizer.clinical_default(tcfg.vocab_size)
    emb = JittedEmbedder.create(vcfg, tcfg, rcfg, tok)
    emb.params = warm_start_embedder_params(emb.params, vparams, tparams)

    e_img = emb.embed_images([np.zeros((32, 32, 3), np.float32)])
    e_txt = emb.embed_texts(["pleural effusion"])
    assert e_img.shape == (1, 32) and e_txt.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(e_img, axis=-1), 1.0,
                               rtol=1e-4)
    # the grafted towers actually contribute: swapping them back to the
    # fresh init must change the embedding
    fresh = JittedEmbedder.create(vcfg, tcfg, rcfg, tok)
    f_txt = fresh.embed_texts(["pleural effusion"])
    assert not np.allclose(e_txt, f_txt)


def test_swinv2_as_expert_vision_tower(cfg):
    """arch='swinv2' drops into the expert towers via the factory and
    supports forward + one grad step."""
    import jax
    import jax.numpy as jnp
    import optax

    from radar_tpu.models.experts import create_model

    vcfg = cfg.vision.override(arch="swinv2", patch_size=8,
                               hidden_size=32, depths=(1, 1),
                               stage_heads=(2, 4), window_size=4)
    model = create_model("baseline", vcfg, cfg.text, cfg.expert)
    pv = jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3),
                   jnp.float32)
    ids = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.key(0), pv, ids, mask)["params"]
    logits = jax.jit(lambda p: model.apply(
        {"params": p}, pv, ids, mask, deterministic=True))(params)
    assert logits.shape == (2, 14)

    def loss(p):
        lg = model.apply({"params": p}, pv, ids, mask,
                         deterministic=True)
        return optax.sigmoid_binary_cross_entropy(
            lg, jnp.zeros_like(lg)).mean()

    grads = jax.jit(jax.grad(loss))(params)
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_import_weights_cli(tmp_path):
    """End-to-end: save local HF models, run the import CLI, reload the
    Orbax params into our towers and forward."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.cli.import_weights import main
    from radar_tpu.core.checkpoint import load_params
    from radar_tpu.core.config import TextConfig, VisionConfig
    from radar_tpu.models.bert import BertTextEncoder
    from radar_tpu.models.vision import VisionTransformer

    torch.manual_seed(0)
    vit = transformers.ViTModel(transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128))
    vit.save_pretrained(tmp_path / "vit")
    bert = transformers.BertModel(transformers.BertConfig(
        vocab_size=100, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=32))
    bert.save_pretrained(tmp_path / "bert")

    out = tmp_path / "imported"
    summary = main(["--vision", str(tmp_path / "vit"),
                    "--text", str(tmp_path / "bert"),
                    "--output", str(out)])
    assert summary["vision"]["depth"] == 2
    assert summary["text"]["vocab_size"] == 100

    vcfg = VisionConfig.from_yaml(str(out / "vision_config.yaml"))
    vparams = load_params(str(out / "vision"))
    model = VisionTransformer(vcfg)
    o = model.apply({"params": vparams},
                    jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert o["pooler_output"].shape == (1, 64)

    tcfg = TextConfig.from_yaml(str(out / "text_config.yaml"))
    tparams = load_params(str(out / "text"))
    tmodel = BertTextEncoder(tcfg)
    o = tmodel.apply({"params": tparams},
                     jnp.zeros((1, 16), jnp.int32),
                     jnp.ones((1, 16), jnp.int32))
    assert o["pooler_output"].shape == (1, 64)


def test_expert_warm_start_cli(tmp_path):
    """--init_towers: train_expert_models adopts imported tower configs
    and grafts imported HF weights into the expert before training."""
    import jax
    import numpy as np

    from radar_tpu.cli.import_weights import main as import_main
    from radar_tpu.core.checkpoint import load_params
    from radar_tpu.core.config import tiny_config
    from radar_tpu.utils.hf_import import (adopt_tower_configs,
                                           graft_tower_params)

    torch.manual_seed(0)
    vit = transformers.ViTModel(transformers.ViTConfig(
        image_size=64, patch_size=16, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128))
    vit.save_pretrained(tmp_path / "vit")
    bert = transformers.BertModel(transformers.BertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64))
    bert.save_pretrained(tmp_path / "bert")
    out = tmp_path / "imported"
    import_main(["--vision", str(tmp_path / "vit"),
                 "--text", str(tmp_path / "bert"),
                 "--output", str(out)])

    cfg = adopt_tower_configs(tiny_config(), str(out))
    assert cfg.vision.hidden_size == 64 and cfg.vision.depth == 2
    assert cfg.text.arch == "bert" and cfg.text.vocab_size == 512

    from radar_tpu.models.experts import create_model
    model = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    pv = np.zeros((2, 64, 64, 3), np.float32)
    ids = np.zeros((2, 16), np.int32)
    mask = np.ones((2, 16), np.int32)
    params = model.init(jax.random.key(0), pv, ids, mask)["params"]
    grafted = graft_tower_params(jax.device_get(params), str(out))
    want = load_params(str(out / "vision"))
    got = grafted["towers"]["vision"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(want)[0]),
        np.asarray(jax.tree_util.tree_leaves(got)[0]))
    # grafted params still forward
    logits = model.apply({"params": grafted}, pv, ids, mask,
                         deterministic=True)
    assert np.all(np.isfinite(np.asarray(logits)))

    # geometry mismatch is caught loudly
    from radar_tpu.core.config import tiny_config as tc
    bad = create_model("baseline", tc().vision, tc().text, tc().expert)
    bad_params = bad.init(jax.random.key(0),
                          np.zeros((1, 64, 64, 3), np.float32),
                          ids[:1], mask[:1])["params"]
    with pytest.raises(ValueError, match="geometry"):
        graft_tower_params(jax.device_get(bad_params), str(out))
