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
