"""Config-system tests: the shipped YAMLs must load, overrides apply,
unknown keys are rejected, round-trips are lossless."""

import os

import pytest

from radar_tpu.core.config import (RadarConfig, serving_config,
                                   tiny_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("name", ["radar.yaml"])
def test_shipped_yaml_loads(name):
    cfg = RadarConfig.from_yaml(os.path.join(REPO, "configs", name))
    assert cfg.expert.num_observations == 14
    assert cfg.vision.image_size % cfg.vision.patch_size == 0


def test_roundtrip(tmp_path):
    cfg = tiny_config()
    path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(path)
    loaded = RadarConfig.from_yaml(path)
    assert loaded == cfg


def test_override_paths():
    cfg = RadarConfig()
    cfg2 = cfg.override(**{"vision.depth": 4, "train.learning_rate": 3e-4})
    assert cfg2.vision.depth == 4
    assert cfg2.train.learning_rate == 3e-4
    assert cfg.vision.depth == 12  # original untouched
    with pytest.raises(KeyError):
        cfg.override(**{"vision.not_a_field": 1})


def test_unknown_keys_rejected():
    with pytest.raises(KeyError, match="unknown config key"):
        RadarConfig.from_dict({"vision": {"bogus": 3}})


def test_presets_consistent():
    for cfg in (tiny_config(), serving_config()):
        assert cfg.vision.hidden_size % cfg.vision.num_heads == 0
        assert cfg.text.hidden_size % cfg.text.num_heads == 0
        assert cfg.decoder.hidden_size % cfg.decoder.num_heads == 0
