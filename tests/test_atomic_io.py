"""Atomic artifact writes (snapshot hygiene, round-3 verdict item 8)."""

import json
import os

import pytest

from radar_tpu.utils.io import atomic_write_json


def test_atomic_write_roundtrip(tmp_path):
    p = tmp_path / "sub" / "artifact.json"  # parent dir auto-created
    atomic_write_json(str(p), {"a": 1, "b": [1, 2]}, indent=2)
    assert json.load(open(p)) == {"a": 1, "b": [1, 2]}
    # no temp droppings left behind
    assert os.listdir(p.parent) == ["artifact.json"]


def test_atomic_write_replaces_existing(tmp_path):
    p = str(tmp_path / "a.json")
    atomic_write_json(p, {"v": 1})
    atomic_write_json(p, {"v": 2})
    assert json.load(open(p)) == {"v": 2}


def test_failed_serialization_leaves_old_artifact(tmp_path):
    p = str(tmp_path / "a.json")
    atomic_write_json(p, {"v": 1})
    with pytest.raises(TypeError):
        atomic_write_json(p, {"v": object()})
    # old artifact intact, no temp files
    assert json.load(open(p)) == {"v": 1}
    assert os.listdir(tmp_path) == ["a.json"]
