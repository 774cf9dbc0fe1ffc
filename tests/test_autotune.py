"""Persisted kernel autotune: cache write/read and env precedence."""

import json

import pytest

from metatrain_tpu.utils import autotune


@pytest.fixture
def cache(tmp_path, monkeypatch):
    path = tmp_path / "autotune.json"
    monkeypatch.setenv("MTT_AUTOTUNE_CACHE", str(path))
    monkeypatch.setattr(autotune, "device_kind", lambda: "TPU test kind")
    for knob in autotune.TUNED_KNOBS:
        monkeypatch.delenv(knob, raising=False)
    return path


def test_store_and_apply(cache, monkeypatch):
    env = {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "1", "MTT_INT8_SCORES": "1"}
    assert autotune.store_tuned_env(env, "qside+ext+i8", 55.0)
    data = json.loads(cache.read_text())
    assert data["TPU test kind"]["config"] == "qside+ext+i8"

    import os

    assert autotune.apply_tuned_config() == "qside+ext+i8"
    assert os.environ["MTT_INT8_SCORES"] == "1"
    assert os.environ["MTT_COLOR_EXT"] == "1"


def test_explicit_env_wins(cache, monkeypatch):
    autotune.store_tuned_env(
        {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "1", "MTT_INT8_SCORES": "1"},
        "qside+ext+i8",
    )
    monkeypatch.setenv("MTT_INT8_SCORES", "0")
    autotune.apply_tuned_config()
    import os

    assert os.environ["MTT_INT8_SCORES"] == "0"  # user pin respected
    assert os.environ["MTT_COLOR_EXT"] == "1"  # unset knob filled


def test_disabled_and_missing(cache, monkeypatch):
    assert autotune.apply_tuned_config() is None  # empty cache
    autotune.store_tuned_env({"MTT_QSIDE": "0"}, "kq")
    monkeypatch.setenv("MTT_AUTOTUNE", "0")
    assert autotune.apply_tuned_config() is None


def test_unknown_knobs_filtered(cache):
    autotune.store_tuned_env(
        {"MTT_QSIDE": "1", "SOME_RANDOM": "x"}, "qside"
    )
    env = autotune.load_tuned_env()
    assert env == {"MTT_QSIDE": "1"}


def test_corrupt_cache(cache):
    cache.write_text("{not json")
    assert autotune.apply_tuned_config() is None
    assert autotune.load_tuned_env() is None
