"""Resource path resolution: the 5-step search of app/deepseg.cc:292-347."""

import os

import pytest

from backscrub_tpu.models.specs import (resolve_model_path, resolve_path,
                                        search_candidates)


@pytest.fixture
def clean_env(monkeypatch, tmp_path):
    """Point every search root at empty temp dirs so only what the test
    creates can match."""
    monkeypatch.delenv("BACKSCRUB_PATH", raising=False)
    monkeypatch.delenv("BACKSCRUB_TPU_MODELS", raising=False)
    monkeypatch.delenv("BACKSCRUB_TPU_BACKGROUNDS", raising=False)
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "xdg"))
    monkeypatch.setenv("BACKSCRUB_INSTALL_PREFIX", str(tmp_path / "prefix"))
    return tmp_path


def test_uri_scheme_passthrough(clean_env):
    # >= 2 scheme chars (deepseg.cc:295-298): URLs pass, drive letters would
    assert resolve_path("https://example.com/bg.mp4", "backgrounds") == \
        "https://example.com/bg.mp4"
    assert resolve_path("v4l2src:/dev/video9", "models") == "v4l2src:/dev/video9"
    # single-char "scheme" is NOT a scheme (Windows drive letters)
    assert resolve_path("C:missing", "models") is None


def test_literal_path_first(clean_env, tmp_path):
    f = tmp_path / "m.tflite"
    f.write_bytes(b"x")
    assert resolve_path(str(f), "models") == str(f)


def test_path_separator_stops_search(clean_env, tmp_path, monkeypatch):
    # names with separators never fall through to the search roots
    # (deepseg.cc:303-305, "rule of least surprise")
    d = tmp_path / "root" / "models" / "sub"
    d.mkdir(parents=True)
    (d / "m.tflite").write_bytes(b"x")
    monkeypatch.setenv("BACKSCRUB_PATH", str(tmp_path / "root"))
    assert resolve_path("sub/m.tflite", "models") is None


def test_backscrub_path_type_subdir(clean_env, tmp_path, monkeypatch):
    # reference layout: $BACKSCRUB_PATH entries hold <type>/ subdirs
    # (deepseg.cc:306-314)
    d = tmp_path / "rootA" / "models"
    d.mkdir(parents=True)
    (d / "m.tflite").write_bytes(b"x")
    monkeypatch.setenv("BACKSCRUB_PATH",
                       f"{tmp_path / 'rootB'}:{tmp_path / 'rootA'}")
    assert resolve_path("m.tflite", "models") == str(d / "m.tflite")


def test_backscrub_path_flat_compat(clean_env, tmp_path, monkeypatch):
    # compatibility extension: a flat dir given directly also works
    d = tmp_path / "flat"
    d.mkdir()
    (d / "m.tflite").write_bytes(b"x")
    monkeypatch.setenv("BACKSCRUB_PATH", str(d))
    assert resolve_path("m.tflite", "models") == str(d / "m.tflite")


def test_xdg_step(clean_env, tmp_path):
    d = tmp_path / "xdg" / "backscrub" / "models"
    d.mkdir(parents=True)
    (d / "m.tflite").write_bytes(b"x")
    assert resolve_path("m.tflite", "models") == str(d / "m.tflite")


def test_install_prefix_step(clean_env, tmp_path):
    d = tmp_path / "prefix" / "share" / "backscrub" / "backgrounds"
    d.mkdir(parents=True)
    (d / "bg.png").write_bytes(b"x")
    assert resolve_path("bg.png", "backgrounds") == str(d / "bg.png")


def test_search_order_is_reference_order(clean_env, tmp_path, monkeypatch):
    """Enumerate the full candidate order: BACKSCRUB_PATH -> XDG -> install
    prefix -> package share/ -> package dev tree -> env extras."""
    monkeypatch.setenv("BACKSCRUB_PATH", "/bsp1:/bsp2")
    monkeypatch.setenv("BACKSCRUB_TPU_MODELS", "/extra")
    cands = search_candidates("m.tflite", "models")
    from backscrub_tpu.models.specs import _package_root
    root = _package_root()
    assert cands == [
        "/bsp1/models/m.tflite", "/bsp1/m.tflite",
        "/bsp2/models/m.tflite", "/bsp2/m.tflite",
        str(tmp_path / "xdg" / "backscrub" / "models" / "m.tflite"),
        str(tmp_path / "prefix" / "share" / "backscrub" / "models" / "m.tflite"),
        os.path.join(root, "share", "backscrub", "models", "m.tflite"),
        os.path.join(root, "models", "m.tflite"),
        "/extra/m.tflite",
    ]


def test_env_extra_root_is_last_resort(clean_env, tmp_path, monkeypatch):
    extra = tmp_path / "container"
    extra.mkdir()
    (extra / "m.tflite").write_bytes(b"x")
    monkeypatch.setenv("BACKSCRUB_TPU_MODELS", str(extra))
    assert resolve_path("m.tflite", "models") == str(extra / "m.tflite")
    # but an earlier step wins
    d = tmp_path / "xdg" / "backscrub" / "models"
    d.mkdir(parents=True)
    (d / "m.tflite").write_bytes(b"y")
    assert resolve_path("m.tflite", "models") == str(d / "m.tflite")


def test_resolve_model_path_raises_with_searched_roots(clean_env):
    with pytest.raises(FileNotFoundError) as e:
        resolve_model_path("definitely-not-a-model.tflite")
    assert "BACKSCRUB_PATH" in str(e.value)


def test_no_reference_hardcode_in_search(clean_env):
    """The bench-container crutch must come from env (entry points set it),
    never from a hardcoded search root in the library."""
    for c in search_candidates("m.tflite", "models"):
        assert not c.startswith("/root/reference"), c
