"""Model-acquisition tooling (tools/get_models.py) and repo-owned assets
(tools/gen_assets.py): the offline verify/install path and the generated
portrait/background files, so a fresh clone needs no mounted reference
(reference ships models in-repo, CMakeLists.txt:153-163 installs
backgrounds/ — these tools are our acquisition story for both)."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from conftest import (MODELS_DIR, background_image_path,
                      background_video_path, model_path, portrait_path)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import get_models  # noqa: E402


def test_catalog_covers_all_bundled_models():
    from backscrub_tpu.models.specs import BUNDLED_MODELS
    assert set(get_models.MODELS) == set(BUNDLED_MODELS)


def test_verify_accepts_canonical_bytes(tmp_path):
    name = "segm_lite_v681.tflite"
    src = model_path(name)
    get_models.verify(src, name)  # no raise


def test_verify_rejects_tampered_bytes(tmp_path):
    name = "segm_lite_v681.tflite"
    data = bytearray(open(model_path(name), "rb").read())
    data[100] ^= 0xFF
    bad = tmp_path / name
    bad.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        get_models.verify(str(bad), name)


def test_install_from_dir_and_structural_gate(tmp_path):
    """Offline path: verify + install + loader/geometry gate (the fetch leg
    is the same code with urlopen in front; exercised network-permitting)."""
    name = "segm_lite_v681.tflite"
    src_dir = os.path.dirname(model_path(name))
    rc = get_models.install_from_dir(src_dir, str(tmp_path), [name])
    assert rc == 0
    out = tmp_path / name
    assert out.exists()
    get_models.golden_gate(str(out), name)  # loader + geometry


def test_install_missing_file_fails(tmp_path):
    rc = get_models.install_from_dir(str(tmp_path), str(tmp_path),
                                     ["segm_lite_v681.tflite"])
    assert rc == 1


def test_cli_from_dir(tmp_path):
    """End-to-end CLI invocation of the offline install path."""
    name = "segm_lite_v681.tflite"
    src_dir = os.path.dirname(model_path(name))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "get_models.py"),
         "--from-dir", src_dir, "--dest", str(tmp_path), "--only", name],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, BACKSCRUB_TPU_PLATFORM="cpu"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / name).exists()


def test_check_offline_contract_passes():
    """--check --no-probe: the pinned URL/sha/size/geometry table is
    well-formed for every model (the offline leg of the fetch contract;
    the HEAD probe runs the same entries when a network exists)."""
    rc = get_models.check(list(get_models.MODELS), probe=False)
    assert rc == 0


def test_check_rejects_broken_contract(monkeypatch):
    name = "segm_lite_v681.tflite"
    broken = dict(get_models.MODELS[name], urls=["http://insecure/x.tflite"])
    monkeypatch.setitem(get_models.MODELS, name, broken)
    assert get_models.check([name], probe=False) == 1
    broken = dict(get_models.MODELS[name], sha256="deadbeef")
    monkeypatch.setitem(get_models.MODELS, name, broken)
    assert get_models.check([name], probe=False) == 1


def test_check_probe_tolerates_no_network(monkeypatch):
    """A network-unreachable probe must report, not fail (zero-egress
    container); only a reachable mirror with the wrong size fails."""
    monkeypatch.setattr(get_models, "_head_probe",
                        lambda url, size: "unreachable (URLError: egress)")
    assert get_models.check(["segm_lite_v681.tflite"], probe=True) == 0
    monkeypatch.setattr(get_models, "_head_probe",
                        lambda url, size: f"SIZE MISMATCH (1 != {size})")
    assert get_models.check(["segm_lite_v681.tflite"], probe=True) == 1


# ---------------------------------------------------------------------------
# repo-owned assets


def test_assets_exist_and_decode():
    portrait = portrait_path()
    img = cv2.imread(portrait)
    assert img is not None and img.shape == (720, 1280, 3)
    bg = cv2.imread(background_image_path())
    assert bg is not None and bg.shape == (720, 1280, 3)
    cap = cv2.VideoCapture(background_video_path())
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n >= 8  # animated: multiple decodable frames


def test_portrait_is_segmented_as_person():
    """The person-trained models must find a person in the synthetic
    portrait, so parity checks on it produce non-trivial masks.  DeepLab
    (VOC-trained on real photos) does not read the procedural portrait as
    a person — its content-agnostic gate is the 21-class argmax agreement
    (test below / bench --parity classmap_agreement)."""
    from backscrub_tpu.pipeline.maskgen import MaskGen
    from backscrub_tpu.models.specs import spec_for_model
    from conftest import ALL_MODELS

    frame = cv2.resize(cv2.imread(portrait_path()), (320, 240))
    for name in ALL_MODELS:
        if spec_for_model(name).kind == "deeplab":
            continue
        mg = MaskGen(model_path(name), 320, 240)
        for _ in range(3):  # let the EMA converge
            mask = mg.process(frame)
        frac = float((mask < 128).mean())
        # non-trivial (parity on this frame is not empty-vs-empty) without
        # demanding confident coverage — BodyPix's coarse 33x33 head sits
        # near its 0.65 threshold on the synthetic face (~1% of pixels)
        assert 0.005 < frac < 0.9, (name, frac)


def test_deeplab_classmap_agreement_on_portrait():
    """DeepLab parity on the portrait: full 21-way argmax agreement vs
    TFLite CPU (strong on any content, unlike person-IoU which is vacuous
    when no person is detected)."""
    from backscrub_tpu.models.specs import spec_for_model
    from backscrub_tpu.utils.parity import classmap_agreement

    p = model_path("deeplabv3_257_mv_gpu.tflite")
    frame = cv2.resize(cv2.imread(portrait_path()), (640, 480))
    agree = classmap_agreement(p, frame, 640, 480, spec_for_model(p))
    assert agree >= 0.995, agree


def test_background_frames_animate():
    from gen_assets import gen_background_frame
    a = gen_background_frame(0, 64, 48)
    b = gen_background_frame(5, 64, 48)
    assert a.shape == (48, 64, 3) and a.dtype == np.uint8
    assert not np.array_equal(a, b)
    # deterministic: same index -> same bytes
    np.testing.assert_array_equal(a, gen_background_frame(0, 64, 48))
