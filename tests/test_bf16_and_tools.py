"""bf16 fast-path fidelity + side-tool smoke tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from backscrub_tpu.pipeline.maskgen import MaskGen

from conftest import model_path

from conftest import background_image_path, portrait_path

SCREENSHOT = portrait_path()


def iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return 1.0 if union == 0 else inter / union


def test_bf16_mask_close_to_f32():
    """The bfloat16 MXU fast path must stay within the IoU budget."""
    frame = cv2.imread(SCREENSHOT)
    if frame is None:
        pytest.skip("asset missing")
    frame = cv2.resize(frame, (640, 480))
    path = model_path("segm_lite_v681.tflite")
    mg32 = MaskGen(path, 640, 480)
    mg16 = MaskGen(path, 640, 480, compute_dtype=jnp.bfloat16,
                   precision=jax.lax.Precision.DEFAULT)
    for _ in range(4):
        m32 = mg32.process(frame)
        m16 = mg16.process(frame)
    score = iou(m32 < 128, m16 < 128)
    assert score >= 0.98, f"bf16 IoU vs f32 = {score:.4f}"


def test_chroma_key():
    from tools.transparent_viewer import chroma_key_green
    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = (0, 255, 0)   # pure green -> transparent
    img[1, 1] = (10, 255, 0)  # not pure -> opaque
    bgra = chroma_key_green(img)
    assert bgra.shape == (4, 4, 4)
    assert bgra[0, 0, 3] == 0
    assert bgra[1, 1, 3] == 255


def test_distill_example_runs(tmp_path):
    """The cross-model distillation example (teacher labels -> student
    fine-tune -> checkpoint/resume -> export) completes and improves
    teacher agreement."""
    out = str(tmp_path / "student.tflite")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               BACKSCRUB_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "examples/distill.py", "6", out],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]
    assert "teacher-agreement" in r.stdout
    assert os.path.exists(out)


def test_minimal_demo_runs(tmp_path):
    out = str(tmp_path / "demo.png")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               BACKSCRUB_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "examples/minimal_demo.py", SCREENSHOT,
         background_image_path(), out],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]
    img = cv2.imread(out)
    assert img is not None and img.shape == (480, 640, 3)


def test_minimal_demo_runs_without_reference_mount(tmp_path):
    """The fresh-clone story: models installed via get_models --from-dir
    into a local dir, BACKSCRUB_TPU_MODELS absent, no CLI args (repo-owned
    assets) — the first command works with no mounted reference."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import get_models
    name = "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite"
    mdir = tmp_path / "models"
    rc = get_models.install_from_dir(os.path.dirname(model_path(name)),
                                     str(mdir), [name])
    assert rc == 0
    env = {k: v for k, v in os.environ.items()
           if k not in ("BACKSCRUB_TPU_MODELS", "BACKSCRUB_PATH")}
    env.update(JAX_PLATFORMS="cpu", BACKSCRUB_TPU_PLATFORM="cpu",
               BACKSCRUB_PATH=str(tmp_path))  # <root>/models/<name>
    r = subprocess.run(
        [sys.executable, "examples/minimal_demo.py"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert r.returncode == 0, r.stderr[-800:]
    assert "/root/reference" not in (r.stdout + r.stderr)
    img = cv2.imread(os.path.join(repo, "demo_out.png"))
    assert img is not None and img.shape == (480, 640, 3)
    os.remove(os.path.join(repo, "demo_out.png"))


def test_per_family_precision_defaults():
    """precision=None resolves to ModelSpec.mxu_precision: the FLOP-heavy
    257x257 families (deeplab/bodypix) default to HIGH (3-pass bf16 MXU,
    decode-margin evidence in tools/prec_parity.py), the tiny families to
    HIGHEST; an explicit precision always wins."""
    from backscrub_tpu.models.specs import BUNDLED_MODELS, spec_for_model
    from backscrub_tpu.models.specs import resolve_model_path

    by_kind = {}
    for name in BUNDLED_MODELS:
        p = resolve_model_path(name)
        by_kind[spec_for_model(p).kind] = p
    mg = MaskGen(by_kind["deeplab"], 160, 120)
    assert mg.precision == jax.lax.Precision.HIGH
    assert mg.model.precision_setting == jax.lax.Precision.HIGH
    mg = MaskGen(by_kind["bodypix"], 160, 120)
    assert mg.precision == jax.lax.Precision.HIGH
    mg = MaskGen(by_kind["meet"], 160, 120)
    assert mg.precision == jax.lax.Precision.HIGHEST
    mg = MaskGen(by_kind["deeplab"], 160, 120,
                 precision=jax.lax.Precision.HIGHEST)
    assert mg.precision == jax.lax.Precision.HIGHEST
