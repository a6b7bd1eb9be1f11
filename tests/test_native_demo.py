"""backscrub_native consumer binary: end-to-end subprocess test.

Runs the pure-C++ demo (native/demo.cc) standalone — its own process, its
own embedded CPython — and verifies its YUYV output is bit-exact with the
Python device path's math: regenerate the deterministic `test:` pattern,
take the masks the binary dumped, and recompute blend -> flip -> YUYV with
pipeline/image.py.  This is the only test that exercises Py_Initialize from
a non-Python host (test_capi.py attaches to the running interpreter).
"""

import os
import site
import subprocess

import numpy as np
import pytest

from conftest import model_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "native", "build", "backscrub_native")

W, H, FRAMES = 64, 48, 4


def make_pattern(frame: int, w: int = W, h: int = H) -> np.ndarray:
    """numpy transcription of demo.cc::test_pattern (change both together)."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    b = np.broadcast_to((x * 255) // max(w - 1, 1), (h, w))
    g = np.broadcast_to((y * 255) // max(h - 1, 1), (h, w))
    r = (x + y + 7 * frame) & 0xFF
    return np.stack([b, g, np.broadcast_to(r, (h, w))], axis=-1).astype(np.uint8)


@pytest.fixture(scope="module")
def demo_run(tmp_path_factory):
    if not os.path.exists(BIN):
        pytest.skip("backscrub_native not built")
    tmp = tmp_path_factory.mktemp("native_demo")
    out, maskdump = str(tmp / "out.yuyv"), str(tmp / "masks.raw")
    env = dict(os.environ)
    env["BACKSCRUB_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = ":".join([REPO] + site.getsitepackages())
    r = subprocess.run(
        [BIN, "-m", model_path("segm_lite_v681.tflite"), "--cg", f"{W}x{H}",
         "-n", str(FRAMES), "-H", "-v", out, "--dump-mask", maskdump],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    yuyv = np.fromfile(out, np.uint8)
    masks = np.fromfile(maskdump, np.uint8)
    assert yuyv.size == FRAMES * H * W * 2, r.stderr[-2000:]
    assert masks.size == FRAMES * H * W
    return (yuyv.reshape(FRAMES, H, 2 * W), masks.reshape(FRAMES, H, W))


def test_native_demo_bit_exact_vs_python_path(demo_run):
    from backscrub_tpu.pipeline.image import alpha_blend_u8, flip, rgb_to_yuyv

    yuyv, masks = demo_run
    bg = np.zeros((H, W, 3), np.uint8)
    bg[..., 1] = 255  # green-screen fallback, BGR
    for n in range(FRAMES):
        cam = make_pattern(n)
        comp = np.asarray(alpha_blend_u8(bg, cam, masks[n]))
        comp = np.asarray(flip(comp, horizontal=True))
        want = np.asarray(rgb_to_yuyv(comp, chroma_order="reference"))
        want = want.reshape(H, 2 * W)
        np.testing.assert_array_equal(yuyv[n], want)


def test_native_demo_masks_match_maskgen(demo_run):
    """The embedded interpreter's masks == in-process MaskGen masks
    (same EMA trajectory over the same frame sequence)."""
    from backscrub_tpu.pipeline.maskgen import MaskGen

    _, masks = demo_run
    mg = MaskGen(model_path("segm_lite_v681.tflite"), W, H)
    for n in range(FRAMES):
        ours = np.asarray(mg.process(make_pattern(n)))
        np.testing.assert_array_equal(masks[n], ours)


def test_native_demo_version():
    if not os.path.exists(BIN):
        pytest.skip("backscrub_native not built")
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join([REPO] + site.getsitepackages())
    r = subprocess.run([BIN, "--version"], env=env, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0
    assert "jax-" in r.stdout and "bsio" in r.stdout
    # "jax-unavailable" is the C-API's import-failure sentinel; seeing it
    # means the embedded interpreter couldn't import jax at all
    assert "jax-unavailable" not in r.stdout


def test_native_demo_bad_model_fails_cleanly():
    if not os.path.exists(BIN):
        pytest.skip("backscrub_native not built")
    env = dict(os.environ)
    env["BACKSCRUB_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = ":".join([REPO] + site.getsitepackages())
    r = subprocess.run([BIN, "-m", "/no/such.tflite", "-n", "1"],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "bs_maskgen_new failed" in r.stderr
