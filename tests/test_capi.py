"""C ABI tests: drive native/libbackscrub.so through ctypes.

The shared object embeds CPython; loaded from within a Python process it
attaches to the running interpreter, so the full path (context creation,
frame -> mask marshalling, callbacks) is exercised in-suite.
"""

import ctypes
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from conftest import model_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "build", "libbackscrub.so")


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB):
        pytest.skip("libbackscrub.so not built")
    lib = ctypes.CDLL(LIB)
    lib.bs_tensorflow_version.restype = ctypes.c_char_p
    lib.bs_maskgen_new.restype = ctypes.c_void_p
    lib.bs_maskgen_new.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.c_size_t, ctypes.c_size_t] + \
        [ctypes.c_void_p] * 5
    lib.bs_maskgen_process.restype = ctypes.c_bool
    lib.bs_maskgen_process.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p]
    lib.bs_maskgen_delete.argtypes = [ctypes.c_void_p]
    return lib


def test_version(lib):
    assert lib.bs_tensorflow_version().startswith(b"jax-")


def test_maskgen_lifecycle(lib):
    path = model_path("segm_lite_v681.tflite").encode()
    ctx = lib.bs_maskgen_new(path, 2, 64, 48, None, None, None, None, None)
    assert ctx
    frame = np.ascontiguousarray(
        np.random.default_rng(0).integers(0, 256, (48, 64, 3), np.uint8))
    mask = np.zeros((48, 64), np.uint8)
    ok = lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
    assert ok
    assert mask.max() > 0  # something was written
    lib.bs_maskgen_delete(ctx)


def test_stage_callbacks_fire_in_order_and_match_fused(lib):
    """onprep/oninfer/onmask all fire per frame through the C ABI
    (reference contract lib/libbackscrub.h:24-30, invoked at
    lib/libbackscrub.cc:303,311,363), and the staged-mode masks are
    identical to fused-mode masks."""
    path = model_path("segm_lite_v681.tflite").encode()
    frames = [np.ascontiguousarray(
        np.random.default_rng(i).integers(0, 256, (48, 64, 3), np.uint8))
        for i in range(3)]

    counts = {"prep": 0, "infer": 0, "mask": 0}
    order = []
    CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p)

    def mk(name):
        def cb(_ctx):
            counts[name] += 1
            order.append(name)
        return CB(cb)

    onprep, oninfer, onmask = mk("prep"), mk("infer"), mk("mask")

    ctx = lib.bs_maskgen_new(
        path, 2, 64, 48, None,
        ctypes.cast(onprep, ctypes.c_void_p),
        ctypes.cast(oninfer, ctypes.c_void_p),
        ctypes.cast(onmask, ctypes.c_void_p), None)
    assert ctx
    staged_masks = []
    for frame in frames:
        mask = np.zeros((48, 64), np.uint8)
        assert lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
        staged_masks.append(mask)
    lib.bs_maskgen_delete(ctx)

    assert counts == {"prep": 3, "infer": 3, "mask": 3}
    assert order == ["prep", "infer", "mask"] * 3

    # fused-mode (no stage hooks) masks must be identical
    ctx = lib.bs_maskgen_new(path, 2, 64, 48, None, None, None, None, None)
    assert ctx
    for frame, staged in zip(frames, staged_masks):
        mask = np.zeros((48, 64), np.uint8)
        assert lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
        np.testing.assert_array_equal(mask, staged)
    lib.bs_maskgen_delete(ctx)


def test_onmask_fires_in_fused_mode(lib):
    """With only onmask set the fused single-dispatch path is kept and the
    hook still fires per frame."""
    path = model_path("segm_lite_v681.tflite").encode()
    hits = []
    CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p)
    onmask = CB(lambda _ctx: hits.append(1))
    ctx = lib.bs_maskgen_new(path, 2, 64, 48, None, None, None,
                             ctypes.cast(onmask, ctypes.c_void_p), None)
    assert ctx
    frame = np.ascontiguousarray(
        np.random.default_rng(7).integers(0, 256, (48, 64, 3), np.uint8))
    mask = np.zeros((48, 64), np.uint8)
    assert lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
    assert lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
    lib.bs_maskgen_delete(ctx)
    assert len(hits) == 2


def test_maskgen_new_failure_returns_null(lib):
    ctx = lib.bs_maskgen_new(b"/no/such/model.tflite", 2, 64, 48,
                             None, None, None, None, None)
    assert not ctx


def _new_ex(lib):
    lib.bs_maskgen_new_ex.restype = ctypes.c_void_p
    lib.bs_maskgen_new_ex.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_size_t, ctypes.c_size_t,
                                      ctypes.c_char_p] + \
        [ctypes.c_void_p] * 5
    return lib.bs_maskgen_new_ex


def test_new_ex_options_match_python_pipeline_bytes(lib):
    """bs_maskgen_new_ex carries -p-namespace options (refine/morph) into
    the pipeline: a native morph+guided consumer's masks are byte-identical
    to the Python MaskGen with the same settings (VERDICT r2 item 5;
    reference contract lib/libbackscrub.h:13-39)."""
    from backscrub_tpu.pipeline.maskgen import MaskGen

    new_ex = _new_ex(lib)
    path = model_path("segm_lite_v681.tflite").encode()
    ctx = new_ex(path, 2, 64, 48, b"refine:guided,morph:open:3",
                 None, None, None, None, None)
    assert ctx
    ref = MaskGen(model_path("segm_lite_v681.tflite"), 64, 48,
                  refine="guided", morph="open:3")
    rng = np.random.default_rng(11)
    for i in range(3):
        frame = np.ascontiguousarray(rng.integers(0, 256, (48, 64, 3), np.uint8))
        mask = np.zeros((48, 64), np.uint8)
        assert lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
        np.testing.assert_array_equal(mask, ref.process(frame))
    lib.bs_maskgen_delete(ctx)


def test_new_ex_u8exact_and_morph(lib):
    """u8exact + morph through the options string matches the Python
    u8_exact_post pipeline byte-for-byte."""
    from backscrub_tpu.pipeline.maskgen import MaskGen

    new_ex = _new_ex(lib)
    path = model_path("segm_lite_v681.tflite").encode()
    ctx = new_ex(path, 2, 64, 48, b"u8exact,morph:close", None, None, None,
                 None, None)
    assert ctx
    ref = MaskGen(model_path("segm_lite_v681.tflite"), 64, 48,
                  u8_exact_post=True, morph="close")
    frame = np.ascontiguousarray(
        np.random.default_rng(12).integers(0, 256, (48, 64, 3), np.uint8))
    mask = np.zeros((48, 64), np.uint8)
    assert lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
    np.testing.assert_array_equal(mask, ref.process(frame))
    lib.bs_maskgen_delete(ctx)


def test_new_ex_unknown_option_fails(lib):
    """An unknown option token fails construction (NULL + ondebug message)
    instead of being silently dropped."""
    new_ex = _new_ex(lib)
    path = model_path("segm_lite_v681.tflite").encode()
    msgs = []
    CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_char_p)
    ondebug = CB(lambda _ctx, m: msgs.append(m))
    ctx = new_ex(path, 2, 64, 48, b"bogus:1",
                 ctypes.cast(ondebug, ctypes.c_void_p), None, None, None, None)
    assert not ctx
    assert any(b"bogus" in m for m in msgs)


def test_plain_new_equals_new_ex_empty_options(lib):
    """bs_maskgen_new is exactly new_ex with options="" (same bytes)."""
    new_ex = _new_ex(lib)
    path = model_path("segm_lite_v681.tflite").encode()
    frame = np.ascontiguousarray(
        np.random.default_rng(13).integers(0, 256, (48, 64, 3), np.uint8))
    masks = []
    for mk in (lambda: lib.bs_maskgen_new(path, 2, 64, 48, None, None, None,
                                          None, None),
               lambda: new_ex(path, 2, 64, 48, b"", None, None, None, None,
                              None)):
        ctx = mk()
        assert ctx
        mask = np.zeros((48, 64), np.uint8)
        assert lib.bs_maskgen_process(ctx, frame.ctypes.data, mask.ctypes.data)
        lib.bs_maskgen_delete(ctx)
        masks.append(mask)
    np.testing.assert_array_equal(masks[0], masks[1])
