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


def test_maskgen_new_failure_returns_null(lib):
    ctx = lib.bs_maskgen_new(b"/no/such/model.tflite", 2, 64, 48,
                             None, None, None, None, None)
    assert not ctx
