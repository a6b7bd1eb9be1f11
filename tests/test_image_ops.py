"""Unit tests for the device-side image ops vs OpenCV ground truth.

Each stage of the frame pipeline is checked against the library the
reference used (cv2), per the test strategy in SURVEY.md §4.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from backscrub_tpu.pipeline import image as im


@pytest.fixture
def img(rng):
    return rng.integers(0, 256, (48, 64, 3), np.uint8)


def test_rgb_to_yuv_bit_exact(rng):
    x = rng.integers(0, 256, (96, 128, 3), np.uint8)
    ours = np.asarray(im.rgb_to_yuv_u8(jnp.asarray(x)))
    ref = cv2.cvtColor(x, cv2.COLOR_RGB2YUV)
    np.testing.assert_array_equal(ours, ref)


def test_rgb_to_yuyv_matches_reference_loop(rng):
    """Bit-exact vs a numpy transcription of convert_rgb_to_yuyv
    (app/deepseg.cc:87-106): chroma pair-averaged, bytes [Y0, V, Y1, U]."""
    x = rng.integers(0, 256, (32, 64, 3), np.uint8)
    yuv = cv2.cvtColor(x, cv2.COLOR_RGB2YUV)
    y, u, v = yuv[..., 0].astype(int), yuv[..., 1].astype(int), yuv[..., 2].astype(int)
    expected = np.zeros((32, 64, 2), np.uint8)
    for row in range(32):
        for i in range(0, 64, 2):
            uu = (u[row, i] + u[row, i + 1]) // 2
            vv = (v[row, i] + v[row, i + 1]) // 2
            expected[row, i, 0] = y[row, i]
            expected[row, i, 1] = vv
            expected[row, i + 1, 0] = y[row, i + 1]
            expected[row, i + 1, 1] = uu
    ours = np.asarray(im.rgb_to_yuyv(jnp.asarray(x), chroma_order="reference"))
    np.testing.assert_array_equal(ours, expected)


def test_alpha_blend_exact(rng):
    a = rng.integers(0, 256, (20, 30, 3), np.uint8)
    b = rng.integers(0, 256, (20, 30, 3), np.uint8)
    m = rng.integers(0, 256, (20, 30), np.uint8)
    ours = np.asarray(im.alpha_blend_u8(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)))
    aw = m.astype(np.int64)[..., None]
    expected = ((a.astype(np.int64) * aw + b.astype(np.int64) * (255 - aw)) // 255).astype(np.uint8)
    np.testing.assert_array_equal(ours, expected)


def test_resize_bilinear_vs_cv2(img):
    ours = np.asarray(im.resize_bilinear(jnp.asarray(img, jnp.float32), 96, 128))
    ref = cv2.resize(img, (128, 96), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() <= 1.0  # cv2 u8 path is fixed-point


def test_resize_downscale_vs_cv2(img):
    ours = np.round(np.asarray(im.resize_bilinear(jnp.asarray(img, jnp.float32), 24, 32)))
    ref = cv2.resize(img, (32, 24), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() <= 2.0


def test_bilateral_vs_cv2(img):
    ours = np.round(np.asarray(im.bilateral5(jnp.asarray(img, jnp.float32))))
    ref = cv2.bilateralFilter(img, 5, 100.0, 100.0)
    diff = np.abs(ours - ref.astype(np.float64))
    assert np.percentile(diff, 99) <= 1.0 and diff.max() <= 3.0


def test_box_blur_vs_cv2(img):
    ours = np.round(np.asarray(im.box_blur(jnp.asarray(img, jnp.float32), 5)))
    ref = cv2.blur(img, (5, 5))
    assert np.abs(ours - ref.astype(np.float64)).max() <= 1.0


def test_gaussian_blur_vs_cv2(img):
    ours = np.round(np.asarray(im.gaussian_blur(jnp.asarray(img, jnp.float32), 7)))
    ref = cv2.GaussianBlur(img, (7, 7), 0)
    assert np.abs(ours - ref.astype(np.float64)).max() <= 1.0


def test_yuyv_roundtrip():
    # smooth gradient: 4:2:2 chroma subsampling loses almost nothing
    yy, xx = np.mgrid[0:32, 0:64]
    # mid-range values: avoids U/V saturation clipping in the forward,
    # which irreversibly loses chroma (same as the reference's converter)
    x = np.stack([64 + yy * 128 // 31, 64 + xx * 128 // 63,
                  64 + (yy + xx) * 128 // 94], axis=-1).astype(np.uint8)
    packed = im.rgb_to_yuyv(jnp.asarray(x), chroma_order="yuy2")
    back = np.asarray(im.yuyv_to_rgb_u8(packed, chroma_order="yuy2", convention="analog"))
    assert np.abs(back.astype(int) - x.astype(int)).max() <= 8
    assert np.abs(back.astype(int) - x.astype(int)).mean() < 2.5


def test_yuyv_decode_bt601_bit_exact(rng):
    """Camera-side YUYV decode matches cv2.COLOR_YUV2RGB_YUY2 bit-exactly."""
    yuyv = rng.integers(0, 256, (32, 64, 2), np.uint8)
    ref = cv2.cvtColor(yuyv, cv2.COLOR_YUV2RGB_YUY2)
    ours = np.asarray(im.yuyv_to_rgb_u8(jnp.asarray(yuyv)))
    np.testing.assert_array_equal(ours, ref)


def test_flip_matches_cv2(img):
    np.testing.assert_array_equal(np.asarray(im.flip(jnp.asarray(img), horizontal=True)),
                                  cv2.flip(img, 1))
    np.testing.assert_array_equal(np.asarray(im.flip(jnp.asarray(img), vertical=True)),
                                  cv2.flip(img, 0))
    np.testing.assert_array_equal(
        np.asarray(im.flip(jnp.asarray(img), horizontal=True, vertical=True)),
        cv2.flip(img, -1))
