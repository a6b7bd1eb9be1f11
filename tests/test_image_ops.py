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


# ---------------------------------------------------------------------------
# cv2-bit-exact u8 fixed-point resize + blur (strict byte parity mode)


@pytest.mark.parametrize("shape", [
    ((96, 160), (480, 640)),   # meet-lite mask upscale
    ((33, 33), (480, 640)),    # bodypix coarse mask
    ((256, 256), (720, 1280)),
    ((480, 640), (96, 160)),   # downscale
    ((7, 5), (13, 11)),
    ((13, 11), (7, 5)),
    ((1, 4), (3, 8)),          # single-row: vertical border coefficients
    ((2, 2), (5, 5)),
    ((5, 7), (5, 7)),          # identity
])
def test_resize_u8_exact_vs_cv2(rng, shape):
    from backscrub_tpu.pipeline.image import resize_bilinear_u8_exact
    (ih, iw), (oh, ow) = shape
    src = rng.integers(0, 256, (ih, iw), np.uint8)
    ref = cv2.resize(src, (ow, oh), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear_u8_exact(
        jnp.asarray(src)[..., None], oh, ow))[..., 0]
    np.testing.assert_array_equal(got, ref)


def test_resize_u8_exact_multichannel(rng):
    from backscrub_tpu.pipeline.image import resize_bilinear_u8_exact
    src = rng.integers(0, 256, (48, 64, 3), np.uint8)
    ref = cv2.resize(src, (160, 96), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear_u8_exact(jnp.asarray(src), 96, 160))
    np.testing.assert_array_equal(got, ref)


def test_box_blur_u8_exact_vs_cv2(rng):
    from backscrub_tpu.pipeline.image import box_blur_u8_exact
    for k in (3, 5):
        src = rng.integers(0, 256, (37, 53), np.uint8)
        ref = cv2.blur(src, (k, k))
        got = np.asarray(box_blur_u8_exact(
            jnp.asarray(src)[..., None], k))[..., 0]
        np.testing.assert_array_equal(got, ref)


def test_postprocess_u8_exact_matches_reference_binary_path(rng):
    """postprocess_mask(u8_exact=True) == the reference's literal cv2 u8
    pipeline (resize u8 -> blur u8, lib/libbackscrub.cc:366-371) byte for
    byte, on a random EMA mask."""
    from backscrub_tpu.pipeline.geometry import compute_roi
    from backscrub_tpu.pipeline.maskgen import postprocess_mask

    geo = compute_roi(640, 480, 160, 96, 160, 96)
    ema = rng.integers(0, 256, (96, 160), np.uint8)
    got = np.asarray(postprocess_mask(jnp.asarray(ema), geo, u8_exact=True))

    o, r = geo.out_roi, geo.roi
    small = ema[o.y:o.y + o.h, o.x:o.x + o.w]
    up = cv2.resize(small, (r.w, r.h), interpolation=cv2.INTER_LINEAR)
    up = cv2.blur(up, (5, 5))
    want = np.full((480, 640), 255, np.uint8)
    want[r.y:r.y + r.h, r.x:r.x + r.w] = up
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# 4:2:0 packs (NV12 / I420)


def test_i420_bit_exact_vs_cv2(rng):
    from backscrub_tpu.pipeline.image import bgr_to_i420
    for h, w in [(8, 8), (48, 64), (30, 42)]:
        bgr = rng.integers(0, 256, (h, w, 3), np.uint8)
        ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420).reshape(-1)
        got = np.asarray(bgr_to_i420(jnp.asarray(bgr)))
        np.testing.assert_array_equal(got, ref)


def test_nv12_is_i420_interleaved(rng):
    from backscrub_tpu.pipeline.image import bgr_to_i420, bgr_to_nv12
    h, w = 48, 64
    bgr = rng.integers(0, 256, (h, w, 3), np.uint8)
    nv12 = np.asarray(bgr_to_nv12(jnp.asarray(bgr)))
    assert nv12.shape == (h * 3 // 2, w)
    flat = np.asarray(bgr_to_i420(jnp.asarray(bgr)))
    y = flat[:h * w].reshape(h, w)
    u = flat[h * w:h * w + h * w // 4].reshape(h // 2, w // 2)
    v = flat[h * w + h * w // 4:].reshape(h // 2, w // 2)
    np.testing.assert_array_equal(nv12[:h], y)
    uv = nv12[h:].reshape(h // 2, w // 2, 2)
    np.testing.assert_array_equal(uv[..., 0], u)
    np.testing.assert_array_equal(uv[..., 1], v)


def test_420_rejects_odd_geometry(rng):
    from backscrub_tpu.pipeline.image import bgr_to_i420, bgr_to_nv12
    bgr = jnp.zeros((7, 8, 3), jnp.uint8)
    for fn in (bgr_to_nv12, bgr_to_i420):
        with pytest.raises(ValueError):
            fn(bgr)


def test_pipeline_nv12_output(rng):
    """output_format='nv12': the fused step emits a cv2-bit-exact 4:2:0
    frame of the same composite the bgr path produces."""
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from conftest import model_path

    path = model_path("segm_lite_v681.tflite")
    frame = rng.integers(0, 256, (48, 64, 3), np.uint8)
    bg = rng.integers(0, 256, (48, 64, 3), np.uint8)
    p_bgr = FramePipeline(path, PipelineConfig(width=64, height=48,
                                               output_format="bgr"))
    p_nv = FramePipeline(path, PipelineConfig(width=64, height=48,
                                              output_format="nv12"))
    comp, _ = p_bgr.step(frame, bg)
    nv12, _ = p_nv.step(frame, bg)
    want = cv2.cvtColor(np.asarray(comp), cv2.COLOR_BGR2YUV_I420)
    y = want[:48]
    u = want[48:60].reshape(24, 32)
    v = want[60:].reshape(24, 32)
    got = np.asarray(nv12)
    np.testing.assert_array_equal(got[:48], y)
    uv = got[48:].reshape(24, 32, 2)
    np.testing.assert_array_equal(uv[..., 0], u)
    np.testing.assert_array_equal(uv[..., 1], v)


def test_uyvy_decode_bt601_bit_exact(rng):
    """Camera-side UYVY decode matches cv2.COLOR_YUV2RGB_UYVY bit-exactly
    (the other common V4L2 4:2:2 layout; device ingest like YUYV)."""
    uyvy = rng.integers(0, 256, (32, 64, 2), np.uint8)
    ref = cv2.cvtColor(uyvy, cv2.COLOR_YUV2RGB_UYVY)
    ours = np.asarray(im.yuyv_to_rgb_u8(jnp.asarray(uyvy), layout="uyvy"))
    np.testing.assert_array_equal(ours, ref)


def test_uyvy_pipeline_ingest_matches_bgr(rng):
    """input_format='uyvy' produces the same output as the bgr path fed
    with the cv2-decoded frame."""
    from conftest import model_path
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    path = model_path("segm_lite_v681.tflite")
    w, h = 64, 48
    uyvy = rng.integers(0, 256, (h, w, 2), np.uint8)
    bgr = cv2.cvtColor(uyvy, cv2.COLOR_YUV2BGR_UYVY)
    bg = rng.integers(0, 256, (h, w, 3), np.uint8)
    p1 = FramePipeline(path, PipelineConfig(width=w, height=h,
                                            use_bilateral=False))
    p2 = FramePipeline(path, PipelineConfig(width=w, height=h,
                                            use_bilateral=False,
                                            input_format="uyvy"))
    o1, _ = p1.step(bgr, bg)
    o2, _ = p2.step(uyvy.reshape(h, 2 * w), bg)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o1))


def test_bgr_to_gray_bit_exact(rng):
    x = rng.integers(0, 256, (96, 128, 3), np.uint8)
    ours = np.asarray(im.bgr_to_gray_u8(jnp.asarray(x)))
    np.testing.assert_array_equal(ours, cv2.cvtColor(x, cv2.COLOR_BGR2GRAY))


def test_desaturate_is_gray_in_three_channels(rng):
    x = rng.integers(0, 256, (48, 64, 3), np.uint8)
    d = np.asarray(im.desaturate_u8(jnp.asarray(x)))
    gray = cv2.cvtColor(x, cv2.COLOR_BGR2GRAY)
    for c in range(3):
        np.testing.assert_array_equal(d[..., c], gray)


@pytest.mark.parametrize("shape,block", [((48, 64), 8), ((47, 61), 8),
                                         ((48, 64), 5), ((9, 7), 16)])
def test_pixelate_matches_numpy_golden(rng, shape, block):
    """pixelate_u8 = edge-replicate to a block multiple, box-mean each
    tile (round half up), nearest-upsample, crop."""
    h, w = shape
    x = rng.integers(0, 256, (h, w, 3), np.uint8)
    hb, wb = -(-h // block), -(-w // block)
    pad = np.pad(x.astype(np.int64),
                 ((0, hb * block - h), (0, wb * block - w), (0, 0)),
                 mode="edge")
    tiles = pad.reshape(hb, block, wb, block, 3).sum(axis=(1, 3))
    means = ((tiles + block * block // 2) // (block * block)).astype(np.uint8)
    golden = means.repeat(block, 0).repeat(block, 1)[:h, :w]
    ours = np.asarray(im.pixelate_u8(jnp.asarray(x), block))
    np.testing.assert_array_equal(ours, golden)
    # constant image is a fixed point
    const = np.full((h, w, 3), 77, np.uint8)
    np.testing.assert_array_equal(
        np.asarray(im.pixelate_u8(jnp.asarray(const), block)), const)


def test_pipeline_bg_effects(rng):
    """-p bgdesat/-p bgpixelate apply to the background inside the fused
    program: identical to pre-effecting the background on host; with no
    explicit background the camera frame is the background source
    (privacy-mosaic mode)."""
    from conftest import model_path
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig

    path = model_path("segm_lite_v681.tflite")
    frame = rng.integers(0, 256, (48, 64, 3), np.uint8)
    bg = rng.integers(0, 256, (48, 64, 3), np.uint8)

    base = dict(width=64, height=48, use_bilateral=False)
    pipe_fx = FramePipeline(path, PipelineConfig(
        **base, bg_desaturate=True, bg_pixelate=8))
    plain = FramePipeline(path, PipelineConfig(**base))
    bg_fx = np.asarray(im.pixelate_u8(im.desaturate_u8(jnp.asarray(bg)), 8))
    out_fx, _ = pipe_fx.step(frame, bg)
    out_ref, _ = plain.step(frame, bg_fx)
    np.testing.assert_array_equal(np.asarray(out_fx), np.asarray(out_ref))

    # privacy mosaic: no background -> camera frame, pixelated, is the bg
    priv = FramePipeline(path, PipelineConfig(**base, bg_pixelate=8))
    out_priv, _ = priv.step(frame)
    expl = FramePipeline(path, PipelineConfig(**base, bg_pixelate=8))
    out_expl, _ = expl.step(frame, frame)
    np.testing.assert_array_equal(np.asarray(out_priv), np.asarray(out_expl))


@pytest.mark.parametrize("k", [3, 5])
def test_erode_dilate_bit_exact_vs_cv2(rng, k):
    x = rng.integers(0, 256, (48, 64), np.uint8)
    kern = np.ones((k, k), np.uint8)
    np.testing.assert_array_equal(np.asarray(im.erode_u8(jnp.asarray(x), k)),
                                  cv2.erode(x, kern))
    np.testing.assert_array_equal(np.asarray(im.dilate_u8(jnp.asarray(x), k)),
                                  cv2.dilate(x, kern))


def test_mask_morph_person_semantics():
    """Masks are 0=person: morph:open kills isolated person speckles,
    morph:close fills pinholes inside the person region."""
    m = np.full((20, 20), 255, np.uint8)
    m[10, 10] = 0  # a one-pixel person speckle
    opened = np.asarray(im.apply_mask_morph(jnp.asarray(m), "open:3"))
    assert opened[10, 10] == 255 and (opened == 255).all()

    m2 = np.full((20, 20), 255, np.uint8)
    m2[5:15, 5:15] = 0     # person block
    m2[9, 9] = 255         # pinhole
    closed = np.asarray(im.apply_mask_morph(jnp.asarray(m2), "close:3"))
    assert closed[9, 9] == 0          # hole filled
    assert closed[5:15, 5:15].max() == 0
    assert closed[0, 0] == 255        # background untouched

    with pytest.raises(ValueError):
        im.apply_mask_morph(jnp.asarray(m), "sharpen")
    with pytest.raises(ValueError):
        im.apply_mask_morph(jnp.asarray(m), "open:4")


def test_pipeline_mask_morph(rng):
    """mask_morph plumbs through the fused program; erode shrinks (or
    keeps) the person area vs the unmorphed mask, never grows it."""
    from conftest import model_path
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig

    path = model_path("segm_lite_v681.tflite")
    frame = rng.integers(0, 256, (48, 64, 3), np.uint8)
    base = dict(width=64, height=48, use_bilateral=False)
    plain = FramePipeline(path, PipelineConfig(**base))
    morphed = FramePipeline(path, PipelineConfig(**base, mask_morph="erode:3"))
    for _ in range(3):
        _, m_plain = plain.step(frame)
        _, m_morph = morphed.step(frame)
    m_plain, m_morph = np.asarray(m_plain), np.asarray(m_morph)
    # person-erode raises the small-mask bytes pointwise, and the upscale
    # and box blur are monotone nonneg-linear, so the full-res masks stay
    # pointwise ordered: morphed >= plain everywhere, strictly somewhere
    # (unless the frame produced no person at all)
    assert (m_morph.astype(int) >= m_plain.astype(int)).all()
    assert m_morph.shape == m_plain.shape


@pytest.mark.parametrize("order", ["reference", "yuy2"])
@pytest.mark.parametrize("cc", [False, True])
def test_blend_pack_yuyv_kernel_bit_exact(rng, order, cc):
    """The Pallas fused blend+pack kernel (interpret mode on CPU) must be
    bit-exact vs alpha_blend_u8 + rgb_to_yuyv for both chroma orders and
    both color conventions, including odd geometries."""
    from backscrub_tpu.ops.pallas_kernels import blend_pack_yuyv
    for (h, w) in [(48, 64), (96, 160), (120, 128)]:
        fr = rng.integers(0, 256, (h, w, 3), np.uint8)
        bg = rng.integers(0, 256, (h, w, 3), np.uint8)
        m = rng.integers(0, 256, (h, w), np.uint8)
        comp = im.alpha_blend_u8(jnp.asarray(bg), jnp.asarray(fr),
                                 jnp.asarray(m))
        src = comp[..., ::-1] if cc else comp
        ref = np.asarray(im.rgb_to_yuyv(src, chroma_order=order)
                         ).reshape(h, 2 * w)
        got = np.asarray(blend_pack_yuyv(
            jnp.asarray(fr), jnp.asarray(bg), jnp.asarray(m),
            chroma_order=order, correct_colors=cc, interpret=True))
        np.testing.assert_array_equal(got, ref)
    # batched: leading stream axis flattens into rows
    S, h, w = 3, 48, 64
    fr = rng.integers(0, 256, (S, h, w, 3), np.uint8)
    bg = rng.integers(0, 256, (S, h, w, 3), np.uint8)
    m = rng.integers(0, 256, (S, h, w), np.uint8)
    comp = im.alpha_blend_u8(jnp.asarray(bg), jnp.asarray(fr), jnp.asarray(m))
    src = comp[..., ::-1] if cc else comp
    ref = np.asarray(im.rgb_to_yuyv(src, chroma_order=order))
    ref = ref.reshape(S, h, 2 * w)
    got = np.asarray(blend_pack_yuyv(
        jnp.asarray(fr), jnp.asarray(bg), jnp.asarray(m),
        chroma_order=order, correct_colors=cc, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_blend_pack_420_kernel_bit_exact(rng):
    """The fused 4:2:0 kernel (interpret mode) must reproduce
    alpha_blend_u8 + bgr_to_nv12 / bgr_to_i420 byte for byte, single and
    batched."""
    from backscrub_tpu.ops.pallas_kernels import blend_pack_420
    from backscrub_tpu.pipeline.image import bgr_to_i420, bgr_to_nv12
    for shape in [(48, 64), (30, 42), (3, 48, 64)]:
        fr = rng.integers(0, 256, shape + (3,), np.uint8)
        bg = rng.integers(0, 256, shape + (3,), np.uint8)
        m = rng.integers(0, 256, shape, np.uint8)
        comp = im.alpha_blend_u8(jnp.asarray(bg), jnp.asarray(fr),
                                 jnp.asarray(m))
        y, uv = blend_pack_420(jnp.asarray(fr), jnp.asarray(bg),
                               jnp.asarray(m), interpret=True)
        got_nv12 = np.concatenate([np.asarray(y), np.asarray(uv)], axis=-2)
        np.testing.assert_array_equal(got_nv12, np.asarray(bgr_to_nv12(comp)))
        h, w = shape[-2:]
        lead = shape[:-2]
        u = np.asarray(uv)[..., 0::2].reshape(lead + (h * w // 4,))
        v = np.asarray(uv)[..., 1::2].reshape(lead + (h * w // 4,))
        got_i420 = np.concatenate(
            [np.asarray(y).reshape(lead + (h * w,)), u, v], axis=-1)
        np.testing.assert_array_equal(got_i420, np.asarray(bgr_to_i420(comp)))


def test_blur_matrix_equals_sep_filter_box_blur():
    """blur_matrix is the exact linear operator of the separable 5x5 box
    blur with reflect-101 border (the fold_blur path composes it with the
    resize matrix — maskgen._fold_blur_matrices)."""
    import numpy as np
    from backscrub_tpu.pipeline.image import blur_matrix, box_blur

    rng = np.random.default_rng(5)
    for size in (33, 64, 97):
        x = rng.random((size, size, 1)).astype(np.float32) * 255
        want = np.asarray(box_blur(jnp.asarray(x), 5))[..., 0]
        m = blur_matrix(size, 5)
        got = m @ x[..., 0] @ m.T
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_fold_blur_matrices_match_two_stage_unrounded():
    """The composed (blur @ resize) matrices equal resize-then-blur with
    the intermediate round REMOVED — i.e. fold_blur changes numerics only
    by that round (why BodyPix's coarse 33x33 keeps the two-stage path)."""
    import numpy as np
    from backscrub_tpu.pipeline.image import box_blur, resize_bilinear
    from backscrub_tpu.pipeline.maskgen import _fold_blur_matrices

    rng = np.random.default_rng(6)
    small = rng.integers(0, 256, (96, 160)).astype(np.float32)
    up = resize_bilinear(jnp.asarray(small)[..., None], 240, 320)
    want = np.asarray(box_blur(up, 5))[..., 0]
    ah, aw = _fold_blur_matrices(96, 160, 240, 320)
    got = ah @ small @ aw.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-2)
