"""Pipeline tests: decode rules, EMA, ROI geometry, and end-to-end mask IoU
vs an independent cv2+TFLite implementation of the reference pipeline.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from backscrub_tpu.models.specs import spec_for_model
from backscrub_tpu.pipeline.decode import decode_val, ema_update
from backscrub_tpu.pipeline.geometry import compute_roi
from backscrub_tpu.pipeline.maskgen import MaskGen

from conftest import model_path

from conftest import background_image_path, portrait_path

SCREENSHOT = portrait_path()  # repo-owned synthetic person portrait


# ---------------------------------------------------------------------------
# decode + EMA units


def test_decode_deeplab(rng):
    spec = spec_for_model("deeplabv3_257_mv_gpu.tflite")
    out = rng.standard_normal((4, 4, 21)).astype(np.float32)
    val = np.asarray(decode_val(jnp.asarray(out), spec))
    expected = np.where(out.argmax(-1) == 15, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(val, expected)


def test_decode_threshold(rng):
    spec = spec_for_model("selfiesegmentation_x.tflite")
    out = rng.random((4, 4, 1)).astype(np.float32)
    val = np.asarray(decode_val(jnp.asarray(out), spec))
    np.testing.assert_array_equal(val, np.where(out[..., 0] > 0.65, 0, 255).astype(np.uint8))


def test_decode_two_channel(rng):
    spec = spec_for_model("segm_lite_v681.tflite")
    out = rng.standard_normal((4, 4, 2)).astype(np.float32)
    val = np.asarray(decode_val(jnp.asarray(out), spec))
    # softmax p0 < p1 iff logit0 < logit1
    np.testing.assert_array_equal(val, np.where(out[..., 0] < out[..., 1], 0, 255).astype(np.uint8))


def test_decode_multiclass(rng):
    spec = spec_for_model("selfie_multiclass_256x256.tflite")
    assert spec.decode == "argmax_not_background"
    out = rng.standard_normal((4, 4, 6)).astype(np.float32)
    val = np.asarray(decode_val(jnp.asarray(out), spec))
    expected = np.where(out.argmax(-1) != 0, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(val, expected)


def test_ema_bit_trick():
    prev = np.array([255, 0, 128, 7], np.uint8)
    val = np.array([0, 255, 255, 0], np.uint8)
    got = np.asarray(ema_update(jnp.asarray(prev), jnp.asarray(val)))
    expected = (val & 0xE0) | (prev >> 3)
    np.testing.assert_array_equal(got, expected)


def test_ema_converges():
    """Repeated person frames drive the mask to 0, background frames to >= 224."""
    m = np.full((4,), 255, np.uint8)
    for _ in range(10):
        m = np.asarray(ema_update(jnp.asarray(m), jnp.zeros(4, jnp.uint8)))
    assert m.max() <= 31
    for _ in range(10):
        m = np.asarray(ema_update(jnp.asarray(m), jnp.full((4,), 255, np.uint8)))
    assert m.min() >= 224


# ---------------------------------------------------------------------------
# ROI geometry (libbackscrub.cc:238-246)


def test_roi_frame_wider_than_model():
    # 640x480 frame, square 256 model: centered square column of the frame
    g = compute_roi(640, 480, 256, 256, 256, 256)
    assert (g.roi.x, g.roi.y, g.roi.w, g.roi.h) == ((640 - 480) // 2, 0, 480, 480)
    assert (g.in_roi.x, g.in_roi.y, g.in_roi.w, g.in_roi.h) == (0, 0, 256, 256)


def test_roi_model_wider_than_frame():
    # 640x480 frame (ratio .75), Meet lite 160x96 (ratio .6): letterbox into model
    g = compute_roi(640, 480, 160, 96, 160, 96)
    assert (g.roi.x, g.roi.y, g.roi.w, g.roi.h) == (0, 0, 640, 480)
    w = int(96 / 0.75)
    assert (g.in_roi.x, g.in_roi.w) == ((160 - w) // 2, w)


def test_roi_portrait_orientation():
    # taller-than-wide frame (phone cam): letterbox into the model center
    g = compute_roi(480, 640, 256, 256, 256, 256)
    assert (g.roi.x, g.roi.y, g.roi.w, g.roi.h) == (0, 0, 480, 640)
    assert g.in_roi.w == int(256 / (640 / 480)) and g.in_roi.x == (256 - g.in_roi.w) // 2


def test_portrait_pipeline_iou():
    """Full parity on a portrait frame, golden included."""
    path = model_path("segm_lite_v681.tflite")
    base = cv2.imread(SCREENSHOT)
    if base is None:
        pytest.skip("screenshot asset unavailable")
    frame = cv2.resize(base, (480, 640))
    spec = spec_for_model(path)
    golden = reference_maskgen(path, [frame] * 4, 480, 640, spec)
    mg = MaskGen(path, 480, 640)
    for _ in range(4):
        ours = mg.process(frame)
    assert iou(ours < 128, golden < 128) >= 0.99


def test_roi_output_scaling_bodypix():
    # BodyPix: 257x257 in, 33x33 out; out_roi must live in 33x33 coords
    g = compute_roi(640, 480, 257, 257, 33, 33)
    assert g.out_roi.w <= 33 and g.out_roi.h <= 33
    assert g.out_roi.w == 33  # full width (frame wider than model)


# ---------------------------------------------------------------------------
# end-to-end golden: our fused mask pipeline vs cv2+TFLite reference path


# Shared with the deployment fidelity gate (`bench.py --parity`); living in
# the package keeps that gate free of test config (conftest pins JAX to CPU).
from backscrub_tpu.utils.parity import iou, reference_maskgen  # noqa: E402,F401


def test_mask_iou_image_variants():
    """Parity must hold across content variations, not just one frame:
    brightness shifts, a zoomed crop, and a horizontally flipped scene."""
    path = model_path("segm_lite_v681.tflite")
    base = cv2.imread(SCREENSHOT)
    if base is None:
        pytest.skip("screenshot asset unavailable")
    base = cv2.resize(base, (640, 480))
    variants = [
        np.clip(base.astype(np.int16) + 40, 0, 255).astype(np.uint8),   # brighter
        np.clip(base.astype(np.int16) - 40, 0, 255).astype(np.uint8),   # darker
        cv2.resize(base[60:420, 80:560], (640, 480)),                   # zoom crop
        base[:, ::-1].copy(),                                           # mirrored
    ]
    spec = spec_for_model(path)
    for i, frame in enumerate(variants):
        frames = [frame] * 4
        golden = reference_maskgen(path, frames, 640, 480, spec)
        mg = MaskGen(path, 640, 480)
        for f in frames:
            ours = mg.process(f)
        score = iou(ours < 128, golden < 128)
        assert score >= 0.99, f"variant {i}: IoU {score:.4f}"


def test_device_yuyv_ingest_matches_host_decode():
    """input_format='yuyv' (raw camera bytes decoded on device, BT.601
    bit-exact with cv2) must produce identical output to the host-decode
    path feeding BGR."""
    path = model_path("segm_lite_v681.tflite")
    frame_bgr = cv2.imread(SCREENSHOT)
    if frame_bgr is None:
        pytest.skip("screenshot asset unavailable")
    frame_bgr = cv2.resize(frame_bgr, (640, 480))
    yuyv = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2YUV_YUY2).reshape(480, 1280)
    host_decoded = cv2.cvtColor(yuyv.reshape(480, 640, 2), cv2.COLOR_YUV2BGR_YUY2)
    bg = np.zeros((480, 640, 3), np.uint8)

    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    p_host = FramePipeline(path, PipelineConfig(width=640, height=480,
                                                use_bilateral=False))
    p_dev = FramePipeline(path, PipelineConfig(width=640, height=480,
                                               use_bilateral=False,
                                               input_format="yuyv"))
    for _ in range(3):
        out_h, _ = p_host.step(host_decoded, bg)
        out_d, _ = p_dev.step(yuyv, bg)
    np.testing.assert_array_equal(np.asarray(out_h), np.asarray(out_d))


def test_full_frame_composite_bit_exact():
    """The composite+YUYV output path must be BIT-EXACT against a numpy
    transcription of the reference main loop (alpha_blend deepseg.cc:108-134
    + convert_rgb_to_yuyv deepseg.cc:87-106), given the same mask."""
    path = model_path("segm_lite_v681.tflite")
    frame = cv2.imread(SCREENSHOT)
    if frame is None:
        pytest.skip("screenshot asset unavailable")
    frame = cv2.resize(frame, (640, 480))
    bg = cv2.resize(cv2.imread(background_image_path()),
                    (640, 480))

    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    pipe = FramePipeline(path, PipelineConfig(width=640, height=480))
    mg = MaskGen(path, 640, 480)
    out, _ = pipe.step(frame, bg)
    mask = mg.process(frame)  # deterministic: same as the pipeline's mask

    # numpy transcription of the reference composite
    aw = mask.astype(np.int64)[..., None]
    comp = ((bg.astype(np.int64) * aw + frame.astype(np.int64) * (255 - aw))
            // 255).astype(np.uint8)
    yuv = cv2.cvtColor(comp, cv2.COLOR_RGB2YUV)  # BGR fed as RGB, like ref
    y, u, v = (yuv[..., i].astype(np.int64) for i in range(3))
    expected = np.zeros((480, 1280), np.uint8)
    expected[:, 0::4] = y[:, 0::2]
    expected[:, 1::4] = (v[:, 0::2] + v[:, 1::2]) // 2
    expected[:, 2::4] = y[:, 1::2]
    expected[:, 3::4] = (u[:, 0::2] + u[:, 1::2]) // 2
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_unfused_mode_callbacks_and_parity():
    """fused=False fires onprep/oninfer/onmask per stage (lib/libbackscrub.h
    callback seam) and produces the same mask as the fused path."""
    path = model_path("segm_lite_v681.tflite")
    frame = cv2.imread(SCREENSHOT)
    if frame is None:
        pytest.skip("screenshot asset unavailable")
    frame = cv2.resize(frame, (640, 480))
    calls = []
    mg_cb = MaskGen(path, 640, 480, fused=False,
                    onprep=lambda: calls.append("prep"),
                    oninfer=lambda: calls.append("infer"),
                    onmask=lambda: calls.append("mask"),
                    ondebug=lambda m: calls.append("dbg"))
    mg_fused = MaskGen(path, 640, 480)
    for _ in range(2):
        m_cb = mg_cb.process(frame)
        m_f = mg_fused.process(frame)
    assert calls.count("prep") == 2 and calls.count("infer") == 2 \
        and calls.count("mask") == 2 and calls.count("dbg") >= 1
    np.testing.assert_array_equal(m_cb, m_f)


def test_temporal_ema_sequence_matches_golden():
    """EMA evolution across a CHANGING frame sequence (person appears then
    leaves) must track the golden implementation frame by frame."""
    path = model_path("segm_lite_v681.tflite")
    frame = cv2.imread(SCREENSHOT)
    if frame is None:
        pytest.skip("screenshot asset unavailable")
    person = cv2.resize(frame, (640, 480))
    empty = cv2.GaussianBlur(person, (51, 51), 0)  # person washed out
    seq = [person, person, empty, empty, empty, person]
    spec = spec_for_model(path)
    golden = reference_maskgen(path, seq, 640, 480, spec)
    mg = MaskGen(path, 640, 480)
    for f in seq:
        ours = mg.process(f)
    score = iou(ours < 128, golden < 128)
    assert score >= 0.99, f"temporal IoU {score:.4f}"


@pytest.mark.parametrize("name", [
    "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
    "segm_lite_v681.tflite",
    "segm_full_v679.tflite",
    "deeplabv3_257_mv_gpu.tflite",
    "body-pix-float-050-8.tflite",
])
def test_mask_iou_vs_reference(name):
    path = model_path(name)
    frame = cv2.imread(SCREENSHOT)
    if frame is None:
        pytest.skip("screenshot asset unavailable")
    frame = cv2.resize(frame, (640, 480))
    spec = spec_for_model(path)
    frames = [frame] * 4  # warm the EMA
    golden = reference_maskgen(path, frames, 640, 480, spec)

    mg = MaskGen(path, 640, 480)
    for f in frames:
        ours = mg.process(f)
    score = iou(ours < 128, golden < 128)
    assert score >= 0.99, f"mask IoU {score:.4f} < 0.99 for {name}"


def test_maskgen_u8_exact_post_parity():
    """u8-exact post mode keeps golden parity (and only perturbs the float
    path by the +-1 cv2 u8/f32 quantization difference)."""
    path = model_path("segm_lite_v681.tflite")
    frame = cv2.imread(SCREENSHOT)
    frame = cv2.resize(frame, (640, 480))
    spec = spec_for_model(path)
    golden = reference_maskgen(path, [frame] * 4, 640, 480, spec)
    mg = MaskGen(path, 640, 480, u8_exact_post=True)
    for _ in range(4):
        ours = np.asarray(mg.process(frame))
    assert iou(ours < 128, golden < 128) >= 0.99


def test_u8_exact_env_default(monkeypatch):
    monkeypatch.setenv("BACKSCRUB_U8_EXACT", "1")
    mg = MaskGen(model_path("segm_lite_v681.tflite"), 64, 48)
    assert mg.u8_exact_post is True
    monkeypatch.delenv("BACKSCRUB_U8_EXACT")
    mg2 = MaskGen(model_path("segm_lite_v681.tflite"), 64, 48)
    assert mg2.u8_exact_post is False
    mg3 = MaskGen(model_path("segm_lite_v681.tflite"), 64, 48,
                  u8_exact_post=True)
    assert mg3.u8_exact_post is True


def test_device_nv12_ingest_matches_host_decode(rng):
    """input_format='nv12' (raw 4:2:0 camera bytes decoded on device,
    bit-exact with cv2.COLOR_YUV2BGR_NV12) must produce identical output
    to the host-decode path feeding BGR."""
    path = model_path("segm_lite_v681.tflite")
    bgr0 = rng.integers(0, 256, (48, 64, 3), np.uint8)
    i420 = cv2.cvtColor(bgr0, cv2.COLOR_BGR2YUV_I420)
    y = i420[:48]
    u = i420[48:60].reshape(24, 32)
    v = i420[60:].reshape(24, 32)
    nv12 = np.concatenate([y, np.stack([u, v], -1).reshape(24, 64)])
    host_decoded = cv2.cvtColor(nv12, cv2.COLOR_YUV2BGR_NV12)
    bg = np.zeros((48, 64, 3), np.uint8)

    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    p_host = FramePipeline(path, PipelineConfig(width=64, height=48,
                                                use_bilateral=False))
    p_dev = FramePipeline(path, PipelineConfig(width=64, height=48,
                                               use_bilateral=False,
                                               input_format="nv12"))
    for _ in range(3):
        out_h, _ = p_host.step(host_decoded, bg)
        out_d, _ = p_dev.step(nv12, bg)
    np.testing.assert_array_equal(np.asarray(out_h), np.asarray(out_d))


def test_guided_refine_edge_aware():
    """Guided refinement hugs image edges: where the guide has a sharp
    luma step aligned with the mask boundary, the refined mask transitions
    more sharply than the box-blurred one; both stay close in IoU."""
    from backscrub_tpu.pipeline.geometry import compute_roi
    from backscrub_tpu.pipeline.maskgen import postprocess_mask

    geo = compute_roi(160, 96, 160, 96, 160, 96)
    ema = np.full((96, 160), 255, np.uint8)
    ema[:, :80] = 0  # left half person
    frame = np.zeros((96, 160, 3), np.uint8)
    frame[:, :80] = 230  # sharp luma edge at the same boundary

    box = np.asarray(postprocess_mask(jnp.asarray(ema), geo))
    guided = np.asarray(postprocess_mask(jnp.asarray(ema), geo,
                                         refine="guided",
                                         frame_bgr=jnp.asarray(frame)))
    # transition width: columns where the mask is neither person nor bg
    mid_box = ((box[48] > 32) & (box[48] < 224)).sum()
    mid_guided = ((guided[48] > 32) & (guided[48] < 224)).sum()
    assert mid_guided <= mid_box
    same = (guided < 128) == (box < 128)
    assert same.mean() > 0.97


def test_guided_refine_pipeline_parity():
    """Full pipeline with -p refine:guided keeps golden-level IoU."""
    path = model_path("segm_lite_v681.tflite")
    frame = cv2.imread(SCREENSHOT)
    if frame is None:
        pytest.skip("screenshot asset unavailable")
    frame = cv2.resize(frame, (640, 480))
    spec = spec_for_model(path)
    golden = reference_maskgen(path, [frame] * 4, 640, 480, spec)
    mg = MaskGen(path, 640, 480, refine="guided")
    for _ in range(4):
        ours = np.asarray(mg.process(frame))
    # guided refinement intentionally deviates at silhouette edges (that's
    # its job); it must stay close to the box-blur golden everywhere else
    assert iou(ours < 128, golden < 128) >= 0.95


def test_guided_refine_requires_frame():
    from backscrub_tpu.pipeline.geometry import compute_roi
    from backscrub_tpu.pipeline.maskgen import postprocess_mask
    geo = compute_roi(64, 48, 64, 48, 64, 48)
    with pytest.raises(ValueError):
        postprocess_mask(jnp.zeros((48, 64), jnp.uint8), geo, refine="guided")


def test_pack_interpret_matches_jnp_path():
    """PipelineConfig(pack_interpret=True) routes the fused Pallas pack
    kernels (interpret mode off-TPU) into the SHIPPED step — bytes must be
    identical to the jnp path for every packed output format.  This is the
    program shape dryrun_multichip exercises on the CPU mesh."""
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig

    path = model_path("segm_lite_v681.tflite")
    rng = np.random.default_rng(21)
    frame = rng.integers(0, 256, (48, 64, 3), np.uint8)
    bg = rng.integers(0, 256, (48, 64, 3), np.uint8)
    for fmt in ("yuyv", "nv12", "i420"):
        p_kern = FramePipeline(path, PipelineConfig(
            width=64, height=48, output_format=fmt, pack_interpret=True))
        p_jnp = FramePipeline(path, PipelineConfig(
            width=64, height=48, output_format=fmt, fused_pack=False))
        for _ in range(2):
            y_k, m_k = p_kern.step(frame, bg)
            y_j, m_j = p_jnp.step(frame, bg)
        np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_j))
        np.testing.assert_array_equal(np.asarray(m_k), np.asarray(m_j))
