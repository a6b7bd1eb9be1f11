"""MJPG encode: device color/downsample/FDCT/quantize + host Huffman pack,
byte-exact vs cv2.imencode (libjpeg-turbo defaults, optimize=off).

The reference has no encode path (raw YUYV out, app/deepseg.cc:681-690);
this is the TPU-native compressed-output extension, symmetric to the
device-side MJPG decode.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
jnp = pytest.importorskip("jax.numpy")

from backscrub_tpu.io.jpeg import (JpegEntropyDecoder, JpegHuffmanEncoder,
                                   make_info, parse_header)
from backscrub_tpu.pipeline.jpeg_enc import (encode_jpeg_coefs,
                                             quality_to_qtabs)
from test_jpeg import native_lib  # noqa: F401  (module-scoped build fixture)

SF_MAP = {"420": ((2, 2), (1, 1), (1, 1)),
          "422": ((2, 1), (1, 1), (1, 1)),
          "444": ((1, 1), (1, 1), (1, 1))}


def _smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return cv2.GaussianBlur(img, (5, 5), 0)


def _encode_ours(img, sampling, quality):
    h, w = img.shape[:2]
    info = make_info(w, h, SF_MAP[sampling])
    qt = quality_to_qtabs(quality)
    qtabs = np.stack([qt[0], qt[1], qt[1]])
    coefs = encode_jpeg_coefs(jnp.asarray(img), jnp.asarray(qtabs), info)
    enc = JpegHuffmanEncoder(info, qtabs)
    return enc.encode([np.asarray(c) for c in coefs]), info


def _encode_cv2(img, sampling, quality):
    sf = getattr(cv2, f"IMWRITE_JPEG_SAMPLING_FACTOR_{sampling}")
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality,
                                         cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sf])
    assert ok
    return enc.tobytes()


@pytest.mark.parametrize("sampling", ["420", "422", "444"])
@pytest.mark.parametrize("quality", [60, 85, 95])
def test_byte_exact_vs_cv2_imencode(sampling, quality):
    img = _smooth(96, 128, seed=quality)
    ours, _ = _encode_ours(img, sampling, quality)
    assert ours == _encode_cv2(img, sampling, quality)


@pytest.mark.parametrize("dims", [(97, 131), (120, 164), (17, 9), (8, 8),
                                  (1, 1)])
def test_byte_exact_odd_dims(dims):
    """Partial blocks (edge replication at the right granularity) and MCU
    dummy blocks (zero-AC, chained DC — jccoefct.c) must match libjpeg."""
    img = _smooth(*dims, seed=dims[0])
    for sampling in ("420", "422"):
        ours, _ = _encode_ours(img, sampling, 85)
        assert ours == _encode_cv2(img, sampling, 85)


def test_roundtrip_through_own_decoder():
    """Our decoder must read our encoder's stream back to the exact
    coefficients (and cv2 must decode our bytes identically to its own)."""
    img = _smooth(64, 80, seed=42)
    ours, info = _encode_ours(img, "420", 85)
    dec = JpegEntropyDecoder()
    coefs, qtabs = dec.decode(ours)
    assert dec.info == info
    qt = quality_to_qtabs(85)
    np.testing.assert_array_equal(qtabs, np.stack([qt[0], qt[1], qt[1]]))
    ref = cv2.imdecode(np.frombuffer(_encode_cv2(img, "420", 85), np.uint8),
                       cv2.IMREAD_COLOR)
    got = cv2.imdecode(np.frombuffer(ours, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(got, ref)


def test_quality_curve_matches_cv2():
    """quality_to_qtabs must reproduce jpeg_set_quality for the tables cv2
    actually embeds (checked via our header parser)."""
    img = _smooth(32, 32)
    for q in (1, 10, 50, 75, 92, 100):
        jpg = _encode_cv2(img, "420", q)
        dec = JpegEntropyDecoder()
        _, qtabs = dec.decode(jpg)
        qt = quality_to_qtabs(q)
        np.testing.assert_array_equal(qtabs,
                                      np.stack([qt[0], qt[1], qt[1]]))


def test_encoder_rejects_bad_shapes():
    info = make_info(64, 48, SF_MAP["420"])
    qt = quality_to_qtabs(85)
    enc = JpegHuffmanEncoder(info, np.stack([qt[0], qt[1], qt[1]]))
    bad = [np.zeros((1, 1, 64), np.int16)] * 3
    with pytest.raises(ValueError, match="shape"):
        enc.encode(bad)


def test_fidelity_at_high_quality():
    """Sanity: the whole encode path preserves the image (PSNR, not just
    byte-games)."""
    img = _smooth(48, 64, seed=7)
    ours, _ = _encode_ours(img, "444", 95)
    got = cv2.imdecode(np.frombuffer(ours, np.uint8), cv2.IMREAD_COLOR)
    mse = np.mean((got.astype(np.float64) - img.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 37, psnr  # q95 on smoothed noise (high-entropy content)


def test_frame_pipeline_mjpg_output_matches_cv2_encode_of_bgr_output():
    """output_format='mjpg' (device encode fused into the frame program)
    must emit bytes identical to cv2.imencode of the bgr-output pipeline's
    composited frame, end to end through ServingLoop + JpegPackingSink."""
    from conftest import model_path
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.runtime.serving import ServingLoop
    from backscrub_tpu.io.streams import JpegPackingSink

    path = model_path("segm_lite_v681.tflite")
    rng = np.random.default_rng(31)
    w, h = 160, 96
    frames = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(3)]
    bg = rng.integers(0, 256, (h, w, 3), np.uint8)

    pipe_bgr = FramePipeline(path, PipelineConfig(
        width=w, height=h, use_bilateral=False, output_format="bgr"))
    pipe_mjpg = FramePipeline(path, PipelineConfig(
        width=w, height=h, use_bilateral=False, output_format="mjpg",
        out_jpeg_quality=90))
    assert pipe_mjpg.out_jpeg_info is not None

    jpgs = []
    sink = JpegPackingSink(pipe_mjpg.out_jpeg_info, pipe_mjpg._out_jpeg_qtabs,
                           jpgs.append)
    loop = ServingLoop(pipe_mjpg, depth=2)
    it = iter(frames)
    n = loop.run(lambda: next(it, None), sink.write_yuyv,
                 background=lambda: bg)
    assert n == 3 and len(jpgs) == 3

    sf = cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420
    for i, f in enumerate(frames):
        comp, _ = pipe_bgr.step(f, bg)
        ok, ref = cv2.imencode(".jpg", np.asarray(comp),
                               [cv2.IMWRITE_JPEG_QUALITY, 90,
                                cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sf])
        assert jpgs[i] == ref.tobytes()
