"""Device-side MJPG decode: bsjpeg entropy decode + on-device IDCT/upsample/
color, bit-exact vs cv2.imdecode (libjpeg-turbo defaults).

Reference decodes MJPG on the host inside cv::VideoCapture
(app/deepseg.cc:629-632, format negotiated at :543-570); here only the
Huffman decode is host work and the parity bar is exact bytes.
"""

import subprocess

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
jnp = pytest.importorskip("jax.numpy")

from backscrub_tpu.io.jpeg import (JpegEntropyDecoder, load_bsjpeg,
                                   parse_header)
from backscrub_tpu.pipeline.jpeg import decode_jpeg_bgr


def _build_native():
    try:
        load_bsjpeg()
        return
    except RuntimeError:
        pass
    subprocess.run(["cmake", "-S", "native", "-B", "native/build"],
                   check=True, capture_output=True)
    subprocess.run(["cmake", "--build", "native/build"],
                   check=True, capture_output=True)
    load_bsjpeg()


@pytest.fixture(scope="module", autouse=True)
def native_lib():
    _build_native()


def _smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return cv2.GaussianBlur(img, (7, 7), 0)


def _roundtrip(img, params):
    ok, enc = cv2.imencode(".jpg", img, params)
    assert ok
    dec = JpegEntropyDecoder()
    coefs, qtabs = dec.decode(enc.tobytes())
    ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    out = np.asarray(decode_jpeg_bgr([jnp.asarray(c) for c in coefs],
                                     jnp.asarray(qtabs), dec.info))
    return out, ref, dec.info


SAMPLINGS = ["420", "422", "444", "440", "411"]


@pytest.mark.parametrize("sampling", SAMPLINGS)
@pytest.mark.parametrize("quality", [30, 75, 95])
def test_bit_exact_vs_cv2(sampling, quality):
    sf = getattr(cv2, f"IMWRITE_JPEG_SAMPLING_FACTOR_{sampling}")
    img = _smooth(120, 164, seed=quality)
    out, ref, _ = _roundtrip(img, [cv2.IMWRITE_JPEG_QUALITY, quality,
                                   cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sf])
    np.testing.assert_array_equal(out, ref)


def test_bit_exact_noise_420():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (97, 131, 3), dtype=np.uint8)  # odd dims
    out, ref, info = _roundtrip(img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert (info.width, info.height) == (131, 97)
    np.testing.assert_array_equal(out, ref)


def test_grayscale():
    g = cv2.cvtColor(_smooth(64, 80), cv2.COLOR_BGR2GRAY)
    out, ref, info = _roundtrip(g, [cv2.IMWRITE_JPEG_QUALITY, 85])
    assert info.ncomp == 1
    np.testing.assert_array_equal(out, ref)


def test_restart_markers():
    img = _smooth(96, 144, seed=7)
    out, ref, _ = _roundtrip(img, [cv2.IMWRITE_JPEG_QUALITY, 85,
                                   cv2.IMWRITE_JPEG_RST_INTERVAL, 3])
    np.testing.assert_array_equal(out, ref)


def test_optimized_huffman_tables():
    img = _smooth(96, 144, seed=8)
    out, ref, _ = _roundtrip(img, [cv2.IMWRITE_JPEG_QUALITY, 85,
                                   cv2.IMWRITE_JPEG_OPTIMIZE, 1])
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("dims", [(8, 8), (1, 1), (17, 9)])
def test_tiny_images(dims):
    rng = np.random.default_rng(dims[0])
    img = rng.integers(0, 256, (*dims, 3), dtype=np.uint8)
    out, ref, _ = _roundtrip(img, [cv2.IMWRITE_JPEG_QUALITY, 60])
    np.testing.assert_array_equal(out, ref)


def test_missing_dht_uses_annex_k_defaults():
    """MJPEG streams routinely omit DHT; the Annex K defaults must kick in.
    Built by stripping DHT segments from a default-table cv2 JPEG."""
    img = _smooth(64, 96, seed=9)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 85])
    b = enc.tobytes()
    out = bytearray(b[:2])
    i = 2
    while i < len(b):
        m = b[i + 1]
        if m == 0xDA:
            out += b[i:]
            break
        seglen = (b[i + 2] << 8) | b[i + 3]
        if m != 0xC4:  # drop DHT
            out += b[i:i + 2 + seglen]
        i += 2 + seglen
    dec = JpegEntropyDecoder()
    coefs, qtabs = dec.decode(bytes(out))
    ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    got = np.asarray(decode_jpeg_bgr([jnp.asarray(c) for c in coefs],
                                     jnp.asarray(qtabs), dec.info))
    np.testing.assert_array_equal(got, ref)


def test_progressive_rejected():
    ok, enc = cv2.imencode(".jpg", _smooth(32, 32),
                           [cv2.IMWRITE_JPEG_PROGRESSIVE, 1])
    with pytest.raises(ValueError, match="unsupported"):
        parse_header(enc.tobytes())


def test_truncated_and_garbage_rejected():
    ok, enc = cv2.imencode(".jpg", _smooth(32, 32), [])
    jpg = enc.tobytes()
    with pytest.raises(ValueError):
        parse_header(jpg[:20])          # truncated header
    with pytest.raises(ValueError):
        parse_header(b"\x00" * 64)      # not a JPEG
    dec = JpegEntropyDecoder()
    dec.decode(jpg)
    with pytest.raises(ValueError):     # geometry change mid-stream
        ok2, enc2 = cv2.imencode(".jpg", _smooth(64, 64), [])
        dec.decode(enc2.tobytes())


def test_decoder_reuses_buffers():
    img = _smooth(48, 64)
    ok, enc = cv2.imencode(".jpg", img, [])
    dec = JpegEntropyDecoder()
    c1, _ = dec.decode(enc.tobytes())
    c2, _ = dec.decode(enc.tobytes())
    assert c1[0] is c2[0]  # same preallocated arrays


def test_header_parse_info():
    img = _smooth(480, 640)
    sf = cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sf])
    info = parse_header(enc.tobytes())
    assert (info.width, info.height, info.ncomp) == (640, 480, 3)
    assert info.is_420 and not info.is_422
    assert info.blocks[0] == (60, 80) and info.blocks[1] == (30, 40)


# ---- pipeline integration ---------------------------------------------------

def test_frame_pipeline_mjpg_matches_bgr_path():
    """input_format='mjpg' (device decode fused into the frame program)
    must produce output bit-identical to the bgr path fed with the
    cv2-decoded frame (the decodes are bit-exact, so everything after is
    the same program)."""
    from conftest import model_path
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    path = model_path("segm_lite_v681.tflite")
    rng = np.random.default_rng(11)
    w, h = 160, 96
    bg = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    pipe_bgr = FramePipeline(path, PipelineConfig(width=w, height=h))
    jpgs = []
    for i in range(4):
        frame = cv2.GaussianBlur(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), (5, 5), 0)
        ok, enc = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, 88])
        jpgs.append(enc.tobytes())

    from backscrub_tpu.io.jpeg import JpegEntropyDecoder, parse_header
    info = parse_header(jpgs[0])
    pipe_mjpg = FramePipeline(path, PipelineConfig(
        width=w, height=h, input_format="mjpg", jpeg_info=info))
    dec = JpegEntropyDecoder()
    for jpg in jpgs:
        coefs, qtabs = dec.decode(jpg)
        ref_frame = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
        out_b, mask_b = pipe_bgr.step(ref_frame, bg)
        out_m, mask_m = pipe_mjpg.step(
            (tuple(c.copy() for c in coefs), qtabs), bg)
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_b))
        np.testing.assert_array_equal(np.asarray(mask_m), np.asarray(mask_b))


def test_jpeg_source_threads_and_eof():
    from backscrub_tpu.io.streams import JpegSource
    img = _smooth(48, 64, seed=12)
    ok, enc = cv2.imencode(".jpg", img, [])
    jpg = enc.tobytes()
    n = [0]

    def grab():
        n[0] += 1
        return jpg if n[0] <= 5 else None

    src = JpegSource(grab)
    assert (src.width, src.height) == (64, 48)
    got = 0
    while True:
        f = src.read()
        if f is None:
            break
        coefs, qtabs = f
        assert coefs[0].dtype == np.int16 and qtabs.shape == (3, 64)
        got += 1
    assert 1 <= got <= 5  # latest-frame-wins may skip, never exceeds produced
    src.close()


def test_mjpg_config_validation():
    from conftest import model_path
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    path = model_path("segm_lite_v681.tflite")
    with pytest.raises(ValueError, match="jpeg_info"):
        FramePipeline(path, PipelineConfig(width=64, height=48,
                                           input_format="mjpg"))
    ok, enc = cv2.imencode(".jpg", _smooth(48, 64), [])
    from backscrub_tpu.io.jpeg import parse_header
    info = parse_header(enc.tobytes())
    with pytest.raises(ValueError, match="capture geometry"):
        FramePipeline(path, PipelineConfig(width=128, height=96,
                                           input_format="mjpg",
                                           jpeg_info=info))


def test_fuzz_byte_flips_never_crash():
    """Seeded byte-flip fuzz: mutated JPEGs must decode or reject cleanly,
    never crash/overflow (the native decoder parses untrusted camera bytes).
    A 20k-iteration ASAN+UBSAN sweep of the same mutator ran clean; this
    keeps a fast regression in the suite."""
    rng = np.random.default_rng(99)
    img = _smooth(49, 67, seed=99)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 80,
                                         cv2.IMWRITE_JPEG_RST_INTERVAL, 2])
    orig = bytearray(enc.tobytes())
    from backscrub_tpu.io.jpeg import JpegEntropyDecoder
    decoded = rejected = 0
    for it in range(300):
        buf = bytearray(orig)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        if it % 7 == 1:
            buf = buf[:rng.integers(4, len(buf))]
        try:
            dec = JpegEntropyDecoder()
            dec.decode(bytes(buf))
            decoded += 1
        except ValueError:
            rejected += 1
    assert decoded + rejected == 300


def test_oversized_sof_rejected():
    """Hostile SOF dims must reject cleanly (ValueError), not OOM: the C
    side caps dims at 16384 and the decoder caps total pixels before
    allocating coefficient buffers."""
    img = _smooth(16, 16)
    ok, enc = cv2.imencode(".jpg", img, [])
    b = bytearray(enc.tobytes())
    # find SOF0 and patch height/width to 0x3FF0 (16368 — passes the C cap,
    # 268 MP fails the python max_pixels cap)
    i = 2
    while not (b[i] == 0xFF and b[i + 1] == 0xC0):
        i += 2 + ((b[i + 2] << 8) | b[i + 3])
    b[i + 5:i + 9] = bytes([0x3F, 0xF0, 0x3F, 0xF0])
    dec = JpegEntropyDecoder()
    with pytest.raises(ValueError, match="max_pixels"):
        dec.decode(bytes(b))
    # beyond the C-side cap -> unsupported at parse
    b[i + 5:i + 9] = bytes([0xFF, 0xF0, 0xFF, 0xF0])
    with pytest.raises(ValueError, match="unsupported|corrupt"):
        parse_header(bytes(b))


def test_single_native_call_per_frame_refreshes_qtabs():
    """After the first frame, decode() is one bsjpeg_decode call that still
    returns the CURRENT frame's quant tables (some encoders re-tune them)."""
    img = _smooth(32, 48, seed=5)
    ok1, e1 = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 60])
    ok2, e2 = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    dec = JpegEntropyDecoder()
    _, q60 = dec.decode(e1.tobytes())
    _, q95 = dec.decode(e2.tobytes())   # same geometry, new tables
    assert not np.array_equal(q60, q95)
    _, q60b = dec.decode(e1.tobytes())
    np.testing.assert_array_equal(q60, q60b)
