"""Host I/O layer + CLI tests (headless: file/test sources, file/null sinks)."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from backscrub_tpu.cli import parse_args, parse_geometry
from backscrub_tpu.io.background import BackgroundSource, load_background
from backscrub_tpu.io.streams import (FileFrameSink, FileSource, NullFrameSink,
                                      SyntheticSource, open_sink, open_source)

from conftest import background_image_path, background_video_path
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# CLI argument parsing (app/deepseg.cc:379-530 contract)


def test_parse_defaults():
    cfg = parse_args([])
    assert cfg["ccam"] == "/dev/video0"
    assert cfg["vcam"] == "/dev/video1"
    assert cfg["cap_geo"] == (640, 480)
    assert "selfiesegmentation_mlkit" in cfg["model"]


def test_parse_geometry_flags():
    cfg = parse_args(["--cg", "1280x720", "--vg", "1920x1080"])
    assert cfg["cap_geo"] == (1280, 720)
    assert cfg["vid_geo"] == (1920, 1080)
    assert parse_geometry("nonsense") is None


def test_parse_deprecated_wh_conflict():
    with pytest.raises(ValueError):
        parse_args(["-w", "640", "--cg", "640x480"])


def test_parse_device_prefix():
    cfg = parse_args(["-c", "video5", "-v", "video9"])
    assert cfg["ccam"] == "/dev/video5"
    assert cfg["vcam"] == "/dev/video9"
    cfg = parse_args(["-c", "test:", "-v", "null:"])
    assert cfg["ccam"] == "test:"


def test_parse_bgblur_reference_semantics():
    # odd accepted; even rejected; non-numeric falls back to 25
    # (app/deepseg.cc:420-430)
    assert parse_args(["-p", "bgblur:25"])["blur_strength"] == 25
    with pytest.raises(ValueError):
        parse_args(["-p", "bgblur:24"])
    assert parse_args(["-p", "bgblur:x"])["blur_strength"] == 25
    with pytest.raises(ValueError):
        parse_args(["-p", "nonsense:1"])


def test_parse_bg_effects():
    cfg = parse_args(["-p", "bgpixelate:12", "-p", "bgdesat"])
    assert cfg["bg_pixelate"] == 12 and cfg["bg_desaturate"]
    assert parse_args(["-p", "bgpixelate"])["bg_pixelate"] == 16  # default
    with pytest.raises(ValueError):
        parse_args(["-p", "bgpixelate:1"])


def test_usage_on_unknown():
    with pytest.raises(ValueError):
        parse_args(["--bogus"])


# ---------------------------------------------------------------------------
# sources / sinks


def test_synthetic_source_moves():
    src = SyntheticSource(64, 48)
    a, b = src.read(), src.read()
    assert a.shape == (48, 64, 3) and a.dtype == np.uint8
    assert not np.array_equal(a, b)


def test_file_source_still_image():
    path = background_image_path()
    if not os.path.exists(path):
        pytest.skip("asset missing")
    src = open_source(path, 320, 240)
    f = src.read()
    assert f.shape == (240, 320, 3)
    f2 = src.read()  # stills repeat forever
    assert np.array_equal(f, f2)


def test_file_source_video_loops():
    path = background_video_path()
    if not os.path.exists(path):
        pytest.skip("asset missing")
    src = FileSource(path, 160, 120, loop=True)
    n_frames = 0
    for _ in range(1000):
        if src.read() is None:
            break
        n_frames += 1
    assert n_frames == 1000  # looped past EOF
    src.close()


def test_latest_frame_reader_paces_and_eofs():
    """Consumer gets each frame at most once, in order, None at EOF."""
    from backscrub_tpu.io.streams import LatestFrameReader
    import time as _time

    counter = [0]

    def produce():
        if counter[0] >= 20:
            return None
        counter[0] += 1
        _time.sleep(0.002)
        return np.full((2, 2), counter[0], np.uint8)

    r = LatestFrameReader(produce)
    seen = []
    while True:
        f = r.read(timeout=2.0)
        if f is None:
            break
        seen.append(int(f[0, 0]))
    r.close()
    r.join()
    assert seen, "no frames delivered"
    assert seen == sorted(set(seen)), "stale or duplicate frame delivered"
    assert seen[-1] == 20 or len(seen) < 20  # fast producer may be skipped


def test_latest_frame_reader_skips_to_newest():
    """A slow consumer sees the newest frame, not a backlog."""
    from backscrub_tpu.io.streams import LatestFrameReader
    import time as _time

    counter = [0]

    def produce():
        if counter[0] >= 50:
            return None
        counter[0] += 1
        return np.full((1,), counter[0], np.uint8)

    r = LatestFrameReader(produce)
    _time.sleep(0.2)  # let the producer run ahead to EOF
    first = r.read(timeout=2.0)
    assert first is not None and int(first[0]) == 50
    assert r.read(timeout=2.0) is None  # nothing newer, EOF
    r.close()


def test_latest_frame_reader_overlaps_decode():
    """Decode in the reader thread overlaps consumer 'dispatch' work (the
    MJPG critical-path fix).  Asserted structurally — some decode interval
    must intersect some consumer-work interval — rather than by wall time:
    a serialized implementation (decode inside read()) has exactly zero
    overlap, while scheduler contention on this 1-core container only
    stretches the timeline without destroying overlap (the old <0.8x-serial
    wall-clock assertion was a recorded contention flake, VERDICT r4)."""
    from backscrub_tpu.io.streams import LatestFrameReader
    import time as _time

    N, DECODE_S, WORK_S = 10, 0.02, 0.02
    counter = [0]
    decode_iv, work_iv = [], []

    def produce():
        if counter[0] >= N:
            return None
        counter[0] += 1
        t0 = _time.perf_counter()
        _time.sleep(DECODE_S)  # synthetic imdecode
        decode_iv.append((t0, _time.perf_counter()))
        return np.full((1,), counter[0], np.uint8)

    r = LatestFrameReader(produce)
    got = 0
    while True:
        f = r.read(timeout=10.0)
        if f is None:
            break
        t0 = _time.perf_counter()
        _time.sleep(WORK_S)  # synthetic device dispatch
        work_iv.append((t0, _time.perf_counter()))
        got += 1
    r.close()
    assert got >= N // 2
    overlap = sum(max(0.0, min(d1, w1) - max(d0, w0))
                  for d0, d1 in decode_iv for w0, w1 in work_iv)
    assert overlap > 0.25 * WORK_S, \
        f"decode serialized with dispatch: overlap {overlap * 1e3:.1f} ms"


def test_null_sink_counts():
    sink = open_sink("null:", 64, 48)
    assert isinstance(sink, NullFrameSink)
    sink.write_yuyv(np.zeros((48, 128), np.uint8))
    assert sink.frames == 1


def test_raw_yuv_file_sink(tmp_path):
    p = str(tmp_path / "out.yuv")
    sink = FileFrameSink(p, 64, 48)
    sink.write_yuyv(np.full((48, 128), 7, np.uint8))
    sink.write_yuyv(np.full((48, 128), 9, np.uint8))
    sink.close()
    data = open(p, "rb").read()
    assert len(data) == 2 * 48 * 128
    assert data[0] == 7 and data[-1] == 9


# ---------------------------------------------------------------------------
# background source (app/background.cc behavior)


def test_background_still():
    path = background_image_path()
    if not os.path.exists(path):
        pytest.skip("asset missing")
    bg = BackgroundSource(path)
    assert not bg.video
    f = bg.grab(320, 200)
    assert f.shape == (200, 320, 3)
    bg.close()


def test_background_video_paced():
    path = background_video_path()
    if not os.path.exists(path):
        pytest.skip("asset missing")
    import time
    with BackgroundSource(path) as bg:
        assert bg.video and bg.fps > 0
        f1 = bg.grab(160, 120)
        time.sleep(3.0 / bg.fps)
        f2 = bg.grab(160, 120)
        assert f1.shape == f2.shape == (120, 160, 3)
        assert not np.array_equal(f1, f2)  # the reader thread advanced


def test_background_load_failure_returns_none():
    assert load_background("/no/such/file.png") is None


# ---------------------------------------------------------------------------
# native shim (build availability + fd write loop)


def test_bsio_loads_and_writes(tmp_path):
    from backscrub_tpu.io import v4l2
    try:
        lib = v4l2.load_bsio()
    except RuntimeError:
        pytest.skip("libbsio.so not built")
    assert b"bsio" in lib.bsio_version()
    # the write loop works on any fd, not just v4l2 devices
    p = str(tmp_path / "frame.bin")
    fd = os.open(p, os.O_WRONLY | os.O_CREAT, 0o644)
    buf = np.arange(4096, dtype=np.uint8)
    rc = lib.bsio_loopback_write(fd, buf.ctypes.data, buf.nbytes)
    os.close(fd)
    assert rc == 0
    assert open(p, "rb").read() == buf.tobytes()


def test_fourcc():
    from backscrub_tpu.io.v4l2 import fourcc
    assert fourcc("YUYV") == 0x56595559
    assert fourcc("MJPG") == 0x47504A4D


def test_cli_multi_stream_spec_parsing():
    from backscrub_tpu.cli_multi import parse_args, parse_stream_spec
    s = parse_stream_spec("src=test:,sink=null:,geo=640x480")
    assert s == {"src": "test:", "sink": "null:", "geo": (640, 480)}
    s = parse_stream_spec("src=test:,sink=null:,geo=64x48,"
                          "model=body-pix-float-050-8.tflite")
    assert s["model"] == "body-pix-float-050-8.tflite"
    with pytest.raises(ValueError):
        parse_stream_spec("src=test:,geo=640x480")  # missing sink
    with pytest.raises(ValueError):
        parse_stream_spec("src=test:,sink=null:,geo=banana")
    cfg = parse_args(["--stream", "src=test:,sink=null:,geo=64x48",
                      "--threaded", "--frames", "7"])
    assert len(cfg["streams"]) == 1 and cfg["threaded"] and cfg["frames"] == 7
    with pytest.raises(ValueError):
        parse_args([])  # no streams


def test_cli_multi_two_geometries_headless(tmp_path):
    """Two test: streams with different geometries through one process;
    .yuv sinks get the right frame counts and sizes."""
    out1 = tmp_path / "a.yuv"
    out2 = tmp_path / "b.yuv"
    r = subprocess.run(
        [sys.executable, "-m", "backscrub_tpu.cli_multi",
         "-m", "segm_lite_v681.tflite", "--frames", "3",
         "--stream", f"src=test:,sink=file:{out1},geo=64x48",
         "--stream", f"src=test:,sink=file:{out2},geo=96x64"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "BACKSCRUB_TPU_PLATFORM": "cpu",
             "BACKSCRUB_TPU_MODELS": "/root/reference/models"},
        cwd=REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "served 3 ticks" in r.stderr
    assert out1.stat().st_size == 3 * 48 * 64 * 2   # YUYV frames
    assert out2.stat().st_size == 3 * 64 * 96 * 2


def test_cli_staging_flag_runs():
    """--staging routes the serving loop through pinned-host staging and
    produces a normal run (output identity is covered by test_staging)."""
    from backscrub_tpu.cli import main
    rc = main(["-c", "test:", "-v", "null:", "--frames", "4", "--staging",
               "--cg", "64x48", "-m", "segm_lite_v681.tflite"])
    assert rc == 0


def test_cli_sink_format_nv12_file(tmp_path):
    """--sink-format nv12: device-packed 4:2:0 frames land in a raw file
    with the right frame size; a video sink decodes via cv2 NV12."""
    from backscrub_tpu.cli import main
    out = str(tmp_path / "out.yuv")
    rc = main(["-c", "test:", "-v", f"file:{out}", "--frames", "4",
               "--sink-format", "nv12", "--cg", "64x48",
               "-m", "segm_lite_v681.tflite"])
    assert rc == 0
    data = np.fromfile(out, np.uint8)
    assert data.size == 4 * 48 * 64 * 3 // 2


def test_cli_sink_format_rejects_unknown():
    from backscrub_tpu.cli import parse_args
    with pytest.raises(ValueError):
        parse_args(["--sink-format", "rgb565"])


def test_cli_sink_format_bgr24_file(tmp_path):
    from backscrub_tpu.cli import main
    out = str(tmp_path / "out.raw")
    rc = main(["-c", "test:", "-v", f"file:{out}", "--frames", "3",
               "--sink-format", "bgr24", "--cg", "64x48",
               "-m", "segm_lite_v681.tflite"])
    assert rc == 0
    data = np.fromfile(out, np.uint8)
    assert data.size == 3 * 48 * 64 * 3


def test_cli_stats_json(tmp_path):
    import json
    from backscrub_tpu.cli import main
    stats = str(tmp_path / "stats.jsonl")
    rc = main(["-c", "test:", "-v", "null:", "--frames", "5",
               "--stats-json", stats, "--cg", "64x48",
               "-m", "segm_lite_v681.tflite"])
    assert rc == 0
    lines = [json.loads(l) for l in open(stats)]
    assert lines and lines[-1].get("final") is True
    assert lines[-1]["frames"] == 5
    assert "fps" in lines[-1]


def test_cli_sigterm_graceful(tmp_path):
    """SIGTERM mid-run: the process drains and exits 0 with a final stats
    record instead of dying mid-write."""
    import json, signal, subprocess, sys as _sys, time, os as _os
    stats = str(tmp_path / "stats.jsonl")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               BACKSCRUB_TPU_PLATFORM="cpu")
    p = subprocess.Popen(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from backscrub_tpu.cli import main; import sys;"
         f"sys.exit(main(['-c','test:','-v','null:','--cg','64x48',"
         f"'-m','segm_lite_v681.tflite','--stats-json',{stats!r}]))"],
        cwd=REPO_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    # wait for it to start producing, then terminate
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.exists(stats):
        if p.poll() is not None:
            break
        time.sleep(0.5)
    time.sleep(1.0)
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=120)
    assert p.returncode == 0, err[-1500:]
    lines = [json.loads(l) for l in open(stats)]
    assert lines[-1].get("final") is True
