"""Multi-stream full-pipeline serving on the 8-device mesh."""

import numpy as np
import pytest

import jax

from backscrub_tpu.parallel.mesh import make_mesh
from backscrub_tpu.parallel.streams import MultiStreamPipeline
from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig

from conftest import model_path

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_multistream_matches_single(rng):
    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"] * 2
    ms = MultiStreamPipeline(path, cfg, S, mesh)

    frames = rng.integers(0, 256, (S, 48, 64, 3), np.uint8)
    bgs = rng.integers(0, 256, (S, 48, 64, 3), np.uint8)
    out_b, masks_b = ms.step(frames, bgs)
    out_b, masks_b = np.asarray(out_b), np.asarray(masks_b)
    assert out_b.shape == (S, 48, 128)
    assert masks_b.shape == (S, 48, 64)

    # stream 3 must equal an independent single-stream pipeline on its frames
    single = FramePipeline(path, cfg)
    out_s, mask_s = single.step(frames[3], bgs[3])
    np.testing.assert_array_equal(masks_b[3], np.asarray(mask_s))
    np.testing.assert_array_equal(out_b[3], np.asarray(out_s))


@needs_8
def test_multistream_ema_isolation(rng):
    """Feeding person-like frames to one stream must not leak into others."""
    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    frames = np.zeros((S, 48, 64, 3), np.uint8)
    frames[0] = rng.integers(0, 256, (48, 64, 3), np.uint8)
    for _ in range(3):
        _, masks = ms.step(frames)
    masks = np.asarray(masks)
    # streams 1..S-1 saw identical black frames -> identical masks
    for s in range(2, S):
        np.testing.assert_array_equal(masks[1], masks[s])


@needs_8
def test_multistream_yuyv_ingest(rng):
    """The batched pipeline accepts raw YUYV stream batches too."""
    import cv2
    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False,
                         input_format="yuyv")
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    bgr = rng.integers(0, 256, (S, 48, 64, 3), np.uint8)
    yuyv = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_YUY2).reshape(48, 128)
                     for f in bgr])
    out, masks = ms.step(yuyv)  # green-fallback background
    assert np.asarray(out).shape == (S, 48, 128)
    assert np.asarray(masks).shape == (S, 48, 64)


@needs_8
def test_multigeometry_server_bit_identical_to_solo(rng):
    """Two different stream geometries served by ONE server, per-stream
    outputs bit-identical to solo runs (VERDICT: replaces N reference
    processes each with their own geometry, app/deepseg.cc:627-804)."""
    from backscrub_tpu.runtime.multistream import MultiGeometryServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=0, height=0, use_bilateral=False)
    mesh = make_mesh(8)
    N = 3
    geos = [(64, 48), (128, 96)]
    frames = {g: [rng.integers(0, 256, (g[1], g[0], 3), np.uint8)
                  for _ in range(N)] for g in geos}
    bgs = {g: rng.integers(0, 256, (g[1], g[0], 3), np.uint8) for g in geos}

    def make_source(seq):
        it = iter(seq)
        return lambda: next(it, None)

    outs = {g: [] for g in geos}
    streams = [(make_source(frames[g]), outs[g].append, g[0], g[1], bgs[g])
               for g in geos]
    server = MultiGeometryServer(path, cfg, streams, mesh)
    assert server.n_groups == 2
    ticks = server.run()
    assert ticks == N

    for (w, h) in geos:
        assert len(outs[(w, h)]) == N
        solo = FramePipeline(path, PipelineConfig(width=w, height=h,
                                                  use_bilateral=False))
        for i in range(N):
            out_s, _ = solo.step(frames[(w, h)][i], bgs[(w, h)])
            np.testing.assert_array_equal(outs[(w, h)][i], np.asarray(out_s))


@needs_8
def test_multistream_padding_slots_never_deliver(rng):
    """Fewer sources than batch slots: padding slots ride the batch but
    deliver nothing, and real streams stay bit-identical to solo."""
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"]  # slots
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    N = 2
    seq = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(N)]
    it = iter(seq)
    got = []
    server = MultiStreamServer(ms, [lambda: next(it, None)], [got.append])
    server.run()
    assert len(got) == N
    solo = FramePipeline(path, cfg)
    for i in range(N):
        out_s, _ = solo.step(seq[i], None)
        np.testing.assert_array_equal(got[i], np.asarray(out_s))


@needs_8
def test_multistream_requires_divisible():
    path = model_path("segm_lite_v681.tflite")
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        MultiStreamPipeline(path, PipelineConfig(width=64, height=48),
                            mesh.shape["data"] + 1, mesh)


@needs_8
def test_multistream_server_pull_identity(rng):
    """MultiStreamServer (pull mode): each stream's delivered outputs match
    running that stream alone, including streams that end early (their EOF
    must not repeat or shift later deliveries).

    Identity is held to the documented batched-serving invariant (CLAUDE.md
    "Batched serving is NOT guaranteed byte-identical"; tools/soak.py
    Verifier thresholds): the batched einsums/convs sum in a different
    order than solo, and since fold_blur removed the integer round between
    mask upscale and blur, a ~1-ulp difference can survive to the output as
    +-1 on a handful of bytes (measured worst case here: 0.05% of a frame).
    Anything beyond +-1 / 2% of a frame / 0.2% stream mean is a real bug."""
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    lengths = [2, 5, 3, 5][:S]
    streams = [[rng.integers(0, 256, (48, 64, 3), np.uint8)
                for _ in range(n)] for n in lengths]
    bgs = rng.integers(0, 256, (S, 48, 64, 3), np.uint8)

    iters = [iter(fs) for fs in streams]
    sources = [lambda it=it: next(it, None) for it in iters]
    got = [[] for _ in range(S)]
    sinks = [got[s].append for s in range(S)]

    ms = MultiStreamPipeline(path, cfg, S, mesh)
    server = MultiStreamServer(ms, sources, sinks, backgrounds=bgs)
    ticks = server.run()
    assert ticks == max(lengths)

    for s in range(S):
        assert len(got[s]) == lengths[s]
        single = FramePipeline(path, cfg)
        fracs = []
        for i, f in enumerate(streams[s]):
            out, _ = single.step(f, bgs[s])
            a = np.asarray(got[s][i]).astype(np.int16)
            b = np.asarray(out).astype(np.int16)
            assert np.abs(a - b).max() <= 1, \
                f"stream {s} frame {i}: differences exceed +-1"
            frac = float((a != b).mean())
            fracs.append(frac)
            assert frac <= 0.02, \
                f"stream {s} frame {i}: {frac:.2%} of bytes differ"
        assert np.mean(fracs) <= 0.002, \
            f"stream {s}: mean differing-byte fraction {np.mean(fracs):.3%}"


@needs_8
def test_multistream_server_threaded_liveness(rng):
    """Threaded mode: reader threads with latest-frame-wins; the server
    terminates when every source ends and every live stream got output."""
    import time
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"]

    def make_source(n):
        state = {"left": n}
        def src():
            if state["left"] == 0:
                return None
            state["left"] -= 1
            time.sleep(0.002)
            return np.full((48, 64, 3), state["left"] * 13 % 251, np.uint8)
        return src

    counts = [0] * S
    def make_sink(s):
        def sink(_out):
            counts[s] += 1
        return sink

    ms = MultiStreamPipeline(path, cfg, S, mesh)
    server = MultiStreamServer(ms, [make_source(6) for _ in range(S)],
                               [make_sink(s) for s in range(S)],
                               threaded=True)
    ticks = server.run(frames=200)
    assert ticks >= 1
    assert all(c >= 1 for c in counts)


@needs_8
def test_multistream_server_validates_counts():
    from backscrub_tpu.runtime.multistream import MultiStreamServer
    path = model_path("segm_lite_v681.tflite")
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, PipelineConfig(width=64, height=48), S, mesh)
    with pytest.raises(ValueError):
        MultiStreamServer(ms, [lambda: None] * (S - 1), [print] * S)


@needs_8
def test_multistream_server_yuyv_ingest(rng):
    """The server follows the pipeline's input_format: raw (H, 2W) YUYV
    frames gather and serve (device-side ingest end-to-end)."""
    import cv2
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False,
                         input_format="yuyv")
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    bgr = rng.integers(0, 256, (S, 48, 64, 3), np.uint8)
    yuyv = [cv2.cvtColor(f, cv2.COLOR_BGR2YUV_YUY2).reshape(48, 128)
            for f in bgr]
    iters = [iter([yuyv[s]] * 3) for s in range(S)]
    sources = [lambda it=it: next(it, None) for it in iters]
    got = [[] for _ in range(S)]
    server = MultiStreamServer(ms, sources, [g.append for g in got])
    ticks = server.run()
    assert ticks == 3
    assert all(len(g) == 3 for g in got)
    assert got[0][0].shape == (48, 128)


@needs_8
def test_multistream_server_no_delivery_before_first_frame(rng):
    """Threaded mode: a stream whose source never produces must get NO
    fabricated deliveries (its batch slot runs on a placeholder)."""
    import time
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, cfg, S, mesh)

    def fast_source(n=[4]):
        if n[0] == 0:
            return None
        n[0] -= 1
        time.sleep(0.002)
        return rng.integers(0, 256, (48, 64, 3), np.uint8)

    def never_source():
        time.sleep(0.01)
        return None  # EOF without ever producing

    sources = [fast_source] + [never_source] * (S - 1)
    counts = [0] * S
    sinks = [lambda _o, s=s: counts.__setitem__(s, counts[s] + 1)
             for s in range(S)]
    server = MultiStreamServer(ms, sources, sinks, threaded=True,
                               stall_timeout=5.0)
    server.run(frames=50)
    assert counts[0] >= 1
    assert all(c == 0 for c in counts[1:])


@needs_8
def test_multistream_server_stall_timeout(rng):
    """Threaded mode with every source stalled (no frames, no EOF) must
    return once stall_timeout elapses instead of spinning forever."""
    import time
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, cfg, S, mesh)

    def forever():  # stalled: never yields a frame, never reaches EOF
        time.sleep(30)
        return None

    sources = [forever for _ in range(S)]
    server = MultiStreamServer(ms, sources,
                               [lambda _o: None for _ in range(S)],
                               threaded=True, stall_timeout=0.5)
    t0 = time.monotonic()
    ticks = server.run()
    assert ticks == 0
    assert time.monotonic() - t0 < 10


@needs_8
def test_multistream_server_nv12_ingest(rng):
    """Server gather follows input_format='nv12' (raw 4:2:0 batches)."""
    import cv2
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False,
                         input_format="nv12")
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    frames = []
    for s in range(S):
        bgr = rng.integers(0, 256, (48, 64, 3), np.uint8)
        i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
        y, u, v = i420[:48], i420[48:60].reshape(24, 32), i420[60:].reshape(24, 32)
        frames.append(np.concatenate([y, np.stack([u, v], -1).reshape(24, 64)]))
    iters = [iter([f] * 2) for f in frames]
    got = [[] for _ in range(S)]
    server = MultiStreamServer(ms, [lambda it=it: next(it, None) for it in iters],
                               [g.append for g in got])
    assert server.run() == 2
    assert all(len(g) == 2 and g[0].shape == (48, 128) for g in got)


@needs_8
def test_multistream_server_mjpg_ingest(rng):
    """input_format='mjpg': per-stream JPEG coefficient frames batch into
    one fused decode+mask+composite dispatch, bit-identical to solo runs."""
    import cv2
    from backscrub_tpu.io.jpeg import JpegEntropyDecoder, parse_header
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    w, h = 64, 48
    jpgs, per_stream = [], []
    for s in range(S):
        img = cv2.GaussianBlur(rng.integers(0, 256, (h, w, 3), np.uint8),
                               (5, 5), 0)
        # per-stream quality -> per-stream quant tables ride the batch
        ok, enc = cv2.imencode(".jpg", img,
                               [cv2.IMWRITE_JPEG_QUALITY, 70 + 3 * s])
        jpgs.append(enc.tobytes())
    info = parse_header(jpgs[0])
    cfg = PipelineConfig(width=w, height=h, use_bilateral=False,
                         input_format="mjpg", jpeg_info=info)
    ms = MultiStreamPipeline(path, cfg, S, mesh)

    decs = [JpegEntropyDecoder() for _ in range(S)]
    for s in range(S):
        coefs, qtabs = decs[s].decode(jpgs[s])
        per_stream.append((tuple(c.copy() for c in coefs), qtabs))
    iters = [iter([f] * 2) for f in per_stream]
    got = [[] for _ in range(S)]
    server = MultiStreamServer(ms, [lambda it=it: next(it, None) for it in iters],
                               [g.append for g in got])
    assert server.run() == 2
    assert all(len(g) == 2 and g[0].shape == (h, 2 * w) for g in got)

    # stream 2 must equal an independent single-stream mjpg pipeline
    single = FramePipeline(path, cfg)
    out_s, _ = single.step(per_stream[2])
    np.testing.assert_array_equal(got[2][0], np.asarray(out_s))


@needs_8
def test_multigeometry_server_mixed_bgr_and_mjpg(rng):
    """A BGR stream and an MJPG stream (different geometries) in ONE
    server: the MJPG bucket decodes on device; both bit-identical to solo."""
    import cv2
    from backscrub_tpu.io.jpeg import JpegEntropyDecoder, parse_header
    from backscrub_tpu.runtime.multistream import MultiGeometryServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=0, height=0, use_bilateral=False)
    mesh = make_mesh(8)
    N = 2

    bgr_frames = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(N)]
    jpgs = []
    for _ in range(N):
        img = cv2.GaussianBlur(rng.integers(0, 256, (64, 80, 3), np.uint8),
                               (5, 5), 0)
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 85])
        jpgs.append(enc.tobytes())
    info = parse_header(jpgs[0])
    dec = JpegEntropyDecoder()
    mjpg_frames = []
    for jpg in jpgs:
        coefs, qtabs = dec.decode(jpg)
        mjpg_frames.append((tuple(c.copy() for c in coefs), qtabs))

    def make_source(seq):
        it = iter(seq)
        return lambda: next(it, None)

    out_bgr, out_mjpg = [], []
    streams = [
        (make_source(bgr_frames), out_bgr.append, 64, 48, None),
        (make_source(mjpg_frames), out_mjpg.append, 80, 64, None, info),
    ]
    server = MultiGeometryServer(path, cfg, streams, mesh)
    assert server.n_groups == 2
    assert server.run() == N

    solo_bgr = FramePipeline(path, PipelineConfig(width=64, height=48,
                                                  use_bilateral=False))
    solo_mjpg = FramePipeline(path, PipelineConfig(
        width=80, height=64, use_bilateral=False,
        input_format="mjpg", jpeg_info=info))
    for i in range(N):
        o, _ = solo_bgr.step(bgr_frames[i])
        np.testing.assert_array_equal(out_bgr[i], np.asarray(o))
        o, _ = solo_mjpg.step(mjpg_frames[i])
        np.testing.assert_array_equal(out_mjpg[i], np.asarray(o))


@needs_8
def test_multistream_server_elastic_attach_detach(rng):
    """attach() occupies a free slot mid-run (EMA reset => outputs
    bit-identical to a solo pipeline from its first frame), detach() stops
    deliveries; a detached slot is reattachable and the new sink never
    sees a previous occupant's in-flight results."""
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    ms = MultiStreamPipeline(path, cfg, mesh.shape["data"], mesh)
    S = ms.n_streams
    assert S >= 2

    n_a, n_b = 6, 3
    frames_a = [rng.integers(0, 256, (48, 64, 3), np.uint8)
                for _ in range(n_a)]
    frames_b = [rng.integers(0, 256, (48, 64, 3), np.uint8)
                for _ in range(n_b)]
    bg_b = rng.integers(0, 256, (48, 64, 3), np.uint8)

    def make_source(seq):
        it = iter(seq)
        return lambda: next(it, None)

    out_a, out_b = [], []
    server = MultiStreamServer(ms, [make_source(frames_a)], [out_a.append],
                               depth=1)
    server.start()
    # two ticks with only A
    assert server.tick() and server.tick()
    # B connects mid-run with its own background
    slot_b = server.attach(make_source(frames_b), out_b.append,
                           background=bg_b)
    assert slot_b != 0
    for _ in range(3):
        server.tick()
    # A disconnects while results may still be in flight; B continues
    server.detach(0)
    while server.tick():
        pass
    server.finish()

    assert len(out_a) <= n_a and len(out_b) == n_b
    # B must match a solo pipeline from ITS first frame (EMA was reset)
    solo = FramePipeline(path, cfg)
    for i in range(n_b):
        o, _ = solo.step(frames_b[i], bg_b)
        np.testing.assert_array_equal(out_b[i], np.asarray(o))

    # reattach into the freed slot: new sink gets only its own results
    out_c = []
    frames_c = [rng.integers(0, 256, (48, 64, 3), np.uint8)]
    slot_c = server.attach(make_source(frames_c), out_c.append)
    assert slot_c == 0
    while server.tick():
        pass
    server.finish()
    assert len(out_c) == 1
    solo2 = FramePipeline(path, cfg)
    o, _ = solo2.step(frames_c[0])
    np.testing.assert_array_equal(out_c[0], np.asarray(o))


@needs_8
def test_multistream_server_keep_alive_and_threaded_attach(rng):
    """keep_alive: the server reports idle (False) instead of done (None)
    when its last stream ends, so a later attach() finds it serving —
    threaded mode included (attach spawns the slot's reader thread)."""
    import time as _time
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    ms = MultiStreamPipeline(path, cfg, mesh.shape["data"], mesh)

    frames_a = [rng.integers(0, 256, (48, 64, 3), np.uint8)]
    out_a, out_b = [], []
    it_a = iter(frames_a)
    server = MultiStreamServer(ms, [lambda: next(it_a, None)], [out_a.append],
                               threaded=True, depth=1, keep_alive=True)
    server.start()
    deadline = _time.monotonic() + 30
    while not out_a and _time.monotonic() < deadline:
        server.tick()
        server._drain(force=True)
        _time.sleep(0.005)
    assert out_a, "stream A never delivered"
    # A's source is exhausted; with keep_alive the server idles, not dies
    for _ in range(20):
        r = server.tick()
        if r is False:
            break
        _time.sleep(0.01)
    assert server.tick() is not None

    import threading
    frame_b = rng.integers(0, 256, (48, 64, 3), np.uint8)
    produced = threading.Event()

    def src_b():
        if produced.is_set():
            _time.sleep(0.01)
            return np.array(frame_b)  # keep the reader alive (latest-wins)
        produced.set()
        return np.array(frame_b)

    server.attach(src_b, out_b.append)
    deadline = _time.monotonic() + 30
    while not out_b and _time.monotonic() < deadline:
        server.tick()
        server._drain(force=True)
        _time.sleep(0.005)
    server.finish()
    assert out_b, "attached stream B never delivered"
    solo = FramePipeline(path, cfg)
    o, _ = solo.step(frame_b)
    np.testing.assert_array_equal(out_b[0], np.asarray(o))


@needs_8
def test_multistream_server_attach_full_raises(rng):
    from backscrub_tpu.runtime.multistream import MultiStreamServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=64, height=48, use_bilateral=False)
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    server = MultiStreamServer(ms, [lambda: None] * S,
                               [lambda _: None] * S)
    with pytest.raises(RuntimeError, match="occupied"):
        server.attach(lambda: None, lambda _: None)
    with pytest.raises(ValueError, match="not attached"):
        server.detach(S + 3)


@needs_8
def test_multigeometry_server_per_stream_models(rng):
    """Two streams with the SAME geometry but DIFFERENT models bucket into
    separate fused programs, outputs bit-identical to solo runs — N
    reference processes each pick their own -m (app/deepseg.cc:540)."""
    from backscrub_tpu.runtime.multistream import MultiGeometryServer

    lite = model_path("segm_lite_v681.tflite")
    bodypix = model_path("body-pix-float-050-8.tflite")
    cfg = PipelineConfig(width=0, height=0, use_bilateral=False)
    mesh = make_mesh(8)
    N = 2
    frames = {m: [rng.integers(0, 256, (48, 64, 3), np.uint8)
                  for _ in range(N)] for m in (lite, bodypix)}

    def make_source(seq):
        it = iter(seq)
        return lambda: next(it, None)

    outs = {m: [] for m in (lite, bodypix)}
    streams = [
        (make_source(frames[lite]), outs[lite].append, 64, 48, None, None),
        (make_source(frames[bodypix]), outs[bodypix].append, 64, 48, None,
         None, bodypix),
    ]
    server = MultiGeometryServer(lite, cfg, streams, mesh)
    assert server.n_groups == 2
    assert server.run() == N

    for m in (lite, bodypix):
        solo = FramePipeline(m, PipelineConfig(width=64, height=48,
                                               use_bilateral=False))
        for i in range(N):
            o, _ = solo.step(frames[m][i])
            np.testing.assert_array_equal(outs[m][i], np.asarray(o))


@needs_8
def test_multistream_server_mjpg_output(rng):
    """output_format='mjpg': the batched program emits coefficient pytrees;
    per-stream Huffman packs are byte-identical to solo-run encodes."""
    import cv2
    from backscrub_tpu.io.streams import JpegPackingSink
    from backscrub_tpu.runtime.multistream import MultiStreamServer
    from backscrub_tpu.runtime.serving import ServingLoop

    path = model_path("segm_lite_v681.tflite")
    mesh = make_mesh(8)
    S = mesh.shape["data"]
    w, h = 64, 48
    cfg = PipelineConfig(width=w, height=h, use_bilateral=False,
                         output_format="mjpg", out_jpeg_quality=90)
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    frames = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(S)]

    jpgs = [[] for _ in range(S)]
    sinks = [JpegPackingSink(ms.pipe.out_jpeg_info, ms.pipe._out_jpeg_qtabs,
                             jpgs[s].append).write_yuyv for s in range(S)]
    iters = [iter([f] * 2) for f in frames]
    server = MultiStreamServer(ms, [lambda it=it: next(it, None) for it in iters],
                               sinks)
    assert server.run() == 2
    assert all(len(j) == 2 for j in jpgs)

    solo = FramePipeline(path, cfg)
    solo_sink = []
    pk = JpegPackingSink(solo.out_jpeg_info, solo._out_jpeg_qtabs,
                         solo_sink.append)
    out, _ = solo.step(frames[3])
    pk.write_yuyv([np.asarray(c) for c in out])
    assert jpgs[3][0] == solo_sink[0]
    # and the emitted stream is a valid JPEG of the right geometry
    img = cv2.imdecode(np.frombuffer(jpgs[3][0], np.uint8), cv2.IMREAD_COLOR)
    assert img is not None and img.shape == (h, w, 3)


@needs_8
def test_multigeometry_server_elastic_novel_geometry(rng):
    """Attach a stream whose (model, geometry) has NO bucket: the server
    builds + warms the bucket at runtime, existing streams' outputs stay
    bit-identical to solo and uninterrupted, the newcomer matches solo
    (VERDICT r3 item 5)."""
    from backscrub_tpu.runtime.multistream import MultiGeometryServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=0, height=0, use_bilateral=False)
    mesh = make_mesh(8)
    ga, gb = (64, 48), (128, 96)
    frames_a = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(5)]
    frames_b = [rng.integers(0, 256, (96, 128, 3), np.uint8) for _ in range(3)]
    frames_c = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(2)]

    def src(seq):
        it = iter(seq)
        return lambda: next(it, None)

    out_a, out_b, out_c = [], [], []
    server = MultiGeometryServer(
        path, cfg, [(src(frames_a), out_a.append, *ga)], mesh)
    assert server.n_groups == 1
    assert server.run(frames=2) == 2
    assert len(out_a) == 2

    # novel geometry -> a second bucket compiles and splices in
    hb = server.attach(src(frames_b), out_b.append, *gb)
    assert server.n_groups == 2
    # same geometry as A -> joins A's bucket (free padding slot), no bucket
    hc = server.attach(src(frames_c), out_c.append, *ga)
    assert server.n_groups == 2
    server.run()
    assert (len(out_a), len(out_b), len(out_c)) == (5, 3, 2)

    for geo, seq, outs in ((ga, frames_a, out_a), (gb, frames_b, out_b),
                           (ga, frames_c, out_c)):
        solo = FramePipeline(path, PipelineConfig(width=geo[0], height=geo[1],
                                                  use_bilateral=False))
        fracs = []
        for i, f in enumerate(seq):
            o, _ = solo.step(f, None)
            # batched-vs-solo tolerance invariant (CLAUDE.md): +-1 bytes,
            # frame <= 2%, stream mean <= 0.2% differing
            a = np.asarray(outs[i]).astype(np.int16)
            b = np.asarray(o).astype(np.int16)
            assert np.abs(a - b).max() <= 1
            frac = float((a != b).mean())
            fracs.append(frac)
            assert frac <= 0.02
        assert np.mean(fracs) <= 0.002


@needs_8
def test_multigeometry_server_detach_retires_bucket(rng):
    """detach() of a bucket's last stream retires the bucket; other
    buckets keep serving untouched."""
    from backscrub_tpu.runtime.multistream import MultiGeometryServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=0, height=0, use_bilateral=False)
    mesh = make_mesh(8)
    out_a, out_d = [], []
    frames_a = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(2)]
    it_a = iter(frames_a)
    server = MultiGeometryServer(
        path, cfg, [(lambda: next(it_a, None), out_a.append, 64, 48)], mesh)
    hd = server.attach(lambda: rng.integers(0, 256, (24, 32, 3), np.uint8),
                       out_d.append, 32, 24)
    assert server.n_groups == 2
    server.detach(hd)
    assert server.n_groups == 1
    with pytest.raises(ValueError):
        server.detach(hd)  # slot already freed
    server.run()
    assert len(out_a) == 2


@needs_8
def test_multigeometry_server_threaded_midrun_attach(rng):
    """The live-camera story: with run() spinning in another thread, a
    novel-geometry camera connects mid-run; the existing stream keeps
    delivering through the newcomer's off-path compile and the newcomer's
    first output matches a solo pipeline's."""
    import threading
    import time as _time
    from backscrub_tpu.runtime.multistream import MultiGeometryServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=0, height=0, use_bilateral=False)
    mesh = make_mesh(8)
    frame_a = rng.integers(0, 256, (48, 64, 3), np.uint8)
    frame_b = rng.integers(0, 256, (96, 128, 3), np.uint8)
    stop = threading.Event()
    out_a, out_b = [], []

    def src_a():
        if stop.is_set():
            return None
        _time.sleep(0.002)
        return np.array(frame_a)

    def src_b():
        if stop.is_set():
            return None
        _time.sleep(0.002)
        return np.array(frame_b)

    server = MultiGeometryServer(path, cfg,
                                 [(src_a, out_a.append, 64, 48)], mesh,
                                 threaded=True, keep_alive=True,
                                 stall_timeout=5.0)
    t = threading.Thread(target=server.run, daemon=True)
    t.start()
    deadline = _time.monotonic() + 60
    while len(out_a) < 2 and _time.monotonic() < deadline:
        _time.sleep(0.01)
    assert len(out_a) >= 2, "stream A never warmed up"
    n_before = len(out_a)
    hb = server.attach(src_b, out_b.append, 128, 96)
    assert server.n_groups == 2
    deadline = _time.monotonic() + 60
    while not out_b and _time.monotonic() < deadline:
        _time.sleep(0.01)
    assert out_b, "attached novel-geometry stream never delivered"
    assert len(out_a) > n_before, "existing stream stalled during attach"
    stop.set()
    t.join(timeout=60)
    assert not t.is_alive()
    solo = FramePipeline(path, PipelineConfig(width=128, height=96,
                                              use_bilateral=False))
    o, _ = solo.step(frame_b, None)
    a = np.asarray(out_b[0]).astype(np.int16)
    b = np.asarray(o).astype(np.int16)
    assert np.abs(a - b).max() <= 1 and float((a != b).mean()) <= 0.02


@needs_8
def test_multigeometry_server_bucket_capacity_grows(rng):
    """Attaching one more stream than a bucket has slots GROWS the bucket
    instead of raising (VERDICT r4 item 5): a larger sibling compiles off
    the tick path, every occupied slot migrates — including the per-stream
    temporal EMA state, so existing streams' outputs stay within the
    batched-vs-solo tolerance invariant across the splice — and handles
    issued before the grow still detach the right stream after it."""
    from backscrub_tpu.runtime.multistream import MultiGeometryServer

    path = model_path("segm_lite_v681.tflite")
    cfg = PipelineConfig(width=0, height=0, use_bilateral=False)
    mesh = make_mesh(8)
    D = mesh.shape["data"]
    w, h = 64, 48
    n_frames = 4
    seqs = [[rng.integers(0, 256, (h, w, 3), np.uint8)
             for _ in range(n_frames)] for _ in range(D + 1)]
    outs = [[] for _ in range(D + 1)]

    def src(seq):
        it = iter(seq)
        return lambda: next(it, None)

    # D-1 ctor members + 1 attach = a FULL initial bucket (D slots)
    server = MultiGeometryServer(
        path, cfg,
        [(src(seqs[s]), outs[s].append, w, h) for s in range(D - 1)], mesh)
    h_pre = server.attach(src(seqs[D - 1]), outs[D - 1].append, w, h)
    srv0 = server.servers[0]
    assert srv0.ms.n_streams == D
    assert sum(s is not None for s in srv0.sources) == D
    # two ticks so every stream's EMA is mid-decay when the grow happens
    assert server.run(frames=2) == 2
    # slot D+1: must grow the bucket, not raise and not fork a new bucket
    server.attach(src(seqs[D]), outs[D].append, w, h)
    assert server.n_groups == 1
    grown = server.servers[0]
    assert grown is not srv0 and grown.ms.n_streams == 2 * D
    assert h_pre.srv is grown  # pre-grow handles were rewritten
    server.run()
    assert all(len(o) == n_frames for o in outs)

    # per-stream parity vs solo ACROSS the splice: frames 3-4 ride the
    # migrated EMA — a reset (or lost migration) would blow the invariant
    solo_cfg = PipelineConfig(width=w, height=h, use_bilateral=False)
    for s in range(D + 1):
        solo = FramePipeline(path, solo_cfg)
        fracs = []
        for i, f in enumerate(seqs[s]):
            o, _ = solo.step(f, None)
            a = np.asarray(outs[s][i]).astype(np.int16)
            b = np.asarray(o).astype(np.int16)
            assert np.abs(a - b).max() <= 1
            frac = float((a != b).mean())
            fracs.append(frac)
            assert frac <= 0.02
        assert np.mean(fracs) <= 0.002

    # a pre-grow handle detaches cleanly from the grown bucket
    server.detach(h_pre)
    assert sum(s is not None for s in grown.sources) == D
