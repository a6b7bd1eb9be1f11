"""End-to-end benchmark: sustained background replacement on one chip.

Headline metric (BASELINE.json north star): the fused frame program —
"camera frame goes HBM-in, composited-frame-out in one dispatch" — at
1280x720 with the Google Meet lite model, sustained over many frames with
the temporal-EMA state carried frame-serial (so steps cannot parallelize),
including per-dispatch overhead.  This is the HBM-in/HBM-out boundary the
north star defines; host<->device transfer costs (which in this container
go through a network tunnel, not PCIe) are measured and reported on stderr
for transparency.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/REF_FPS}

``--all`` additionally sweeps the BASELINE.json configs (every model
family, 1080p + animated webm background + blur mode) and writes
BENCH_DETAILS.json.

Reference baseline: the C++ reference sustains ~10 FPS at 640x480 with
DeepLab (README.md:126,177), ~30 FPS with the Meet models (BASELINE.json
"vs ~30 fps CPU reference"); we normalize against 30 FPS.
"""

import json
import os
import sys
import time

import numpy as np

from backscrub_tpu.models.specs import install_default_search_roots
from backscrub_tpu.utils.artifacts import atomic_json_dump

# Weights resolve like the CLI does: an installed ./models tree (from
# `tools/get_models.py --from-dir`) wins via resolve_path step 5; the
# mounted reference assets are only a last-resort search root for this
# container (library code never hardcodes them).
install_default_search_roots()

REF_FPS = 30.0
WARMUP = 10
ITERS = 500


def bench_assets():
    """Repo-owned portrait + animated-background assets (generated
    deterministically on first use — tools/gen_assets.py); the bench no
    longer depends on the mounted reference's backgrounds/ directory."""
    tools = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from gen_assets import ensure_assets
    return ensure_assets()


def build_pipe(model, w, h, blur=0, dtype=None, out_format="yuyv",
               precision=None, quantize=None):
    import jax
    import jax.numpy as jnp
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.models.specs import resolve_model_path

    cfg = PipelineConfig(width=w, height=h, blur_strength=blur,
                         output_format=out_format)
    return FramePipeline(resolve_model_path(model), cfg,
                         compute_dtype=dtype or jnp.float32,
                         precision=precision,  # None = per-family default
                                               # (ModelSpec.mxu_precision)
                         quantize=quantize)


def measure_scan(step, params, frames_stack, bgs_stack, ema0, iters=ITERS):
    """Tunnel-proof sustained step time, HBM->HBM.

    This container dispatches to the TPU through a remote tunnel whose
    readiness signals are NOT trustworthy: `block_until_ready` can return
    at single-dispatch latency regardless of how much queued work remains
    (measured: a batch-16 720p step "completing" in 80 us would need
    1.5 TB/s of HBM bandwidth — 1.8x the chip's spec; batch-128 implied
    13 TB/s).  So: chain ``iters`` steps inside ONE jitted lax.scan (EMA
    carried frame-serial, frames/backgrounds rotating from preloaded
    stacks, every step's output folded into a uint32 checksum) and time
    to the host fetch OF THE CHECKSUM — a value data-dependent on every
    step's full output cannot be faked.  The constant fetch/dispatch
    overhead is cancelled with a two-point fit (K=10 vs K=iters).

    Returns (step_ms_best, step_ms_median) over 3 repetitions.
    """
    import jax
    import jax.numpy as jnp

    nf = frames_stack.shape[0]
    nb = bgs_stack.shape[0]

    def make(K):
        @jax.jit
        def many(params, fr, bg, ema):
            def body(carry, i):
                ema, acc = carry
                out, _, ema = step(params, fr[i % nf], bg[i % nb], ema)
                acc = acc + out.astype(jnp.uint32).sum()
                return (ema, acc), None
            (ema, acc), _ = jax.lax.scan(body, (ema, jnp.uint32(0)),
                                         jnp.arange(K))
            return ema, acc
        return many

    k_small = 10
    small = make(k_small)
    big = make(iters)
    _ = int(small(params, frames_stack, bgs_stack, ema0)[1])  # compile
    _ = int(big(params, frames_stack, bgs_stack, ema0)[1])
    est = []
    for _ in range(6):
        t0 = time.perf_counter()
        _ = int(small(params, frames_stack, bgs_stack, ema0)[1])
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = int(big(params, frames_stack, bgs_stack, ema0)[1])
        t_big = time.perf_counter() - t0
        e = (t_big - t_small) / (iters - k_small) * 1e3
        # a tunnel hiccup during the SMALL run can make the difference
        # non-positive — that's noise, not a measurement; discard it
        if e > 0:
            est.append(e)
        if len(est) >= 3:
            break
    if not est:
        raise RuntimeError("two-point fit failed: tunnel jitter exceeded "
                           "the measured work on every repetition")
    return min(est), float(np.median(est))


def measure(pipe, w, h, iters=ITERS, bg_frames=None):
    """Sustained fps + per-step latency of the fused step, HBM->HBM
    (see measure_scan for why this is scan-chained and checksummed)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 256, (4, h, w, 3), np.uint8))
    if bg_frames is None:
        bgs = jax.device_put(rng.integers(0, 256, (1, h, w, 3), np.uint8))
    else:
        bgs = jax.device_put(np.stack(bg_frames))

    params = pipe.maskgen.model.params
    raw = pipe._make_step("explicit", pipe.cfg.flip_horizontal,
                          pipe.cfg.flip_vertical, True)
    ema0 = jnp.full(pipe.maskgen.ema_shape, 255, jnp.uint8)
    best_ms, med_ms = measure_scan(raw, params, frames, bgs, ema0,
                                   iters=iters)
    # p50 device latency = the sustained per-step time (the EMA chain makes
    # steps strictly serial, so sustained time IS the per-frame latency at
    # the HBM boundary; a host-observed dispatch latency in this container
    # would measure the tunnel's RTT instead)
    return 1e3 / best_ms, med_ms, 1e3 / med_ms


def transfer_diag(pipe, w, h):
    import jax
    rng = np.random.default_rng(1)
    host = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(4)]
    t0 = time.perf_counter()
    for i in range(8):
        jax.device_put(host[i % 4]).block_until_ready()
    up_ms = 1000 * (time.perf_counter() - t0) / 8

    params = pipe.maskgen.model.params
    step = pipe._step_bg
    bg = jax.device_put(host[0])
    ema = pipe.maskgen.ema
    outs = []
    for i in range(8):
        o, _, ema = step(params, jax.device_put(host[i % 4]), bg, ema)
        outs.append(o)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for o in outs:
        o.copy_to_host_async()
    for o in outs:
        np.asarray(o)
    down_ms = 1000 * (time.perf_counter() - t0) / 8

    # pinned-host staging path (io/staging.py), for comparison on real PCIe
    from backscrub_tpu.io.staging import StagingRing
    ring = StagingRing()
    pin_up_ms = pin_down_ms = float("nan")
    if ring.supported:
        t0 = time.perf_counter()
        for i in range(8):
            ring.upload(host[i % 4]).block_until_ready()
        pin_up_ms = 1000 * (time.perf_counter() - t0) / 8
        outs2 = []
        for i in range(8):
            o, _, ema = step(params, ring.upload(host[i % 4]), bg, ema)
            outs2.append(o)
        jax.block_until_ready(outs2)
        t0 = time.perf_counter()
        staged = [ring.to_pinned(o) for o in outs2]
        for s in staged:
            np.asarray(s)
        pin_down_ms = 1000 * (time.perf_counter() - t0) / 8
    pipe.maskgen.ema = ema
    return up_ms, down_ms, pin_up_ms, pin_down_ms


CONFIGS = [
    ("segm_lite_640x480", "segm_lite_v681.tflite", 640, 480, 0),
    ("deeplab_640x480", "deeplabv3_257_mv_gpu.tflite", 640, 480, 0),
    ("mlkit_720p", "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
     1280, 720, 0),
    ("segm_full_720p", "segm_full_v679.tflite", 1280, 720, 0),
    ("bodypix_640x480", "body-pix-float-050-8.tflite", 640, 480, 0),
    ("segm_lite_1080p_bgblur", "segm_lite_v681.tflite", 1920, 1080, 25),
    ("segm_lite_720p_bf16", "segm_lite_v681.tflite", 1280, 720, 0),
    ("segm_lite_720p_int8", "segm_lite_v681.tflite", 1280, 720, 0),
]


BATCH_CONFIGS = {
    # f32 HIGHEST holds the IoU >= 0.99 bar; bf16 is the peak-throughput
    # mode (IoU ~0.98 vs golden, see PARITY.md) and ~2.4x faster at b32
    "segm_lite_720p_batch16": (16, None),
    "segm_lite_720p_batch32_bf16": (32, "bf16"),
}


def run_batch_config(name):
    """Batched 720p aggregate throughput, isolated process per config —
    scan-chained + checksummed like measure() (tunnel-proof)."""
    import jax
    import jax.numpy as jnp
    B, mode = BATCH_CONFIGS[name]
    extra = (dict(dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT)
             if mode == "bf16" else {})
    pipe = build_pipe("segm_lite_v681.tflite", 1280, 720, **extra)
    raw = pipe._make_step("explicit", False, False, True)
    rng = np.random.default_rng(2)
    fb = jax.device_put(rng.integers(0, 256, (2, B, 720, 1280, 3), np.uint8))
    bgb = jax.device_put(rng.integers(0, 256, (1, B, 720, 1280, 3), np.uint8))
    emab = jnp.full((B,) + pipe.maskgen.ema_shape, 255, jnp.uint8)
    best_ms, med_ms = measure_scan(raw, pipe.maskgen.model.params,
                                   fb, bgb, emab, iters=60)
    print(json.dumps({"config": name, "fps": round(B / best_ms * 1e3, 1),
                      "fps_median": round(B / med_ms * 1e3, 1),
                      "step_ms": round(best_ms, 3), "p50_ms": None}))


E2E_CONFIGS = {
    # depth, staging, drain_thread.  "serial" drains synchronously after
    # every submit — the un-overlapped baseline the pipelined depths must
    # beat.  "_thread" moves the blocking D2H + sink onto a consumer thread
    # so downloads overlap the submit side's uploads/dispatch.
    "e2e_720p_serial": (0, False, False),
    "e2e_720p_servingloop_d1": (1, False, False),
    "e2e_720p_servingloop_d2": (2, False, False),
    "e2e_720p_servingloop_d3": (3, False, False),
    "e2e_720p_servingloop_d3_staged": (3, True, False),
    "e2e_720p_servingloop_d3_thread": (3, False, True),
}

E2E_FRAMES = int(os.environ.get("BENCH_E2E_FRAMES", "1000"))
E2E_WALL_CAP_S = float(os.environ.get("BENCH_E2E_WALL_CAP_S", "420"))
# tunnel-day insurance; the record reports the actual frame count


def run_e2e_config(name):
    """MEASURED end-to-end throughput: host frame bytes in -> ServingLoop
    (real per-frame host->HBM upload, fused step, HBM->host download) ->
    sink callback, sustained.  This is the BASELINE north star's "sustained
    end-to-end" wording measured directly instead of estimated from separate
    transfer timings; per-frame latency = submit->sink-delivery time.
    """
    import jax
    from backscrub_tpu.runtime.serving import ServingLoop

    depth, staging, drain_thread = E2E_CONFIGS[name]
    pipe = build_pipe("segm_lite_v681.tflite", 1280, 720)
    rng = np.random.default_rng(3)
    # 8 distinct host frames so uploads can't be cached/deduped
    host = [rng.integers(0, 256, (720, 1280, 3), np.uint8) for _ in range(8)]
    bg = jax.device_put(host[0])  # background is static: uploaded once

    submit_t = []
    deliver_t = []
    sunk_bytes = [0]

    def sink(arr: np.ndarray):
        sunk_bytes[0] += arr.nbytes
        deliver_t.append(time.perf_counter())

    loop = ServingLoop(pipe, depth=max(depth, 1), staging=staging,
                       drain_thread=drain_thread)

    def one_frame(i):
        submit_t.append(time.perf_counter())
        loop.submit(host[i % 8], bg)
        if depth == 0:
            loop.drain_all(sink)   # synchronous: no overlap
        else:
            loop.drain_ready(sink)

    for i in range(20):  # warmup: compile + fill the ring
        one_frame(i)
    loop.drain_all(sink)
    submit_t.clear(); deliver_t.clear()

    n = 0
    t0 = time.perf_counter()
    while n < E2E_FRAMES and time.perf_counter() - t0 < E2E_WALL_CAP_S:
        one_frame(n)
        n += 1
    loop.drain_all(sink)
    dt = time.perf_counter() - t0
    loop.close()

    lats = 1000.0 * (np.array(deliver_t) - np.array(submit_t[:len(deliver_t)]))
    print(json.dumps({
        "config": name, "fps": round(n / dt, 2), "p50_ms": None,
        "frames": n, "depth": depth, "staging": staging,
        "drain_thread": drain_thread,
        "sink_p50_ms": round(float(np.percentile(lats, 50)), 2),
        "sink_p99_ms": round(float(np.percentile(lats, 99)), 2),
        "host_mb_per_s": round(sunk_bytes[0] / dt / 1e6, 1),
    }))


def run_mjpg_config(name):
    """Synthetic MJPG camera, paced at a real camera rate (a V4L2 DQBUF
    blocks until the next frame, so a production reader thread sleeps most
    of its duty cycle — an unpaced producer would burn GIL/CPU the real
    path never does).  Three measurements:

      fps_nodecode : pre-decoded frames (ceiling, no JPEG work at all)
      fps_inline   : cv2.imdecode on the consumer's critical path
      fps_prefetch : full host decode in a LatestFrameReader thread
      fps          : device decode (shipped path): host does only the
                     Huffman entropy decode (JpegSource thread); IDCT/
                     upsample/color run on device (pipeline/jpeg.py)

    Evidence for taking MJPG decode off the critical path; reference
    negotiates MJPG via -f (deepseg.cc:543-570).
    """
    import cv2
    import jax
    from backscrub_tpu.io.jpeg import JpegEntropyDecoder
    from backscrub_tpu.io.streams import JpegSource, LatestFrameReader
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.models.specs import resolve_model_path
    from backscrub_tpu.runtime.serving import ServingLoop

    CAM_FPS = 30.0  # typical MJPG camera rate
    pipe = build_pipe("segm_lite_v681.tflite", 1280, 720)
    rng = np.random.default_rng(4)
    jpegs, decoded = [], []
    for _ in range(8):
        # webcam-realistic content: smoothed noise at quality 85 (raw noise
        # at the default q95 makes ~700 KB frames no camera ever produces,
        # inflating every host decode number ~5x)
        frame = cv2.GaussianBlur(
            rng.integers(0, 256, (720, 1280, 3), np.uint8), (21, 21), 0)
        ok, buf = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, 85])
        assert ok
        jpegs.append(buf)
        decoded.append(cv2.imdecode(buf, cv2.IMREAD_COLOR))
    bg = jax.device_put(rng.integers(0, 256, (720, 1280, 3), np.uint8))
    frames = min(E2E_FRAMES, 400)
    sink_count = [0]

    def sink(arr):
        sink_count[0] += 1

    t_dec0 = time.perf_counter()
    for i in range(20):
        cv2.imdecode(jpegs[i % 8], cv2.IMREAD_COLOR)
    decode_ms = (time.perf_counter() - t_dec0) / 20 * 1e3
    # host cost of the device path: entropy decode only
    _ed = JpegEntropyDecoder()
    _ed.decode(jpegs[0].tobytes())
    t_ent0 = time.perf_counter()
    for i in range(20):
        _ed.decode(jpegs[i % 8].tobytes())
    entropy_ms = (time.perf_counter() - t_ent0) / 20 * 1e3

    # separate pipeline for the device-decode mode (mjpg ingest program)
    from backscrub_tpu.io.jpeg import parse_header
    jinfo = parse_header(jpegs[0].tobytes())
    pipe_dev = FramePipeline(
        resolve_model_path("segm_lite_v681.tflite"),
        PipelineConfig(width=1280, height=720, input_format="mjpg",
                       jpeg_info=jinfo))

    def run(mode: str) -> float:
        loop = ServingLoop(pipe_dev if mode == "device" else pipe, depth=3)
        idx = [0]
        next_t = [time.perf_counter()]

        def grab():  # camera-paced: blocks until the next frame is due
            now = time.perf_counter()
            if now < next_t[0]:
                time.sleep(next_t[0] - now)
            next_t[0] = max(next_t[0] + 1.0 / CAM_FPS, time.perf_counter())
            i = idx[0]
            idx[0] += 1
            return i

        def read_nodecode():
            return decoded[grab() % 8]

        def read_inline():
            return cv2.imdecode(jpegs[grab() % 8], cv2.IMREAD_COLOR)

        reader = None
        jsrc = None
        if mode == "prefetch":
            reader = LatestFrameReader(read_inline)
            read = lambda: reader.read(timeout=5.0)
        elif mode == "device":
            jsrc = JpegSource(lambda: jpegs[grab() % 8].tobytes())
            read = jsrc.read
        else:
            read = {"nodecode": read_nodecode, "inline": read_inline}[mode]
        for _ in range(20):  # warmup/compile
            loop.submit(read(), bg)
            loop.drain_ready(sink)
        t0 = time.perf_counter()
        n = 0
        while n < frames:
            loop.submit(read(), bg)
            loop.drain_ready(sink)
            n += 1
        loop.drain_all(sink)
        dt = time.perf_counter() - t0
        if reader is not None:
            reader.close()
        if jsrc is not None:
            jsrc.close()
        return n / dt

    fps_nodecode = run("nodecode")
    fps_inline = run("inline")
    fps_prefetch = run("prefetch")
    fps_device = run("device")
    print(json.dumps({
        "config": name, "fps": round(fps_device, 2), "p50_ms": None,
        "fps_prefetch_hostdecode": round(fps_prefetch, 2),
        "fps_inline_decode": round(fps_inline, 2),
        "fps_nodecode": round(fps_nodecode, 2),
        "host_decode_ms": round(decode_ms, 2),
        "host_entropy_ms": round(entropy_ms, 2),
        "cam_fps": CAM_FPS,
        "overlap_gain": round(fps_device / fps_inline, 3),
        "frames": frames,
    }))


def run_one_config(name):
    """Measure one named config; prints a JSON line.  Run in a fresh
    process: the tunnel's dispatch queue degrades after multiple pipelines
    in one process, underestimating later configs by ~10x."""
    if name in BATCH_CONFIGS:
        return run_batch_config(name)
    if name in E2E_CONFIGS:
        return run_e2e_config(name)
    if name == "e2e_720p_mjpg":
        return run_mjpg_config(name)
    import cv2
    import jax as _jax
    import jax.numpy as _jnp
    entry = next(c for c in CONFIGS if c[0] == name)
    _, model, w, h, blur = entry
    extra = {}
    if name.endswith("_bf16"):
        extra = dict(dtype=_jnp.bfloat16, precision=_jax.lax.Precision.DEFAULT)
    elif name.endswith("_int8"):
        extra = dict(quantize="int8")
    pipe = build_pipe(model, w, h, blur=blur, **extra)
    bg_frames = None
    if "1080p" in name:
        _, bg_video, _ = bench_assets()
        cap = cv2.VideoCapture(bg_video)
        bgs = []
        for _ in range(4):
            ok, f = cap.read()
            if not ok:
                break
            bgs.append(cv2.resize(f, (w, h)))
        cap.release()
        bg_frames = bgs or None
    fps, p50, fps_med = measure(pipe, w, h, iters=300, bg_frames=bg_frames)
    print(json.dumps({"config": name, "fps": round(fps, 1),
                      "fps_median": round(fps_med, 1),
                      "p50_ms": round(p50, 3)}))


def run_config_sweep(names=None, merge=False):
    """BASELINE.json configs, one subprocess per config (fresh dispatch
    queue each; the persistent XLA cache keeps re-compiles cheap)."""
    import subprocess
    results = {}
    if merge and os.path.exists("BENCH_DETAILS.json"):
        with open("BENCH_DETAILS.json") as f:
            results = json.load(f)

    if names is None:
        names = (list(BATCH_CONFIGS) + [c[0] for c in CONFIGS]
                 + list(E2E_CONFIGS) + ["e2e_720p_mjpg"])
    for name in names:
        try:
            # 2400s: a cold Mosaic compile of the body megakernel takes
            # ~10 min through the remote-compile tunnel (cached after)
            r = subprocess.run([sys.executable, __file__, "--config", name],
                               capture_output=True, text=True, timeout=2400)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            rec = json.loads(line)
            results[name] = {k: v for k, v in rec.items() if k != "config"}
            p50s = (f"p50 {rec['p50_ms']:6.3f} ms" if rec.get("p50_ms") is not None
                    else ("sink p50 %.1f ms p99 %.1f ms" % (rec["sink_p50_ms"],
                          rec["sink_p99_ms"]) if "sink_p50_ms" in rec
                          else "(aggregate)"))
            print(f"  {name:30s} {rec['fps']:10.1f} fps   {p50s}", file=sys.stderr)
        except Exception as e:  # keep the sweep robust
            results[name] = {"error": str(e)[:200]}
            print(f"  {name:30s} ERROR {e}", file=sys.stderr)
        # checkpoint after every config: a killed sweep keeps its progress
        atomic_json_dump(results, "BENCH_DETAILS.json")
    return results


def run_parity_check():
    """On-chip mask parity: every model vs the cv2+TFLite CPU golden, using
    whatever device JAX selected (TPU in deployment).  Prints per-model IoU,
    persists the full record as PARITY_ONCHIP.json (diffable across rounds;
    prose claims are not evidence — CLAUDE.md), and exits nonzero if any
    model drops below 0.99 or any identity gate fails."""
    import cv2
    # package-level helpers, NOT tests/: importing test config would pin JAX
    # to CPU and the "on-device" check would silently stop testing the TPU
    from backscrub_tpu.utils.parity import (classmap_agreement, iou,
                                            reference_maskgen)
    from backscrub_tpu.pipeline.maskgen import MaskGen
    from backscrub_tpu.models.specs import (BUNDLED_MODELS, resolve_model_path,
                                            spec_for_model)

    import jax
    print(f"parity device: {jax.devices()[0]}", file=sys.stderr)
    record = {"device": str(jax.devices()[0]), "models": {}}
    portrait, _, _ = bench_assets()  # repo-owned synthetic person portrait
    frame = cv2.imread(portrait)
    frame = cv2.resize(frame, (640, 480))
    worst = 1.0
    for name in BUNDLED_MODELS:
        p = resolve_model_path(name)
        spec = spec_for_model(p)
        golden = reference_maskgen(p, [frame] * 4, 640, 480, spec)
        mg = MaskGen(p, 640, 480)
        for _ in range(4):
            ours = mg.process(frame)
        score = iou(ours < 128, golden < 128)
        extra = ""
        if spec.decode.startswith("argmax"):
            # person-IoU is vacuous when a multi-class model sees no person
            # (empty-vs-empty = 1.0); the argmax classmap agreement is the
            # content-agnostic fidelity gate for those models
            agree = classmap_agreement(p, frame, 640, 480, spec,
                                       model=mg.model)
            score = min(score, agree)
            extra = f"  classmap agreement {agree:.4f}"
        worst = min(worst, score)
        record["models"][name] = {"iou": round(float(score), 4)}
        if extra:
            record["models"][name]["classmap_agreement"] = round(float(agree), 4)
        print(f"  {name[:52]:54s} IoU {score:.4f}{extra}", file=sys.stderr)
    # fused Pallas blend+pack identity on the real device: pipelines with
    # the kernels on vs off must emit identical bytes, per output format
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    f = cv2.resize(frame, (320, 240))
    bgf = np.roll(f, 7, axis=1).copy()
    mp = resolve_model_path("segm_lite_v681.tflite")
    pack_ok = True
    for fmt in ("yuyv", "nv12", "i420"):
        p_on = FramePipeline(mp, PipelineConfig(width=320, height=240,
                                                output_format=fmt,
                                                fused_pack=True))
        p_off = FramePipeline(mp, PipelineConfig(width=320, height=240,
                                                 output_format=fmt,
                                                 fused_pack=False))
        for _ in range(2):
            y_on, _ = p_on.step(f, bgf)
            y_off, _ = p_off.step(f, bgf)
        ok = bool((np.asarray(y_on) == np.asarray(y_off)).all())
        pack_ok = pack_ok and ok
        record.setdefault("pack_identical", {})[fmt] = ok
        print(f"  fused blend+pack kernel identical to jnp path "
              f"({fmt}): {ok}", file=sys.stderr)
    # fused phase-split edge path identity on the real device: the quadrant
    # resize + Pallas front kernel + phase-major tail vs the classic
    # lowerings (tolerance invariant: the tail's channel-difference dot is
    # a ±1-ulp summation-order change, CLAUDE.md)
    e_on = FramePipeline(mp, PipelineConfig(width=320, height=240,
                                            edge_fused=True))
    e_off = FramePipeline(mp, PipelineConfig(width=320, height=240,
                                             edge_fused=False))
    edge_ok = True
    for _ in range(3):
        m_on = np.asarray(e_on.step(f, bgf)[1])
        m_off = np.asarray(e_off.step(f, bgf)[1])
        d = np.abs(m_on.astype(np.int32) - m_off.astype(np.int32))
        ok = int(d.max()) <= 1 and float((d > 0).mean()) <= 0.005
        edge_ok = edge_ok and ok
    record["edge_tolerance_ok"] = edge_ok
    print(f"  fused edge path within tolerance of classic lowerings: "
          f"{edge_ok}", file=sys.stderr)
    # bf16 mode with the body megakernel (f32-storage kernel, DEFAULT-
    # precision dots) vs the bf16 XLA body: same tolerance invariant —
    # the mega tracks the f32 truth at least as well as the bf16 body
    # (tests/test_edge.py quantifies this), so differences are isolated
    # decode flips, not drift
    import jax.numpy as _jnp
    bkw = dict(width=640, height=480, edge_fused=True)
    b_on = FramePipeline(mp, PipelineConfig(edge_mega=True, **bkw),
                         compute_dtype=_jnp.bfloat16,
                         precision=jax.lax.Precision.DEFAULT)
    b_off = FramePipeline(mp, PipelineConfig(edge_mega=False, **bkw),
                          compute_dtype=_jnp.bfloat16,
                          precision=jax.lax.Precision.DEFAULT)
    bgframe = np.roll(frame, 7, axis=1).copy()
    bf16_ok = True
    bf16_fracs = []
    for _ in range(3):
        m_on = np.asarray(b_on.step(frame, bgframe)[1])
        m_off = np.asarray(b_off.step(frame, bgframe)[1])
        # bf16 decode flips are isolated pixels (possibly full-range in
        # the pre-EMA byte), so gate on the differing fraction — per frame
        # AND the stream mean, matching the soak Verifier invariant
        # (CLAUDE.md: frame <= 2%, stream mean <= 0.2%) so a systematic
        # ~1.9%-per-frame drift cannot pass
        frac = float((m_on != m_off).mean())
        bf16_fracs.append(frac)
        bf16_ok = bf16_ok and frac <= 0.02
    bf16_ok = bf16_ok and float(np.mean(bf16_fracs)) <= 0.002
    record["bf16_mega"] = {"ok": bf16_ok,
                           "frame_diff_fracs": [round(x, 5) for x in bf16_fracs],
                           "mean_diff_frac": round(float(np.mean(bf16_fracs)), 5)}
    print(f"  bf16 body megakernel within tolerance of bf16 XLA body: "
          f"{bf16_ok} (mean diff frac {np.mean(bf16_fracs):.5f})",
          file=sys.stderr)
    # continuation-chain tolerance (round 5): the OPT-IN chain that runs
    # the 33x33 C>=96 regime as compact-spacing rowpad kernels after the
    # prefix cut (edge_cont=True; measured slower than the XLA body —
    # PERF.md round 5 — but kept parity-proven) — masks vs the XLA body
    # path under the batched-vs-solo tolerance invariant
    cont_ok = True
    record["cont_chain"] = {}
    for cname in ("deeplabv3_257_mv_gpu.tflite", "body-pix-float-050-8.tflite"):
        cp = resolve_model_path(cname)
        c_on = MaskGen(cp, 640, 480, edge_fused=True, edge_cont=True)
        if c_on.edge is None or c_on.edge.mega_cont is None:
            record["cont_chain"][cname] = {"built": False, "ok": False}
            cont_ok = False
            continue
        c_off = MaskGen(cp, 640, 480, edge_fused=True, edge_mega=False)
        entry = {"built": True, "links": len(c_on.edge.mega_cont),
                 "full_cover": c_on.edge._body is None}
        c_ok = True
        for _ in range(3):
            a = c_on.process(frame).astype(np.int16)
            b = c_off.process(frame).astype(np.int16)
            c_ok = c_ok and (int(np.abs(a - b).max()) <= 1
                             and float((a != b).mean()) <= 0.02)
        entry["ok"] = c_ok
        record["cont_chain"][cname] = entry
        cont_ok = cont_ok and c_ok
        print(f"  continuation chain within tolerance ({cname[:40]}): "
              f"{c_ok} ({entry['links']} links)", file=sys.stderr)
    # on-chip megakernel SPAN identity (f32): the rowpad Pallas program vs
    # the span lowerings it replaces, per qualifying family — the recorded
    # artifact behind PERF.md's "matches to 5e-5 on-chip" claim
    span_rec, span_ok = _span_identity_check()
    record["mega_span_identity"] = span_rec
    record["min_iou"] = round(float(worst), 4)
    record["ok"] = bool(worst >= 0.99 and pack_ok and edge_ok and bf16_ok
                        and cont_ok and span_ok)
    atomic_json_dump(record, "PARITY_ONCHIP.json")
    print("  wrote PARITY_ONCHIP.json", file=sys.stderr)
    print(json.dumps({"metric": "min_mask_iou_on_device", "value": round(worst, 4),
                      "unit": "iou", "vs_baseline": round(worst / 0.99, 3)}))
    sys.exit(0 if record["ok"] else 1)


def _span_identity_check(atol: float = 5e-5):
    """Run each qualifying family's body megakernel ON-CHIP against the XLA
    span lowerings on a random rowpad input; return (record, ok)."""
    import jax
    import jax.numpy as jnp
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import (BUNDLED_MODELS, resolve_model_path,
                                            spec_for_model)
    from backscrub_tpu.pipeline.edge import detect_edge, _make_span_fn
    from backscrub_tpu.ops.megakernel import body_mega_for

    rec, ok = {}, True
    for name in BUNDLED_MODELS:
        p = resolve_model_path(name)
        model = load_model(p)
        info = detect_edge(model, spec_for_model(p))
        mega = None
        if info is not None and info.front_ok and info.tail_ok:
            mega = body_mega_for(model, info)
        if mega is None:
            continue
        rs, im, om = mega.rs, mega.in_meta, mega.out_meta
        rng = np.random.default_rng(7)
        x = (rng.standard_normal((1, im.rows, im.w, im.c)) * 2).astype(np.float32)
        span = _make_span_fn(model, info.body_start, info.body_end,
                             info.body_in_tensor, info.body_out_tensor)
        ref = np.asarray(jax.jit(span)(model.params, jnp.asarray(x))
                         ).astype(np.float32)[0]
        xr = np.zeros((im.c, im.rows * rs), np.float32)
        for i in range(im.rows):
            xr[:, i * rs:i * rs + im.w] = x[0, i].T
        out = np.asarray(jax.jit(mega)(jnp.asarray(xr)))
        got = np.stack([out[:, i * rs + np.arange(om.w) * om.sp].T
                        for i in range(om.rows)])
        err = float(np.abs(got - ref).max())
        rec[name] = {"max_abs_err": err, "ok": err <= atol}
        ok = ok and err <= atol
        print(f"  mega span identity {name[:40]:42s} max|err| {err:.2e} "
              f"({'ok' if err <= atol else 'FAIL'})", file=sys.stderr)
    return rec, ok


def run_attrib():
    """Attribute the SHIPPED fused 720p step's device time across its
    stages from a real per-op device trace (tools/roofline.py): the exact
    scan+checksum program the headline measures is profiled once and every
    XLA instruction is mapped to its pipeline stage via HLO source
    metadata.  (The previous prefix-timing approach compiled sub-programs
    that fuse differently from the full program and mis-attributed ~60us
    — e.g. it billed the resize einsums to "CNN".)  Merges a
    step_attribution_720p record into BENCH_DETAILS.json; full_step_us is
    within noise of the headline because it IS the headline program."""
    tools = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    import roofline

    s = roofline.analyze(batch=1, iters=10)
    rec = {
        "full_step_us": s["step_us"],
        "stage_us": s["stage_us"],
        "n_ops": s["n_ops"],
        "us_in_ops_under_1us": s["us_in_ops_under_1us"],
        "method": "device-trace of the shipped scan+checksum program "
                  "(tools/roofline.py); see roofline_720p for per-op rows",
    }
    for k, v in rec["stage_us"].items():
        print(f"  {k:16s} {v:8.1f} us", file=sys.stderr)
    print(f"  {'full step':16s} {rec['full_step_us']:8.1f} us",
          file=sys.stderr)
    results = {}
    if os.path.exists("BENCH_DETAILS.json"):
        with open("BENCH_DETAILS.json") as f:
            results = json.load(f)
    results["step_attribution_720p"] = rec
    results["roofline_720p"] = s
    atomic_json_dump(results, "BENCH_DETAILS.json")
    print(json.dumps({"metric": "step_attribution_720p_full_us",
                      "value": rec["full_step_us"], "unit": "us",
                      "vs_baseline": 1.0}))


def run_profile():
    """Capture a jax.profiler trace of the headline config (100 steps) for
    TensorBoard/Perfetto; prints the trace directory."""
    import jax
    from backscrub_tpu.utils.profiling import device_trace
    pipe = build_pipe("segm_lite_v681.tflite", 1280, 720)
    measure(pipe, 1280, 720, iters=20)  # warm + compile outside the trace
    with device_trace() as log_dir:
        measure(pipe, 1280, 720, iters=100)
    print(f"trace written to {log_dir} (view with TensorBoard/Perfetto)",
          file=sys.stderr)
    print(json.dumps({"metric": "profile_trace", "value": 100,
                      "unit": "steps", "vs_baseline": 1.0}))


def main():
    if "--config" in sys.argv:
        run_one_config(sys.argv[sys.argv.index("--config") + 1])
        return
    if "--parity" in sys.argv:
        run_parity_check()
        return
    if "--profile" in sys.argv:
        run_profile()
        return
    if "--attrib" in sys.argv:
        run_attrib()
        return
    if "--e2e" in sys.argv:
        # measured end-to-end sweep only; merges into BENCH_DETAILS.json
        run_config_sweep(names=list(E2E_CONFIGS) + ["e2e_720p_mjpg"],
                         merge=True)
        return
    import jax
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    W, H = 1280, 720
    pipe = build_pipe("segm_lite_v681.tflite", W, H)
    fps, p50, fps_med = measure(pipe, W, H)
    up_ms, down_ms, pin_up, pin_down = transfer_diag(pipe, W, H)
    e2e_ms = 1000.0 / fps + max(up_ms, down_ms)
    print(f"device pipeline: {fps:.1f} fps best / {fps_med:.1f} fps median "
          f"({1000.0/fps:.3f} ms/frame), "
          f"per-step latency {p50:.3f} ms median (EMA-serial, = p50 at the "
          f"HBM boundary; target < 5)", file=sys.stderr)
    print(f"transfers: up {up_ms:.1f} ms, down(async) {down_ms:.1f} ms "
          f"(pinned-staged: up {pin_up:.1f} ms, down {pin_down:.1f} ms) "
          f"-> serial e2e estimate {1000.0/e2e_ms:.1f} fps through this "
          f"container's tunnel (measured pipelined e2e: --e2e / --all)",
          file=sys.stderr)

    if "--all" in sys.argv:
        print("config sweep:", file=sys.stderr)
        run_config_sweep()

    print(json.dumps({
        "metric": "720p_background_replacement_fps_hbm_to_hbm",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / REF_FPS, 2),
        "median_fps": round(fps_med, 2),
    }))


if __name__ == "__main__":
    main()
