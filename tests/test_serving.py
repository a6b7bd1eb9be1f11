"""Serving-loop tests: ordering, depth semantics, drain on EOF."""

import numpy as np
import pytest

from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
from backscrub_tpu.runtime.serving import ServingLoop

from conftest import model_path


@pytest.fixture(scope="module")
def pipe():
    return FramePipeline(model_path("segm_lite_v681.tflite"),
                         PipelineConfig(width=64, height=48, use_bilateral=False))


def test_serving_preserves_order_and_count(pipe, rng):
    frames = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(10)]
    bg = np.zeros((48, 64, 3), np.uint8)
    # golden: sequential steps on a fresh pipeline state
    pipe.reset()
    golden = []
    for f in frames:
        out, _ = pipe.step(f, bg)
        golden.append(np.asarray(out).copy())

    pipe.reset()
    loop = ServingLoop(pipe, depth=3)
    got = []
    it = iter(frames)
    n = loop.run(lambda: next(it, None), got.append, background=lambda: bg)
    assert n == 10 and len(got) == 10
    for g, o in zip(golden, got):
        np.testing.assert_array_equal(g, o)


def test_serving_frame_budget(pipe, rng):
    frames = iter(rng.integers(0, 256, (20, 48, 64, 3), np.uint8))
    outs = []
    loop = ServingLoop(pipe, depth=2)
    n = loop.run(lambda: next(frames, None), outs.append, frames=5)
    assert n == 5 and len(outs) == 5


def test_serving_bad_depth(pipe):
    with pytest.raises(ValueError):
        ServingLoop(pipe, depth=0)


def test_serving_loop_soak_ring_bounded(rng):
    """300-frame soak: the in-flight ring never exceeds depth+1, every
    frame is delivered exactly once, in submission order."""
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.runtime.serving import ServingLoop
    from conftest import model_path

    pipe = FramePipeline(model_path("segm_lite_v681.tflite"),
                         PipelineConfig(width=64, height=48))
    loop = ServingLoop(pipe, depth=3)
    # stamp each frame's index into the top-left pixel block so outputs
    # are order-checkable after the YUYV pack
    frames = []
    for i in range(300):
        f = np.zeros((48, 64, 3), np.uint8)
        f[:8, :8] = (i * 97) % 251
        frames.append(f)
    got = []
    max_ring = 0
    for f in frames:
        loop.submit(f, frames[0], filter_active=False)
        max_ring = max(max_ring, len(loop._ring))
        loop.drain_ready(got.append)
    loop.drain_all(got.append)
    assert len(got) == 300
    assert max_ring <= loop.depth + 1
    # passthrough mode (filter off) means output = yuyv(frame): the stamped
    # luma block must be monotone in submission order
    lumas = [int(o[0, 0]) for o in got]
    expect = [int(np.asarray(pipe.step(f, frames[0], filter_active=False)[0])[0, 0])
              for f in (frames[0], frames[1])]
    assert lumas[0] == expect[0] and lumas[1] == expect[1]


def test_serving_drain_thread_matches_sync(pipe, rng):
    """drain_thread=True delivers the same outputs in the same order as
    the synchronous path, with all sink calls on the consumer thread."""
    import threading
    frames = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(10)]
    bg = np.zeros((48, 64, 3), np.uint8)
    pipe.reset()
    golden = []
    for f in frames:
        out, _ = pipe.step(f, bg)
        golden.append(np.asarray(out).copy())

    pipe.reset()
    loop = ServingLoop(pipe, depth=3, drain_thread=True)
    got, threads = [], set()

    def sink(arr):
        got.append(arr.copy())
        threads.add(threading.current_thread().name)

    it = iter(frames)
    n = loop.run(lambda: next(it, None), sink, background=lambda: bg)
    loop.close()
    assert n == 10 and len(got) == 10
    assert threads == {"bs-drain"}
    for g, ref in zip(got, golden):
        np.testing.assert_array_equal(g, ref)


def test_serving_drain_thread_sink_error_propagates(pipe, rng):
    pipe.reset()
    loop = ServingLoop(pipe, depth=1, drain_thread=True)
    bg = np.zeros((48, 64, 3), np.uint8)

    def bad_sink(arr):
        raise RuntimeError("sink exploded")

    with pytest.raises(RuntimeError, match="sink exploded"):
        for i in range(5):
            loop.submit(rng.integers(0, 256, (48, 64, 3), np.uint8), bg)
            loop.drain_ready(bad_sink)
        loop.drain_all(bad_sink)
    loop.close()
    loop.close()  # idempotent
