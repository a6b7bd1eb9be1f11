"""Pinned-host staging (io/staging.py): correctness on every backend.

The perf effect (DMA-eligible transfers) only shows on real PCIe-attached
hardware; these tests pin down the contract — staged transfers are
bit-identical to plain ones, the ring bounds in-flight downloads, and the
ServingLoop produces the same bytes with staging on or off.
"""

import numpy as np
import pytest

import jax

from conftest import model_path
from backscrub_tpu.io.staging import StagingRing, pinned_supported


def test_pinned_supported_probe_runs():
    # CPU backend exposes pinned_host in this JAX; either answer is valid,
    # the probe must just not throw.
    assert pinned_supported() in (True, False)


def test_upload_roundtrip_bit_exact(rng):
    ring = StagingRing()
    x = rng.integers(0, 256, (48, 64, 3), np.uint8)
    dev = ring.upload(x)
    assert dev.sharding.memory_kind in ("device", None) or not ring.supported
    np.testing.assert_array_equal(np.asarray(dev), x)
    np.testing.assert_array_equal(ring.fetch(dev), x)


def test_upload_accepts_noncontiguous(rng):
    ring = StagingRing()
    x = rng.integers(0, 256, (48, 128, 3), np.uint8)[:, ::2]
    np.testing.assert_array_equal(np.asarray(ring.upload(x)), x)


def test_ring_depth_semantics(rng):
    ring = StagingRing(depth=2)
    xs = [rng.integers(0, 256, (16, 16), np.uint8) for _ in range(5)]
    devs = [ring.upload(x) for x in xs]
    got = []
    for d in devs:
        ring.stage_out(d)
        got.extend(ring.drain())
    assert len(got) == 3  # 5 staged, 2 still in flight
    got.extend(ring.drain(force=True))
    assert len(got) == 5
    for a, b in zip(got, xs):
        np.testing.assert_array_equal(a, b)


def test_bad_depth_rejected():
    with pytest.raises(ValueError):
        StagingRing(depth=0)


def test_serving_loop_staged_matches_plain(rng):
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.runtime.serving import ServingLoop

    path = model_path("segm_lite_v681.tflite")
    frames = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(6)]
    bg = rng.integers(0, 256, (48, 64, 3), np.uint8)

    outs = {}
    for staged in (False, True):
        pipe = FramePipeline(path, PipelineConfig(width=64, height=48))
        loop = ServingLoop(pipe, depth=2, staging=staged)
        it = iter(frames)
        got = []
        loop.run(lambda: next(it, None), got.append, background=lambda: bg)
        outs[staged] = got
    assert len(outs[False]) == len(outs[True]) == len(frames)
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)
