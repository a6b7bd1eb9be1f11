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
def test_multistream_requires_divisible():
    path = model_path("segm_lite_v681.tflite")
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        MultiStreamPipeline(path, PipelineConfig(width=64, height=48),
                            mesh.shape["data"] + 1, mesh)
