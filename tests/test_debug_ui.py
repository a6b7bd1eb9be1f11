"""Debug HUD tests: keyboard map and pic-in-pic composition (headless)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from backscrub_tpu.utils.debug_ui import DebugState, compose_debug_view


def key(c):
    return ord(c)


def test_keyboard_map_matches_reference():
    s = DebugState()
    s.handle_key(key("s"))
    assert not s.filter_active
    s.handle_key(key("h"))
    assert s.flip_horizontal
    s.handle_key(key("v"))
    assert s.flip_vertical
    s.handle_key(key("f"))
    assert not s.show_fps
    s.handle_key(key("b"))
    assert not s.show_background
    s.handle_key(key("m"))
    assert not s.show_mask
    s.handle_key(key("?"))
    assert s.show_help
    s.handle_key(key("q"))
    assert not s.running
    s.handle_key(-1)  # no key pressed: no-op


def test_compose_overlays():
    out = np.zeros((480, 640, 3), np.uint8)
    mask = np.full((480, 640), 255, np.uint8)
    mask[100:200, 100:200] = 0
    thumb = np.full((120, 160, 3), 128, np.uint8)
    view = compose_debug_view(out, DebugState(), mask=mask, bg_thumb=thumb,
                              main_fps=30.0, ai_fps=25.0,
                              cap_geo=(640, 480), vid_geo=(640, 480))
    assert view.shape == out.shape
    # background thumb at top-left
    assert (view[1:119, 1:159] == 128).all()
    # mask pic-in-pic top-right is grayscale content
    tr = view[0:120, 640 - 160:640]
    assert tr.max() > 0
    # status text modified the bottom rows
    assert view[-20:].max() > 0
    # original is untouched
    assert out.max() == 0


def test_compose_toggles_off():
    out = np.zeros((480, 640, 3), np.uint8)
    s = DebugState(show_fps=False, show_mask=False, show_background=False)
    view = compose_debug_view(out, s, mask=np.zeros((480, 640), np.uint8),
                              bg_thumb=np.full((120, 160, 3), 50, np.uint8))
    assert view.max() == 0  # nothing drawn


def test_runtime_toggle_variants_pipeline():
    """filter off / flips produce distinct outputs via cached jit variants."""
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from conftest import model_path
    path = model_path("segm_lite_v681.tflite")
    pipe = FramePipeline(path, PipelineConfig(width=64, height=48,
                                              output_format="bgr",
                                              use_bilateral=False))
    frame = np.random.default_rng(0).integers(0, 256, (48, 64, 3), np.uint8)
    bg = np.zeros((48, 64, 3), np.uint8)
    out_on, _ = pipe.step(frame, bg)
    out_off, _ = pipe.step(frame, bg, filter_active=False)
    # passthrough returns the camera frame untouched
    np.testing.assert_array_equal(np.asarray(out_off), frame)
    assert not np.array_equal(np.asarray(out_on), frame)
    out_flip, _ = pipe.step(frame, bg, filter_active=False, flip_horizontal=True)
    np.testing.assert_array_equal(np.asarray(out_flip), frame[:, ::-1])
