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


def test_stage_fps_decoupled_from_loop_fps():
    """Throttled sink: the AI (dispatch) rate must read higher than the
    main-loop rate — the reference's dual-FPS semantics (deepseg.cc:702-719)."""
    from backscrub_tpu.utils.timing import StageTimer
    t = StageTimer(window=16)
    now = [0]

    def fake_clock():
        return now[0]

    import backscrub_tpu.utils.timing as timing
    orig = timing.time.perf_counter_ns
    timing.time.perf_counter_ns = fake_clock
    try:
        for _ in range(8):
            t.start()
            now[0] += 2_000_000   # 2 ms grab
            t.mark("grab")
            now[0] += 1_000_000   # 1 ms model step
            t.mark("dispatch")
            now[0] += 17_000_000  # 17 ms throttled sink
            t.mark("sink")
            t.frame_done()
    finally:
        timing.time.perf_counter_ns = orig
    assert t.stage_fps("dispatch") == pytest.approx(1000.0, rel=1e-6)
    assert t.fps == pytest.approx(50.0, rel=1e-6)
    assert t.stage_fps("dispatch") > 2 * t.fps
    assert "AiFPS:1000.0" in t.report_line()
    assert t.report_dict()["ai_fps"] == 1000.0


def test_debug_window_headless_detection(monkeypatch):
    """No DISPLAY/WAYLAND_DISPLAY -> unavailable without touching cv2 (some
    headless builds don't raise from namedWindow)."""
    from backscrub_tpu.utils.debug_ui import DebugWindow
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    w = DebugWindow()
    assert not w.available
    # show/close are safe no-ops when unavailable
    w.show(np.zeros((8, 8, 3), np.uint8), DebugState())
    w.close()


def test_debug_window_degrades_on_imshow_failure(monkeypatch):
    """A window that opened but whose display fails at imshow must flip to
    unavailable instead of crashing the serve loop."""
    from backscrub_tpu.utils import debug_ui

    class FakeCv2:
        WINDOW_AUTOSIZE = 1

        def namedWindow(self, *a, **k):
            pass

        def imshow(self, *a, **k):
            raise RuntimeError("display went away")

        def destroyWindow(self, *a):
            pass

    monkeypatch.setenv("DISPLAY", ":0")
    monkeypatch.setitem(__import__("sys").modules, "cv2", FakeCv2())
    w = debug_ui.DebugWindow()
    assert w.available
    w.show(np.zeros((8, 8, 3), np.uint8), DebugState())
    assert not w.available  # degraded, no exception escaped
    w.close()


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
