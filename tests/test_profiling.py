"""Profiling utilities smoke tests."""

import glob
import os

import numpy as np

import jax.numpy as jnp

from backscrub_tpu.utils.profiling import annotate, device_trace, wall_timer
from backscrub_tpu.utils.timing import StageTimer


def test_device_trace_produces_events(tmp_path):
    d = str(tmp_path / "trace")
    with device_trace(d):
        with annotate("test-region"):
            x = jnp.arange(1024.0)
            (x * 2).block_until_ready()
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace files written"


def test_wall_timer_records():
    out = {}
    with wall_timer("stage", out):
        sum(range(1000))
    assert out["stage"] >= 0


def test_stage_timer_report():
    t = StageTimer()
    for _ in range(3):
        t.start()
        t.mark("grab")
        t.mark("dispatch")
        t.frame_done()
    line = t.report_line()
    assert "grab" in line and "FPS" in line
    assert t.fps > 0
