"""Profiling: device-side traces + stage callbacks.

The reference's observability seam is per-stage nanosecond callbacks
(lib/libbackscrub.h:24-30 wired at app/deepseg.cc:219-233).  With the whole
frame fused into one dispatch, intra-frame breakdowns come from XLA traces
instead: ``with device_trace("..."):`` captures a jax.profiler trace
viewable in TensorBoard/Perfetto; ``StageTimer`` (utils/timing.py) covers
the host-visible stages.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/backscrub_tpu_trace"):
    """Capture a jax.profiler trace of everything inside the block."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label: str, out: dict | None = None):
    """Simple labelled wall-clock scope; records into ``out`` if given."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if out is not None:
            out[label] = dt


def annotate(name: str):
    """Named region visible in device traces (jax.profiler.TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
