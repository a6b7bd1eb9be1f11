"""Host-pinned staging for the host<->HBM frame path.

SURVEY.md §7 "Hard parts": at the north-star rate the scarce resource is the
host link — 720p YUYV is ~1.8 MB/frame, ~550 MB/s each way at 300 FPS.  The
reference's analog is the kernel's V4L2 buffer queue (mmap'd DMA buffers,
`videoio/loopback.cc:52-69`); the TPU-native analog is JAX's memories API:
arrays placed in the device's ``pinned_host`` memory space transfer to/from
HBM by DMA without a bounce copy, and ``device_put`` between memory kinds is
async, so a shallow ring of staged buffers overlaps transfers with compute.

``StagingRing`` wraps both directions:

- ``upload(host)``   host ndarray -> pinned_host -> device, returned as a
  device array (both hops async; the pinned hop is the DMA-eligible one).
- ``stage_out(dev)`` device array -> pinned_host, non-blocking; the returned
  handle materializes cheaply with ``np.asarray`` once the DMA lands.

On backends without a usable pinned_host space the ring degrades to plain
``device_put`` / ``copy_to_host_async`` with identical results (tested), so
callers never branch.  The in-jit variant (program outputs annotated to
pinned_host via ``out_shardings``) is intentionally not used: XLA:CPU cannot
lower the placement annotation, and the explicit form keeps one code path.
"""

from __future__ import annotations

import collections

import numpy as np
import jax
from jax.sharding import SingleDeviceSharding


def pinned_supported(device=None) -> bool:
    """True if ``device`` exposes a working pinned_host memory space."""
    device = device or jax.devices()[0]
    try:
        kinds = {m.kind for m in device.addressable_memories()}
        if "pinned_host" not in kinds:
            return False
        s = SingleDeviceSharding(device, memory_kind="pinned_host")
        probe = jax.device_put(np.zeros(8, np.uint8), s)
        jax.device_put(probe, SingleDeviceSharding(device, memory_kind="device")
                       ).block_until_ready()
        return True
    except Exception:
        return False


class StagingRing:
    """Pinned-host staging in both directions with a bounded in-flight ring.

    ``depth`` bounds how many staged downloads are kept in flight before
    ``drain()`` must consume them (mirrors ServingLoop's result ring).
    """

    def __init__(self, device=None, depth: int = 3):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.device = device or jax.devices()[0]
        self.depth = depth
        self.supported = pinned_supported(self.device)
        if self.supported:
            self._pinned = SingleDeviceSharding(self.device,
                                                memory_kind="pinned_host")
            self._dev = SingleDeviceSharding(self.device, memory_kind="device")
        self._out: collections.deque = collections.deque()

    # -- host -> device -----------------------------------------------------
    def upload(self, host_array):
        """Host ndarray -> device array via a pinned staging hop."""
        if not self.supported:
            return jax.device_put(host_array, self.device)
        staged = jax.device_put(np.ascontiguousarray(host_array), self._pinned)
        return jax.device_put(staged, self._dev)

    # -- device -> host -----------------------------------------------------
    def to_pinned(self, dev_array):
        """Start the D2H transfer; returns a handle ``np.asarray`` finishes.

        No ring bookkeeping — callers with their own in-flight ring (e.g.
        ServingLoop) use this primitive directly."""
        if self.supported:
            return jax.device_put(dev_array, self._pinned)
        try:
            dev_array.copy_to_host_async()
        except Exception:
            pass
        return dev_array

    def stage_out(self, dev_array):
        """Start the D2H transfer of ``dev_array``; enqueue the handle."""
        h = self.to_pinned(dev_array)
        self._out.append(h)
        return h

    def ready(self) -> bool:
        return len(self._out) > self.depth

    def drain(self, force: bool = False):
        """Yield completed downloads as ndarrays (all of them if ``force``)."""
        while self._out and (force or len(self._out) > self.depth):
            yield np.asarray(self._out.popleft())

    def fetch(self, dev_array) -> np.ndarray:
        """Blocking one-shot download through the pinned space."""
        if not self.supported:
            return np.asarray(dev_array)
        return np.asarray(jax.device_put(dev_array, self._pinned))


def probe_staging(width: int, height: int, *, frames: int = 8,
                  device=None) -> dict:
    """Measure staged vs plain host<->device roundtrips at a given frame
    geometry; returns per-frame times and the winner.

    Rationale: on this project's tunneled-TPU dev container, pinned-host
    staging is a MEASURED 2x regression end-to-end
    (BENCH_DETAILS.json e2e_720p_servingloop_d3_staged: 4.12 fps vs 8.26
    unstaged, sink p50 1005 ms vs 348 ms) — the pinned hop only pays off
    on a real PCIe-attached device where it enables DMA.  Rather than ship
    a flag that silently halves throughput on some hosts, callers (cli
    --staging) run this probe once at startup and keep staging only when
    it measures faster; see README "Staging and the PCIe budget" for the
    analytic case that the plain path already clears the 300-fps target
    given >= 1 GB/s effective PCIe each way.
    """
    import time

    rng = np.random.default_rng(0)
    hosts = [rng.integers(0, 256, (height, width, 3), np.uint8)
             for _ in range(4)]
    ring = StagingRing(device=device)

    def roundtrip_ms(upload, download) -> float:
        # warm both directions (compile-free: pure transfers)
        d = upload(hosts[0])
        download(d)
        t0 = time.perf_counter()
        for i in range(frames):
            d = upload(hosts[i % 4])
            download(d)
        return (time.perf_counter() - t0) / frames * 1e3

    dev = device or jax.devices()[0]
    plain_ms = roundtrip_ms(lambda h: jax.device_put(h, dev), np.asarray)
    if not ring.supported:
        return {"supported": False, "use_staging": False,
                "plain_ms": plain_ms, "staged_ms": float("nan")}
    staged_ms = roundtrip_ms(ring.upload, ring.fetch)
    return {"supported": True,
            # hysteresis: keep staging only on a clear (>10%) win so noisy
            # ties don't flap run-to-run
            "use_staging": staged_ms < plain_ms * 0.9,
            "plain_ms": plain_ms, "staged_ms": staged_ms}
