"""Serving loop: overlap host I/O with device compute.

The reference hides ~100 ms of inference behind a worker thread
(CalcMask).  Here the device step is ~0.1 ms and the bottleneck is the
host<->device link (SURVEY.md §7 "Host I/O becomes the bottleneck"), so
the serving loop pipelines differently:

  upload(frame i+1)  ||  dispatch(step i)  ||  async-fetch(result i-k)  ||  sink(result i-k-1)

A small in-flight ring holds device results; ``copy_to_host_async`` starts
their D2H transfers as soon as they are produced, and the sink consumes
them ``depth`` frames later — so transfer latency is overlapped, not paid
per frame.  ``depth=2`` reproduces the CLI's simple behavior; deeper rings
help high-latency links (e.g. remote-attached accelerators).
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Optional

import numpy as np
import jax

from ..io.staging import StagingRing
from ..pipeline.frame import FramePipeline


class ServingLoop:
    """Pipelined frame server around a FramePipeline.

    ``run(source, sink, background=None, frames=0)`` pulls BGR frames from
    ``source`` (callable -> frame | None), pushes packed YUYV results into
    ``sink`` (callable), keeping ``depth`` results in flight.

    ``staging=True`` routes both transfer directions through pinned-host
    staging (io/staging.py): uploads take the DMA-eligible pinned hop, and
    results are staged out of HBM into pinned memory instead of relying on
    ``copy_to_host_async``.  Results are bit-identical either way; on
    backends without a pinned space it silently degrades to the plain path.

    ``drain_thread=True`` moves the blocking D2H materialization
    (``np.asarray``) and the sink call onto a dedicated consumer thread, so
    the submit side never stalls on a download — upload/dispatch of frame
    N+k overlaps the download of frame N (the TPU-honest version of the
    reference's CalcMask split, app/deepseg.cc:159-286, with the roles
    reversed: here the HOST link is the slow side).  FIFO order is
    preserved (single consumer); the queue is bounded at ``depth`` for
    backpressure.  All sink calls happen on the drain thread.
    """

    def __init__(self, pipe: FramePipeline, depth: int = 3,
                 staging: bool = False, drain_thread: bool = False):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.pipe = pipe
        self.depth = depth
        self.staging = StagingRing(depth=depth) if staging else None
        self._ring: collections.deque = collections.deque()
        self._q: Optional[queue.Queue] = None
        self._worker: Optional[threading.Thread] = None
        self._sink_error: Optional[BaseException] = None
        if drain_thread:
            self._q = queue.Queue(maxsize=depth)

    # -- drain-thread mode ---------------------------------------------------
    def _ensure_worker(self, sink: Callable[[np.ndarray], None]):
        if self._worker is None or not self._worker.is_alive():
            def consume():
                while True:
                    item = self._q.get()
                    if item is None:
                        self._q.task_done()
                        return
                    try:
                        sink(self._materialize(item))
                    except BaseException as e:  # surface on the submit side
                        self._sink_error = e
                    finally:
                        self._q.task_done()
            self._worker = threading.Thread(target=consume, daemon=True,
                                            name="bs-drain")
            self._worker.start()

    def _raise_sink_error(self):
        if self._sink_error is not None:
            e, self._sink_error = self._sink_error, None
            raise e

    @staticmethod
    def _materialize(out):
        """Device result -> host: ndarray, or a pytree of them (mjpg
        coefficient outputs are tuples)."""
        if isinstance(out, (tuple, list)):
            return jax.tree_util.tree_map(np.asarray, out)
        return np.asarray(out)

    def _drain_one(self, sink: Callable[[np.ndarray], None]):
        out = self._ring.popleft()
        sink(self._materialize(out))

    def submit(self, frame, background=None, **step_kwargs):
        """Dispatch one frame; starts its async D2H immediately."""
        if self.staging is not None:
            if isinstance(frame, np.ndarray):
                frame = self.staging.upload(frame)
            elif isinstance(frame, tuple):
                # mjpg coefficient frames: stage every ndarray leaf
                frame = jax.tree_util.tree_map(
                    lambda x: (self.staging.upload(x)
                               if isinstance(x, np.ndarray) else x), frame)
            if isinstance(background, np.ndarray):
                background = self.staging.upload(background)
        out, _mask = self.pipe.step(frame, background, **step_kwargs)
        if self.staging is not None:
            if isinstance(out, (tuple, list)):
                out = jax.tree_util.tree_map(self.staging.to_pinned, out)
            else:
                out = self.staging.to_pinned(out)
        else:
            for leaf in jax.tree_util.tree_leaves(out):
                try:
                    leaf.copy_to_host_async()
                except Exception:
                    pass  # platforms without async copy: asarray later blocks
        self._ring.append(out)

    def ready(self) -> bool:
        return len(self._ring) > self.depth

    def drain_ready(self, sink: Callable[[np.ndarray], None]) -> int:
        """Deliver all results past the pipeline depth; returns count.

        In drain-thread mode this hands results to the consumer thread
        (blocking only when ``depth`` results are already queued) and
        returns the number handed off."""
        n = 0
        if self._q is not None:
            self._ensure_worker(sink)
            self._raise_sink_error()
            while self.ready():
                self._q.put(self._ring.popleft())
                n += 1
            return n
        while self.ready():
            self._drain_one(sink)
            n += 1
        return n

    def drain_all(self, sink: Callable[[np.ndarray], None]) -> int:
        """Deliver every in-flight result (end of stream); returns count."""
        n = 0
        if self._q is not None:
            self._ensure_worker(sink)
            while self._ring:
                self._q.put(self._ring.popleft())
                n += 1
            self._q.join()  # all sink calls completed
            self._raise_sink_error()
            return n
        while self._ring:
            self._drain_one(sink)
            n += 1
        return n

    def close(self):
        """Stop the drain thread (drain-thread mode); safe to call twice."""
        if self._q is not None and self._worker is not None \
                and self._worker.is_alive():
            self._q.put(None)
            self._worker.join(timeout=5.0)

    def run(self, source: Callable[[], Optional[np.ndarray]],
            sink: Callable[[np.ndarray], None],
            background: Optional[Callable[[], Optional[np.ndarray]]] = None,
            frames: int = 0, **step_kwargs) -> int:
        n = 0
        try:
            while frames == 0 or n < frames:
                frame = source()
                if frame is None:
                    break
                bg = background() if background else None
                self.submit(frame, bg, **step_kwargs)
                n += 1
                self.drain_ready(sink)
        finally:
            self.drain_all(sink)
            self.close()
        return n
