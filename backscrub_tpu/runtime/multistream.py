"""Multi-stream server: N live sources -> one batched dispatch -> N sinks.

The reference serves one camera per process (app/deepseg.cc main loop);
the TPU scaling unit is a stream batch (SURVEY.md §2.4).  This module is
the orchestration between host I/O and ``parallel.streams
.MultiStreamPipeline``: it gathers one frame per stream, stacks them into
the (S, H, W, 3) batch (or (S, H, 2W) for raw-YUYV ingest pipelines),
runs the fused program in a single dispatch, and fans the per-stream
results back out to sinks through an async D2H ring — transfers overlap
the next gather/dispatch instead of serializing with it (same pattern as
``runtime.serving.ServingLoop``).

Two gather modes:

- ``threaded=False`` (pull): sources are called synchronously each tick.
  Deterministic — stream s sees exactly the frames its source yields, so
  per-stream results are bit-identical to running that stream alone
  (tested).  Right for file processing and tests.
- ``threaded=True``: one reader thread per source with latest-frame-wins
  overwrite, the CalcMask/background-reader pattern of the reference
  (app/deepseg.cc:272-277, app/background.cc:29-104) applied per stream.
  Right for live cameras: a stalled camera never blocks the batch; its
  stream re-serves the last frame (EMA keeps converging, like the
  reference's behavior when the mask thread lags the camera).  A stream
  that has never produced a frame gets NO deliveries (its batch slot runs
  on a placeholder until the first real frame; the ~3-frame EMA washes
  the placeholder out once frames arrive).

A stream whose source ends (returns None) is marked done and its last
frame keeps riding the batch (the dispatch shape is static); its sink
stops receiving.  The server stops when every stream is done, the frame
budget is reached, or — threaded mode — no stream produces a frame for
``stall_timeout`` seconds.
"""

from __future__ import annotations

import collections
import threading
import time
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax

from ..parallel.streams import MultiStreamPipeline


class _Reader:
    """Latest-frame-wins reader thread for one source."""

    def __init__(self, source: Callable[[], Optional[np.ndarray]]):
        self.source = source
        self.lock = threading.Lock()
        self.latest: Optional[np.ndarray] = None
        self.seq = 0           # bumps on every new frame
        self._consumed = 0     # last seq the server consumed
        self.done = False
        self._stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop:
            try:
                frame = self.source()
            except Exception as e:
                # a dead reader must look like EOF, not a silent stall
                import sys
                print(f"stream reader failed: {e!r}", file=sys.stderr)
                with self.lock:
                    self.done = True
                return
            if frame is None:
                with self.lock:
                    self.done = True
                return
            with self.lock:
                self.latest = frame
                self.seq += 1

    def snapshot(self):
        with self.lock:
            return self.latest, self.seq, self.done

    def stop(self):
        self._stop = True


class MultiStreamServer:
    """Serve S streams through one MultiStreamPipeline.

    ``sources``: S callables -> frame or None at EOF.  Frame shape follows
    the pipeline's ``input_format``: (H, W, 3) BGR u8, or (H, 2W) raw YUYV
    bytes for device-side ingest.
    ``sinks``:   S callables receiving the packed per-stream output.
    ``backgrounds``: optional callable -> (S, H, W, 3) u8 batch per tick,
    or a static (S, H, W, 3) array (uploaded to the device ONCE); None =
    green screen.
    ``depth``: in-flight result ring depth (transfer/compute overlap).
    """

    def __init__(self, ms: MultiStreamPipeline,
                 sources: Sequence[Callable[[], Optional[np.ndarray]]],
                 sinks: Sequence[Callable[[np.ndarray], None]],
                 backgrounds=None, threaded: bool = False, depth: int = 2,
                 stall_timeout: Optional[float] = None):
        if len(sources) != ms.n_streams or len(sinks) != ms.n_streams:
            raise ValueError(
                f"need exactly {ms.n_streams} sources and sinks "
                f"(got {len(sources)}/{len(sinks)})")
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.ms = ms
        self.sources = list(sources)
        self.sinks = list(sinks)
        self.threaded = threaded
        self.depth = depth
        self.stall_timeout = stall_timeout
        cfg = ms.pipe.cfg
        if cfg.input_format == "yuyv":
            self._shape = (cfg.height, 2 * cfg.width)
        elif cfg.input_format == "nv12":
            self._shape = (cfg.height * 3 // 2, cfg.width)
        else:
            self._shape = (cfg.height, cfg.width, 3)
        self._frames = np.zeros((ms.n_streams,) + self._shape, np.uint8)
        self._live = [True] * ms.n_streams
        self._ever = [False] * ms.n_streams  # produced at least one frame
        self._readers: Optional[List[_Reader]] = None
        # static backgrounds upload once; callables re-evaluate per tick
        self.backgrounds = backgrounds
        if backgrounds is not None and not callable(backgrounds):
            self.backgrounds = jax.device_put(np.asarray(backgrounds),
                                              ms._batch_sharding)
        self._ring: collections.deque = collections.deque()

    # -- one gather: fill self._frames, return per-stream "fresh" flags ----
    def _gather_pull(self) -> List[bool]:
        fresh = [False] * self.ms.n_streams
        for s, src in enumerate(self.sources):
            if not self._live[s]:
                continue
            frame = src()
            if frame is None:
                self._live[s] = False
                continue
            if frame.shape != self._shape:
                raise ValueError(
                    f"stream {s}: frame shape {frame.shape} != {self._shape}")
            self._frames[s] = frame
            fresh[s] = True
            self._ever[s] = True
        return fresh

    def _gather_threaded(self) -> List[bool]:
        assert self._readers is not None
        fresh = [False] * self.ms.n_streams
        for s, r in enumerate(self._readers):
            if not self._live[s]:
                continue
            latest, seq, done = r.snapshot()
            if latest is not None and seq != r._consumed:
                self._frames[s] = latest
                r._consumed = seq
                fresh[s] = True
                self._ever[s] = True
            if done and not fresh[s]:
                self._live[s] = False
        return fresh

    def _background_batch(self):
        bgs = self.backgrounds
        if callable(bgs):
            bgs = bgs()
        return bgs

    # -- async result ring --------------------------------------------------
    def _submit(self, out, deliver: List[bool]):
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        self._ring.append((out, deliver))

    def _drain(self, force: bool = False):
        while self._ring and (force or len(self._ring) > self.depth):
            out, deliver = self._ring.popleft()
            out_np = np.asarray(out)
            for s, sink in enumerate(self.sinks):
                if deliver[s]:
                    sink(out_np[s])

    def run(self, frames: int = 0) -> int:
        """Serve until every stream ends (or ``frames`` ticks, or a full
        stall in threaded mode).  Returns the number of batched dispatches."""
        if self.threaded:
            self._readers = [_Reader(s) for s in self.sources]
            for r in self._readers:
                r.thread.start()
        ticks = 0
        last_fresh = time.monotonic()
        try:
            while frames == 0 or ticks < frames:
                fresh = (self._gather_threaded() if self.threaded
                         else self._gather_pull())
                if not any(self._live):
                    break
                if self.threaded and not any(fresh):
                    # nothing new anywhere: yield instead of burning the core
                    # (and the GIL the reader threads need)
                    if (self.stall_timeout is not None and
                            time.monotonic() - last_fresh > self.stall_timeout):
                        break
                    time.sleep(0.001)
                    continue
                last_fresh = time.monotonic()
                out, _masks = self.ms.step(self._frames,
                                           self._background_batch())
                # deliver to live streams that have really produced frames;
                # in pull mode only fresh ones (a stream at EOF mid-batch
                # must not repeat its last frame)
                deliver = [self._live[s] and self._ever[s] and
                           (fresh[s] or self.threaded)
                           for s in range(self.ms.n_streams)]
                self._submit(out, deliver)
                self._drain()
                ticks += 1
        finally:
            self._drain(force=True)
            if self._readers is not None:
                for r in self._readers:
                    r.stop()
        return ticks
