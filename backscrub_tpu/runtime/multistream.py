"""Multi-stream server: N live sources -> one batched dispatch -> N sinks.

The reference serves one camera per process (app/deepseg.cc main loop);
the TPU scaling unit is a stream batch (SURVEY.md §2.4).  This module is
the orchestration between host I/O and ``parallel.streams
.MultiStreamPipeline``: it gathers one frame per stream, stacks them into
the (S, H, W, 3) batch, runs the fused program in a single dispatch, and
fans the (S, H, 2W) YUYV results back out to per-stream sinks.

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
  reference's behavior when the mask thread lags the camera).

A stream whose source ends (returns None) is marked done and its last
frame keeps riding the batch (the dispatch shape is static); its sink
stops receiving.  The server stops when every stream is done or the frame
budget is reached.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Optional, Sequence

import numpy as np

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
            frame = self.source()
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

    ``sources``: S callables -> BGR frame (H, W, 3) u8 or None at EOF.
    ``sinks``:   S callables receiving the packed per-stream output.
    ``backgrounds``: optional callable -> (S, H, W, 3) u8 batch per tick,
    or a static (S, H, W, 3) array; None = green screen.
    """

    def __init__(self, ms: MultiStreamPipeline,
                 sources: Sequence[Callable[[], Optional[np.ndarray]]],
                 sinks: Sequence[Callable[[np.ndarray], None]],
                 backgrounds=None, threaded: bool = False):
        if len(sources) != ms.n_streams or len(sinks) != ms.n_streams:
            raise ValueError(
                f"need exactly {ms.n_streams} sources and sinks "
                f"(got {len(sources)}/{len(sinks)})")
        self.ms = ms
        self.sources = list(sources)
        self.sinks = list(sinks)
        self.backgrounds = backgrounds
        self.threaded = threaded
        cfg = ms.pipe.cfg
        self._shape = (cfg.height, cfg.width, 3)
        self._frames = np.zeros((ms.n_streams,) + self._shape, np.uint8)
        self._live = [True] * ms.n_streams
        self._readers: Optional[List[_Reader]] = None

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
            if done and not fresh[s]:
                self._live[s] = False
        return fresh

    def _background_batch(self):
        bgs = self.backgrounds
        if callable(bgs):
            bgs = bgs()
        return bgs

    def run(self, frames: int = 0) -> int:
        """Serve until every stream ends (or ``frames`` ticks).  Returns the
        number of batched dispatches."""
        if self.threaded:
            self._readers = [_Reader(s) for s in self.sources]
            for r in self._readers:
                r.thread.start()
        ticks = 0
        try:
            while frames == 0 or ticks < frames:
                fresh = (self._gather_threaded() if self.threaded
                         else self._gather_pull())
                if not any(self._live):
                    break
                if self.threaded and not any(fresh):
                    continue  # nothing new anywhere yet; spin-gather
                out, _masks = self.ms.step(self._frames,
                                           self._background_batch())
                out_np = np.asarray(out)
                for s, sink in enumerate(self.sinks):
                    # deliver to live streams; in pull mode only fresh ones
                    # (a stream at EOF mid-batch must not repeat its last)
                    if self._live[s] and (fresh[s] or self.threaded):
                        sink(out_np[s])
                ticks += 1
        finally:
            if self._readers is not None:
                for r in self._readers:
                    r.stop()
        return ticks
