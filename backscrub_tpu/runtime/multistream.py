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
    the pipeline's ``input_format``: (H, W, 3) BGR u8, (H, 2W) raw YUYV
    bytes, (3H/2, W) NV12 bytes, or — for ``mjpg`` — the
    ``(coefs, qtabs)`` tuples a :class:`..io.streams.JpegSource` yields
    (all streams in a batch must share geometry AND chroma sampling; the
    per-stream quant tables ride the batch as data).
    ``sinks``:   S callables receiving the packed per-stream output.
    ``backgrounds``: optional callable -> (S, H, W, 3) u8 batch per tick,
    or a static (S, H, W, 3) array (uploaded to the device ONCE); None =
    green screen.
    ``depth``: in-flight result ring depth (transfer/compute overlap).

    Membership is ELASTIC: :meth:`attach` occupies a free batch slot with
    a new live stream at runtime and :meth:`detach` frees one — no
    recompilation (the batch shape is static), the slot's temporal EMA
    resets to a fresh pipeline's state, and in-flight results of a
    previous occupant never reach a new sink (generation-guarded ring).
    Cameras connecting/disconnecting against a long-running server are a
    slot update, where the reference would fork/kill a process per camera.
    """

    def __init__(self, ms: MultiStreamPipeline,
                 sources: Sequence[Callable[[], Optional[np.ndarray]]],
                 sinks: Sequence[Callable[[np.ndarray], None]],
                 backgrounds=None, threaded: bool = False, depth: int = 2,
                 stall_timeout: Optional[float] = None,
                 keep_alive: bool = False):
        # Fewer sources than batch slots is allowed: the tail slots are
        # padding (they ride the static-shape batch but never deliver) —
        # this is how geometry buckets with stream counts that don't divide
        # the mesh data axis are served (MultiGeometryServer), and how
        # elastic membership works: ``attach`` occupies a free slot at
        # runtime, ``detach`` frees one, with no recompilation (the batch
        # shape is static).
        if len(sources) > ms.n_streams or len(sinks) != len(sources):
            raise ValueError(
                f"need at most {ms.n_streams} sources with matching sinks "
                f"(got {len(sources)}/{len(sinks)})")
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.ms = ms
        # slot-indexed state over the FULL batch; None = free slot
        pad = ms.n_streams - len(sources)
        self.sources = list(sources) + [None] * pad
        self.sinks = list(sinks) + [None] * pad
        self._gen = [0] * ms.n_streams  # bumps on attach/detach; guards the
        #                                 ring against delivering a previous
        #                                 occupant's output to a new sink
        self._slots_lock = threading.Lock()
        self.threaded = threaded
        self.depth = depth
        self.stall_timeout = stall_timeout
        # keep_alive: an elastic server must survive its last stream ending
        # (tick() reports idle instead of done, run() keeps spinning until
        # stall_timeout/frames) so later attach() calls find it serving
        self.keep_alive = keep_alive
        cfg = ms.pipe.cfg
        self.n_real = len(sources)  # initial occupancy (attach may grow it)
        self._mjpg = cfg.input_format == "mjpg"
        if self._mjpg:
            # stream frames are (coefs tuple, qtabs); batch each leaf
            info = cfg.jpeg_info
            self._shape = None
            self._frames = (
                tuple(np.zeros((ms.n_streams, bh, bw, 64), np.int16)
                      for bh, bw in info.blocks),
                np.zeros((ms.n_streams, info.ncomp, 64), np.uint16))
        else:
            if cfg.input_format in ("yuyv", "uyvy"):
                self._shape = (cfg.height, 2 * cfg.width)
            elif cfg.input_format == "nv12":
                self._shape = (cfg.height * 3 // 2, cfg.width)
            else:
                self._shape = (cfg.height, cfg.width, 3)
            self._frames = np.zeros((ms.n_streams,) + self._shape, np.uint8)
        S = ms.n_streams
        self._live = [s < self.n_real for s in range(S)]
        self._ever = [False] * S  # produced at least one frame
        self._readers: Optional[List[Optional[_Reader]]] = None
        # static backgrounds upload once; callables re-evaluate per tick
        self.backgrounds = backgrounds
        self._bg_host: Optional[np.ndarray] = None  # for attach-time edits
        if backgrounds is not None and not callable(backgrounds):
            self._bg_host = self._pad_batch(np.asarray(backgrounds)).copy()
            self.backgrounds = jax.device_put(self._bg_host,
                                              ms._batch_sharding)
        self._ring: collections.deque = collections.deque()
        # serializes pop+deliver so concurrent drainers (a tick racing a
        # bucket-grow migration) can never invert a stream's output order
        self._ring_lock = threading.Lock()

    def _store(self, s: int, frame) -> None:
        """Write one stream's frame into batch slot s (validating shape)."""
        if self._mjpg:
            coefs, qtabs = frame
            bcoefs, bqt = self._frames
            for c, arr in enumerate(coefs):
                if arr.shape != bcoefs[c].shape[1:]:
                    raise ValueError(
                        f"stream {s}: coefficient shape {arr.shape} != "
                        f"{bcoefs[c].shape[1:]} (all streams in a batch must "
                        "share the MJPG geometry/sampling)")
                bcoefs[c][s] = arr
            bqt[s] = qtabs
            return
        if frame.shape != self._shape:
            raise ValueError(
                f"stream {s}: frame shape {frame.shape} != {self._shape}")
        self._frames[s] = frame

    # -- one gather: fill self._frames, return per-stream "fresh" flags ----
    def _gather_pull(self) -> List[bool]:
        fresh = [False] * self.ms.n_streams
        for s, src in enumerate(self.sources):
            if src is None or not self._live[s]:
                continue
            frame = src()
            if frame is None:
                self._live[s] = False
                continue
            self._store(s, frame)
            fresh[s] = True
            self._ever[s] = True
        return fresh

    def _gather_threaded(self) -> List[bool]:
        assert self._readers is not None
        fresh = [False] * self.ms.n_streams
        for s, r in enumerate(self._readers):
            if r is None or not self._live[s]:
                continue
            latest, seq, done = r.snapshot()
            if latest is not None and seq != r._consumed:
                self._store(s, latest)
                r._consumed = seq
                fresh[s] = True
                self._ever[s] = True
            if done and not fresh[s]:
                self._live[s] = False
        return fresh

    def _pad_batch(self, b: np.ndarray) -> np.ndarray:
        """Extend a per-real-stream batch to the full slot count (padding
        slots get zeros; they are never delivered)."""
        if b.shape[0] >= self.ms.n_streams:
            return b
        pad = np.zeros((self.ms.n_streams - b.shape[0],) + b.shape[1:], b.dtype)
        return np.concatenate([b, pad])

    def _background_batch(self):
        bgs = self.backgrounds
        if callable(bgs):
            bgs = self._pad_batch(np.asarray(bgs()))
        return bgs

    # -- async result ring --------------------------------------------------
    def _submit(self, out, deliver: List[bool]):
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass
        self._ring.append((out, deliver, list(self._gen)))

    def _drain(self, force: bool = False):
        with self._ring_lock:
            while self._ring and (force or len(self._ring) > self.depth):
                out, deliver, gens = self._ring.popleft()
                # mjpg-output pipelines return coefficient pytrees; each
                # leaf is stream-batched on axis 0
                tree = jax.tree_util.tree_map(np.asarray, out)
                is_tree = isinstance(tree, (tuple, list))
                for s, sink in enumerate(self.sinks):
                    # gen check: never hand a previous occupant's in-flight
                    # result to a slot re-attached since the dispatch
                    if (sink is not None and deliver[s]
                            and gens[s] == self._gen[s]):
                        sink(jax.tree_util.tree_map(lambda a: a[s], tree)
                             if is_tree else tree[s])

    # -- elastic membership --------------------------------------------------
    def attach(self, source: Callable[[], Optional[np.ndarray]],
               sink: Callable[[np.ndarray], None],
               background: Optional[np.ndarray] = None) -> int:
        """Occupy a free batch slot with a new live stream at runtime.

        No recompilation: the dispatch shape is static, so a new camera
        connecting is a slot update — the slot's temporal EMA resets to the
        all-background init (exactly a fresh solo pipeline's state), its
        frame placeholder zeroes, and, in threaded mode, a reader thread
        spawns.  Returns the slot id (use it with :meth:`detach`).  Raises
        RuntimeError when every slot is occupied — size the batch with
        headroom (MultiGeometryServer already rounds up to the mesh data
        axis).  ``background`` (H, W, 3 BGR u8) sets the slot's static
        background; only valid when the server's backgrounds are static
        (not a per-tick callable)."""
        with self._slots_lock:
            free = [s for s in range(self.ms.n_streams)
                    if self.sources[s] is None]
            if not free:
                raise RuntimeError(
                    f"all {self.ms.n_streams} batch slots are occupied")
            s = free[0]
            self.sources[s] = source
            self.sinks[s] = sink
            self._gen[s] += 1
            self._live[s] = True
            self._ever[s] = False
            self.ms.reset_stream(s)
            # defined (if irrelevant) compute for the slot until its first
            # real frame arrives
            if self._mjpg:
                bcoefs, bqt = self._frames
                for c in bcoefs:
                    c[s] = 0
                bqt[s] = 0
            else:
                self._frames[s] = 0
            if background is not None:
                if callable(self.backgrounds):
                    raise ValueError("per-slot background conflicts with a "
                                     "per-tick backgrounds callable")
                if self._bg_host is None:
                    green = np.asarray(self.ms.pipe.green)
                    self._bg_host = np.broadcast_to(
                        green, (self.ms.n_streams,) + green.shape).copy()
                self._bg_host[s] = background
                self.backgrounds = jax.device_put(self._bg_host,
                                                  self.ms._batch_sharding)
            if self.threaded and self._readers is not None:
                r = _Reader(source)
                self._readers[s] = r
                r.thread.start()
            self.n_real = max(self.n_real, s + 1)
            return s

    def detach(self, slot: int) -> None:
        """Free a batch slot: its sink stops receiving (including results
        already in flight) and the slot becomes attachable again."""
        with self._slots_lock:
            if not (0 <= slot < self.ms.n_streams) or self.sources[slot] is None:
                raise ValueError(f"slot {slot} is not attached")
            if self._readers is not None and self._readers[slot] is not None:
                self._readers[slot].stop()
                self._readers[slot] = None
            self.sources[slot] = None
            self.sinks[slot] = None
            self._gen[slot] += 1
            self._live[slot] = False
            self._ever[slot] = False

    def start(self):
        """Spawn reader threads (threaded mode); idempotent."""
        if self.threaded and self._readers is None:
            self._readers = [_Reader(s) if s is not None else None
                             for s in self.sources]
            for r in self._readers:
                if r is not None:
                    r.thread.start()

    def tick(self) -> Optional[bool]:
        """One gather -> dispatch -> drain cycle.

        Returns True when a batch was dispatched, False when nothing new
        arrived (threaded idle), None when every stream is done."""
        with self._slots_lock:
            fresh = (self._gather_threaded() if self.threaded
                     else self._gather_pull())
            if not any(self._live):
                return False if self.keep_alive else None
            if self.threaded and not any(fresh):
                return False
            out, _masks = self.ms.step(self._frames,
                                       self._background_batch())
            # deliver to live streams that have really produced frames; in
            # pull mode only fresh ones (a stream at EOF mid-batch must not
            # repeat its last frame)
            deliver = [self._live[s] and self._ever[s] and
                       (fresh[s] or self.threaded)
                       for s in range(self.ms.n_streams)]
            self._submit(out, deliver)
        self._drain()
        return True

    def finish(self):
        """Flush the result ring and stop reader threads."""
        self._drain(force=True)
        if self._readers is not None:
            for r in self._readers:
                if r is not None:
                    r.stop()

    def run(self, frames: int = 0) -> int:
        """Serve until every stream ends (or ``frames`` ticks, or a full
        stall in threaded mode).  Returns the number of batched dispatches."""
        self.start()
        ticks = 0
        last_fresh = time.monotonic()
        try:
            while frames == 0 or ticks < frames:
                r = self.tick()
                if r is None:
                    break
                if r is False:
                    # nothing new anywhere: yield instead of burning the core
                    # (and the GIL the reader threads need)
                    if (self.stall_timeout is not None and
                            time.monotonic() - last_fresh > self.stall_timeout):
                        break
                    time.sleep(0.001)
                    continue
                last_fresh = time.monotonic()
                ticks += 1
        finally:
            self.finish()
        return ticks


class _StreamHandle:
    """Opaque handle for a stream attached through MultiGeometryServer.

    Indirection (server, slot) -> handle keeps handles valid across bucket
    CAPACITY growth: when a full bucket is replaced by a larger sibling,
    the migration rewrites every live handle's ``srv`` in place, so a
    handle taken before the grow still detaches the right stream after."""

    __slots__ = ("srv", "slot")

    def __init__(self, srv: "MultiStreamServer", slot: int):
        self.srv = srv
        self.slot = slot


class MultiGeometryServer:
    """Serve streams of DIFFERENT geometries in one server.

    The fused batch program needs static shapes, so streams are bucketed by
    (width, height); each bucket gets its own :class:`MultiStreamPipeline`
    (batch rounded up to the mesh data-axis size — padding slots ride the
    batch but never deliver) and the buckets' dispatches interleave every
    tick.  JAX's async dispatch pipelines the bucket programs back-to-back
    on device, so G geometries cost G dispatches per tick, not G processes —
    this closes the per-stream-geometry gap vs N independent reference
    processes (app/deepseg.cc:627-804).  Per-stream outputs are
    bit-identical to running that stream alone (tested).

    ``streams``: sequence of (source, sink, width, height[, background
    [, jpeg_info[, model]]]) tuples; ``background`` is an optional static
    (height, width, 3) BGR u8 array (None = green screen); ``jpeg_info``
    (io.jpeg.JpegInfo, e.g. a CameraSource/JpegSource's ``.jpeg_info``)
    marks the stream as MJPG coefficient frames — such streams bucket by
    geometry AND chroma sampling and decode on device; ``model`` (a
    resolved .tflite path) overrides the server-wide model for this
    stream — N reference processes each pick their own ``-m``
    (app/deepseg.cc:540), so per-stream models bucket the same way
    per-stream geometries do.

    Bucket membership is ELASTIC all the way up: :meth:`attach` with a
    (model, geometry) that has no bucket builds one at runtime — the new
    pipeline compiles and warms OFF the tick path (one discarded dummy
    dispatch before the bucket is spliced into the loop), so existing
    buckets' ticks never stall on a compile; :meth:`detach` frees the
    slot and retires a bucket whose last stream left.  Capacity is
    elastic too: attaching to a FULL bucket builds a larger sibling
    (slots rounded up by the mesh data axis) off the tick path, migrates
    every occupied slot — sources, sinks, frames, backgrounds, reader
    threads, and the per-stream temporal EMA state, so existing streams'
    outputs stay bit-identical through the grow — and splices it in
    place of the old bucket.  A camera connecting is a slot update even
    when its geometry is novel or its bucket is full.
    """

    def __init__(self, model: str, config, streams: Sequence[tuple],
                 mesh, *, threaded: bool = False, depth: int = 2,
                 stall_timeout: Optional[float] = None,
                 keep_alive: bool = False, **pipe_kwargs):
        groups = {}
        for entry in streams:
            src, sink, w, h = entry[:4]
            bg = entry[4] if len(entry) > 4 else None
            jinfo = entry[5] if len(entry) > 5 else None
            smodel = entry[6] if len(entry) > 6 and entry[6] else model
            key = (smodel, w, h,
                   jinfo.sampling if jinfo is not None else None)
            groups.setdefault(key, (jinfo, []))[1].append((src, sink, bg))
        self._mesh = mesh
        self._model = model
        self._config = config
        self._pipe_kwargs = pipe_kwargs
        self._threaded = threaded
        self._depth = depth
        self._keep_alive = keep_alive
        self._lock = threading.Lock()
        self._started = False
        self._handles: List[_StreamHandle] = []  # live attach() handles
        self.servers: List[MultiStreamServer] = []
        self._keys: List[tuple] = []  # parallel to self.servers
        for key, (jinfo, members) in groups.items():
            srv = self._build_bucket(key, jinfo, len(members))
            bgs = None
            if any(m[2] is not None for m in members):
                green = np.asarray(srv.ms.pipe.green)
                bgs = np.stack([m[2] if m[2] is not None else green
                                for m in members])
            # occupy the initial slots (ctor-equivalent of attach)
            srv.sources[:len(members)] = [m[0] for m in members]
            srv.sinks[:len(members)] = [m[1] for m in members]
            srv._live[:len(members)] = [True] * len(members)
            srv.n_real = len(members)
            if bgs is not None:
                srv._bg_host = srv._pad_batch(bgs).copy()
                srv.backgrounds = jax.device_put(srv._bg_host,
                                                 srv.ms._batch_sharding)
            self.servers.append(srv)
            self._keys.append(key)
        self.stall_timeout = stall_timeout

    def _build_bucket(self, key: tuple, jinfo, n_members: int
                      ) -> MultiStreamServer:
        """Compile a bucket for (model, w, h, sampling) with room for
        ``n_members`` streams (rounded up to the mesh data axis); the
        server starts with every slot FREE — callers occupy slots via
        attach or the ctor."""
        import dataclasses
        import math

        smodel, w, h, _sampling = key
        cfg = dataclasses.replace(
            self._config, width=w, height=h, out_width=w, out_height=h,
            input_format=("mjpg" if jinfo is not None
                          else self._config.input_format),
            jpeg_info=jinfo if jinfo is not None else self._config.jpeg_info)
        data_axis = self._mesh.shape["data"]
        n_slots = math.ceil(max(n_members, 1) / data_axis) * data_axis
        ms = MultiStreamPipeline(smodel, cfg, n_slots, self._mesh,
                                 **self._pipe_kwargs)
        return MultiStreamServer(
            ms, [], [], backgrounds=None, threaded=self._threaded,
            depth=self._depth, stall_timeout=self.stall_timeout
            if hasattr(self, "stall_timeout") else None,
            keep_alive=self._keep_alive)

    @property
    def n_groups(self) -> int:
        return len(self.servers)

    # -- elastic membership (bucket level) -----------------------------------
    def _register(self, srv: MultiStreamServer, slot: int) -> _StreamHandle:
        """Record a live handle (callers hold self._lock)."""
        h = _StreamHandle(srv, slot)
        self._handles.append(h)
        return h

    def _migrate(self, old: MultiStreamServer, new: MultiStreamServer) -> None:
        """Move every occupied slot of ``old`` into the same slot index of
        the larger, warmed, unstarted ``new`` (callers hold self._lock AND
        old._slots_lock, so no tick is mid-flight on ``old``).

        Existing streams' outputs stay bit-identical through the grow:
        in-flight results drain through the old sinks first, then frames,
        backgrounds, reader threads (with their latest/seq state) and the
        per-stream temporal EMA device state all ride along.  ``old`` is
        left empty so a racing tick that already snapshotted it idles."""
        S_old = old.ms.n_streams
        old._drain(force=True)
        new.sources[:S_old] = old.sources
        new.sinks[:S_old] = old.sinks
        new._live[:S_old] = old._live
        new._ever[:S_old] = old._ever
        if old._mjpg:
            ocoefs, oqt = old._frames
            ncoefs, nqt = new._frames
            for c in range(len(ocoefs)):
                ncoefs[c][:S_old] = ocoefs[c]
            nqt[:S_old] = oqt
        else:
            new._frames[:S_old] = old._frames
        ema = np.asarray(old.ms.ema)
        full = np.full((new.ms.n_streams,) + ema.shape[1:], 255, ema.dtype)
        full[:S_old] = ema
        new.ms.ema = jax.device_put(full, new.ms._batch_sharding)
        if callable(old.backgrounds):
            new.backgrounds = old.backgrounds
        elif old._bg_host is not None:
            new._bg_host = new._pad_batch(old._bg_host).copy()
            new.backgrounds = jax.device_put(new._bg_host,
                                             new.ms._batch_sharding)
        if old._readers is not None:
            new._readers = (list(old._readers)
                            + [None] * (new.ms.n_streams - S_old))
            old._readers = None  # old.finish() must not stop moved readers
        new.n_real = old.n_real
        # empty the old server: a tick that snapshotted it pre-splice finds
        # nothing live and idles; its sinks never fire again (ring drained)
        old.sources = [None] * S_old
        old.sinks = [None] * S_old
        old._live = [False] * S_old
        old._ever = [False] * S_old
        for h in self._handles:
            if h.srv is old:
                h.srv = new

    def attach(self, source: Callable[[], Optional[np.ndarray]],
               sink: Callable[[np.ndarray], None],
               width: int, height: int, *,
               background: Optional[np.ndarray] = None,
               jpeg_info=None, model: Optional[str] = None) -> _StreamHandle:
        """Attach a stream at runtime, creating its (model, geometry)
        bucket if none exists yet — or GROWING the bucket when it is full.

        Both slow paths happen OFF the tick path: the (larger) pipeline is
        built and its batched step compiled + warmed with one discarded
        dummy dispatch *before* the bucket is spliced into the serving
        loop, so concurrent ticks of existing buckets never stall on a
        compile.  Returns an opaque handle for :meth:`detach` (stable
        across later grows)."""
        smodel = model or self._model
        key = (smodel, width, height,
               jpeg_info.sampling if jpeg_info is not None else None)
        while True:
            with self._lock:
                cur = None
                for srv, k in zip(self.servers, self._keys):
                    if k == key:
                        cur = srv
                        try:
                            slot = srv.attach(source, sink, background)
                            return self._register(srv, slot)
                        except RuntimeError:
                            # full bucket -> grow (slow path below)
                            occupied = sum(s is not None for s in srv.sources)
                        break
            # slow path: build + compile + warm outside the lock (existing
            # buckets keep ticking through it)
            new = self._build_bucket(key, jpeg_info,
                                     occupied + 1 if cur is not None else 1)
            new.ms.step(new._frames, None)  # forces compile; discarded
            with self._lock:
                # re-find by key: the bucket may have freed a slot, been
                # grown by a racing attach, or been retired meanwhile
                live = None
                for srv, k in zip(self.servers, self._keys):
                    if k == key:
                        live = srv
                        break
                if live is not None:
                    try:
                        slot = live.attach(source, sink, background)
                        return self._register(live, slot)
                    except RuntimeError:
                        if live.ms.n_streams >= new.ms.n_streams:
                            continue  # raced: rebuild a bigger sibling
                        with live._slots_lock:
                            self._migrate(live, new)
                        i = self.servers.index(live)
                        self.servers[i] = new
                        slot = new.attach(source, sink, background)
                        if self._started:
                            new.start()
                        return self._register(new, slot)
                # novel bucket (or the old one retired while we built)
                slot = new.attach(source, sink, background)
                if self._started:
                    new.start()
                self.servers.append(new)
                self._keys.append(key)
                return self._register(new, slot)

    def detach(self, handle: _StreamHandle) -> None:
        """Detach a stream by its :meth:`attach` handle; a bucket whose
        last stream leaves is retired (its ring flushed, readers stopped,
        device buffers released) without interrupting other buckets."""
        srv, slot = handle.srv, handle.slot
        with self._lock:
            srv.detach(slot)
            if handle in self._handles:
                self._handles.remove(handle)
            if any(s is not None for s in srv.sources):
                return
            # last stream left: retire the bucket
            try:
                i = self.servers.index(srv)
            except ValueError:
                return  # already retired
            self.servers.pop(i)
            self._keys.pop(i)
        srv.finish()

    def start(self):
        with self._lock:
            self._started = True
            for s in self.servers:
                s.start()

    def finish(self):
        with self._lock:
            self._started = False
            servers = list(self.servers)
        for s in servers:
            s.finish()

    def run(self, frames: int = 0) -> int:
        """Serve all geometry buckets; returns interleaved tick count.
        Buckets attached mid-run join the loop; buckets whose streams all
        end (non-keep-alive) are retired from it."""
        self.start()
        done: set = set()
        ticks = 0
        last_fresh = time.monotonic()
        try:
            while frames == 0 or ticks < frames:
                with self._lock:
                    servers = list(self.servers)
                live = [s for s in servers if id(s) not in done]
                dispatched = False
                for s in live:
                    r = s.tick()
                    if r is None:
                        done.add(id(s))
                    elif r:
                        dispatched = True
                if not any(id(s) not in done for s in servers):
                    break
                if not dispatched:
                    if (self.stall_timeout is not None and
                            time.monotonic() - last_fresh > self.stall_timeout):
                        break
                    time.sleep(0.001)
                    continue
                last_fresh = time.monotonic()
                ticks += 1
        finally:
            self.finish()
        return ticks
