#!/usr/bin/env python3
"""Long-haul elastic-serving soak: MultiStreamServer under churn.

Exercises hours-scale serving invariants the seconds-scale tests
(tests/test_multistream.py) cannot: a MultiStreamServer runs for
``--duration`` seconds (or ``--ticks``) while streams attach, die
mid-stream (abrupt EOF, like a camera unplug), and detach at random; a
SIGTERM can arrive mid-flight (``--sigterm`` sends one to this process
halfway through).  Asserted continuously:

- **per-stream identity vs solo / no EMA cross-talk**: every delivered
  frame of every stream generation is compared against a solo
  single-device pipeline fed the same frames (incremental per-stream
  verifier, one shared jitted step).  The invariant is "identical up to
  decode-boundary flips": the batched CNN's float summation order can
  differ from solo's by ~1 ulp, flipping the mask decision on pixels
  whose logits sit exactly at the decode threshold — measured 3 frames
  per 75 with <=0.5% of bytes differing, decaying within the EMA's
  ~3-frame memory (reproduced with a single stream and no churn, so it
  is batch-vs-solo numerics, not serving state).  EMA cross-talk, a
  stale-generation delivery, or an out-of-order frame corrupt whole
  regions persistently, so the soak fails on any frame with >2% of
  bytes differing or a stream mean >0.2%;
- **no ring leak**: the in-flight result ring is empty after finish and
  delivered counts never exceed produced counts;
- **generation guard**: results in flight across a detach are dropped,
  never delivered to a later occupant (covered by identity: a new
  generation's delivered frames must match a FRESH solo state);
- **stable RSS**: resident-set growth after warmup stays under
  ``--rss-budget-mb`` (default 200) — catches leaked device buffers,
  growing rings, or unbounded jit caches.

Writes a JSON report (``--report``, default soak_report.json) and exits
nonzero on any violation.  Runs on CPU by default (deterministic, no
device contention); set BACKSCRUB_TPU_PLATFORM=tpu to soak the chip.

Reference context: the reference serves one camera per process and its
failure story is fail-fast exit (SURVEY.md §5); elastic multi-stream
serving is beyond-parity surface, so its robustness bar is ours to set.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from backscrub_tpu.models.specs import install_default_search_roots
from backscrub_tpu.utils.artifacts import atomic_json_dump
install_default_search_roots()


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


class StreamSim:
    """One deterministic synthetic stream: seeded frames, finite life."""

    def __init__(self, seed: int, w: int, h: int, lifetime: int):
        self.seed = seed
        self.w, self.h = w, h
        self.lifetime = lifetime  # frames until abrupt EOF ("reader death")
        self.produced = 0
        self.delivered = []  # sink-side outputs (np arrays), FIFO
        self._rng = np.random.default_rng(seed)
        # incremental verifier state (set by Verifier.register)
        self.v_rng = np.random.default_rng(seed)
        self.v_ema = None
        self.v_checked = 0
        self.v_diff_frames = 0  # frames with any byte differing from solo
        self.v_diff_sum = 0.0   # sum of per-frame diff fractions

    def source(self):
        if self.produced >= self.lifetime:
            return None  # abrupt EOF mid-stream
        self.produced += 1
        return self._rng.integers(0, 256, (self.h, self.w, 3), np.uint8)

    def sink(self, arr: np.ndarray):
        self.delivered.append(np.asarray(arr).copy())


class Verifier:
    """Replays each stream through ONE shared jitted solo step with
    per-stream EMA state, incrementally (O(new frames), not O(history))."""

    def __init__(self, pipe):
        import jax.numpy as jnp
        self._jnp = jnp
        self.step = pipe._get_step("explicit", False, False, True)
        self.params = pipe.maskgen.model.params
        self.green = jnp.asarray(pipe.green)
        self.out_hw = pipe.maskgen.ema_shape

    def fresh_ema(self):
        return self._jnp.full(self.out_hw, 255, self._jnp.uint8)

    def register(self, sim: StreamSim):
        sim.v_ema = self.fresh_ema()

    # identity-up-to-boundary-flips thresholds (see module docstring)
    FRAME_TOL = 0.02    # fail any frame with >2% of bytes differing
    MEAN_TOL = 0.002    # fail a stream whose mean diff fraction >0.2%

    def advance(self, sim: StreamSim):
        """Verify all delivered-but-unchecked frames; returns #newly
        checked, or raises AssertionError with the failing frame index."""
        n = 0
        while sim.v_checked < len(sim.delivered):
            frame = sim.v_rng.integers(0, 256, (sim.h, sim.w, 3), np.uint8)
            out, _mask, sim.v_ema = self.step(self.params, frame,
                                              self.green, sim.v_ema)
            i = sim.v_checked
            cur = np.asarray(out)
            diff = int((sim.delivered[i] != cur).sum())
            # free the verified frame (len() is preserved for the ring-leak
            # invariant and the delivered count) — at 720p a 30-min soak
            # would otherwise retain tens of GB of checked outputs
            sim.delivered[i] = None
            if diff:
                frac = diff / cur.size
                sim.v_diff_frames += 1
                sim.v_diff_sum += frac
                if frac > self.FRAME_TOL:
                    raise AssertionError(
                        f"frame {i}: {frac:.1%} of bytes differ from solo "
                        "(> per-frame tolerance; EMA cross-talk or "
                        "mis-delivery, not a decode-boundary flip)")
                mean = sim.v_diff_sum / max(sim.v_checked + 1, 1)
                if mean > self.MEAN_TOL:
                    raise AssertionError(
                        f"frame {i}: stream mean diff {mean:.2%} "
                        "(persistent divergence, not boundary flips)")
            sim.v_checked += 1
            n += 1
        return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--duration", type=float, default=60.0,
                    help="seconds to run (0 = use --ticks only)")
    ap.add_argument("--ticks", type=int, default=0,
                    help="max batched dispatches (0 = unbounded)")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--geometry", default="64x48")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--churn-every", type=int, default=25,
                    help="ticks between random attach/detach events")
    ap.add_argument("--check-every", type=int, default=50,
                    help="ticks between incremental identity sweeps")
    ap.add_argument("--rss-budget-mb", type=float, default=200.0)
    ap.add_argument("--sigterm", action="store_true",
                    help="send SIGTERM to this process halfway through")
    ap.add_argument("--sigterm-at", type=float, default=0.0,
                    help="with --sigterm: fire at this many seconds instead "
                    "of duration/2 (lets a long soak drain near its end, so "
                    "the recorded duration is the soak, not the half-life)")
    ap.add_argument("--report", default="soak_report.json")
    ap.add_argument("--edge", action="store_true",
                    help="force the fused edge path (+ megakernel when the "
                    "span qualifies) — on CPU this runs the Pallas kernels "
                    "in interpret mode and carries the quadrant EMA, "
                    "soaking the exact program shape the TPU ships")
    args = ap.parse_args(argv)

    import jax
    from backscrub_tpu.parallel.mesh import make_mesh
    from backscrub_tpu.parallel.streams import MultiStreamPipeline
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.runtime.multistream import MultiStreamServer
    from backscrub_tpu.models.specs import resolve_model_path

    w, h = (int(x) for x in args.geometry.split("x"))
    rng = np.random.default_rng(args.seed)
    path = resolve_model_path("segm_lite_v681.tflite")
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    da = mesh.shape["data"]
    S = (max(args.slots, da) + da - 1) // da * da
    cfg = PipelineConfig(width=w, height=h,
                         **(dict(edge_fused=True, edge_interpret=True,
                                 pack_interpret=True)
                            if args.edge else {}))
    ms = MultiStreamPipeline(path, cfg, S, mesh)
    verifier = Verifier(FramePipeline(path, cfg))

    all_sims = []

    def new_sim() -> StreamSim:
        sim = StreamSim(int(rng.integers(1, 2**31)), w, h,
                        lifetime=int(rng.integers(50, 400)))
        verifier.register(sim)
        all_sims.append(sim)
        return sim

    # start half-full; keep_alive so the server survives quiet moments
    sims = [new_sim() for _ in range(max(1, S // 2))]
    server = MultiStreamServer(ms, [s.source for s in sims],
                               [s.sink for s in sims], keep_alive=True)
    slot_sim = {i: sims[i] for i in range(len(sims))}

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    if args.sigterm and args.duration:
        t = threading.Timer(args.sigterm_at or args.duration / 2,
                            lambda: os.kill(os.getpid(), signal.SIGTERM))
        t.daemon = True
        t.start()

    failures = []
    identity_checked = [0]

    def sweep(sims_iter, label):
        for sim in sims_iter:
            if len(sim.delivered) > sim.produced:
                failures.append(f"{label}: delivered {len(sim.delivered)} > "
                                f"produced {sim.produced} (ring leak)")
                return
            try:
                identity_checked[0] += verifier.advance(sim)
            except AssertionError as e:
                failures.append(
                    f"{label}: sim(seed={sim.seed}, life={sim.lifetime}, "
                    f"produced={sim.produced}, "
                    f"delivered={len(sim.delivered)}): {e}")
                return

    server.start()
    t0 = time.monotonic()
    rss0 = None
    ticks = 0
    attaches = detaches = deaths = 0
    try:
        while not stop.is_set():
            if args.duration and time.monotonic() - t0 > args.duration:
                break
            if args.ticks and ticks >= args.ticks:
                break
            r = server.tick()
            if r is None:
                break
            if r:
                ticks += 1
            else:
                time.sleep(0.001)
            if ticks == 20 and rss0 is None:
                rss0 = rss_mb()  # after compile + ring warmup

            # reader deaths surface as _live going False while attached;
            # detach those slots so they become reusable (service behavior)
            for slot, sim in list(slot_sim.items()):
                if sim.produced >= sim.lifetime and not server._live[slot]:
                    server.detach(slot)
                    deaths += 1
                    del slot_sim[slot]

            if ticks and ticks % args.churn_every == 0 and r:
                if slot_sim and rng.random() < 0.5:
                    slot = list(slot_sim)[int(rng.integers(len(slot_sim)))]
                    slot_sim.pop(slot)
                    server.detach(slot)
                    detaches += 1
                elif len(slot_sim) < S:
                    sim = new_sim()
                    slot = server.attach(sim.source, sim.sink)
                    slot_sim[slot] = sim
                    attaches += 1

            if ticks and ticks % args.check_every == 0 and r:
                sweep(all_sims, "sweep")
                if failures:
                    break
    finally:
        server.finish()

    # final sweep + invariants
    sweep(all_sims, "final")
    if len(server._ring) != 0:
        failures.append(f"result ring not empty after finish: "
                        f"{len(server._ring)} entries")
    rss1 = rss_mb()
    growth = rss1 - (rss0 if rss0 is not None else rss1)
    if growth > args.rss_budget_mb:
        failures.append(f"RSS grew {growth:.0f} MB > budget "
                        f"{args.rss_budget_mb:.0f} MB")

    report = {
        "ok": not failures,
        "failures": failures,
        "duration_s": round(time.monotonic() - t0, 1),
        "ticks": ticks,
        "slots": S,
        "geometry": f"{w}x{h}",
        "streams_total": len(all_sims),
        "attaches": attaches,
        "detaches": detaches,
        "reader_deaths": deaths,
        "frames_produced": int(sum(s.produced for s in all_sims)),
        "frames_delivered": int(sum(len(s.delivered) for s in all_sims)),
        "identity_checked": identity_checked[0],
        "boundary_flip_frames": int(sum(s.v_diff_frames for s in all_sims)),
        "boundary_flip_mean_frac": round(
            sum(s.v_diff_sum for s in all_sims)
            / max(identity_checked[0], 1), 6),
        "sigterm_drained": bool(args.sigterm and stop.is_set()),
        "rss_warm_mb": round(rss0, 1) if rss0 is not None else None,
        "rss_end_mb": round(rss1, 1),
        "rss_growth_mb": round(growth, 1),
        "device": str(jax.devices()[0]),
    }
    atomic_json_dump(report, args.report)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
