#!/usr/bin/env python3
"""Multi-stream serving demo: N camera streams on a device mesh.

The TPU-native scale-out story (SURVEY.md §2.4): instead of running one
process per camera like the reference, stack frames from S streams into a
batch sharded over the mesh's ``data`` axis and run the whole fused frame
program — mask, composite, YUYV — in one dispatch, with per-stream
temporal EMA state carried on device.

Runs anywhere: on a multi-chip mesh the batch shards across chips over
ICI; on one chip it still batches (better MXU utilization, ~2.4x
aggregate throughput vs serial 720p frames, bench.py "batch8").

Usage: python examples/serve_multistream.py [n_streams] [frames]
(uses 8 virtual CPU devices if no multi-chip platform is available)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import jax
    # CPU requested via env (the sitecustomize in this image overrides
    # JAX_PLATFORMS, so apply it post-import like tests/conftest.py) ->
    # give the mesh 8 virtual devices; must run before the backend exists
    if "cpu" in (os.environ.get("JAX_PLATFORMS", "")
                 + os.environ.get("BACKSCRUB_TPU_PLATFORM", "")):
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass

    from backscrub_tpu.parallel.mesh import make_mesh
    from backscrub_tpu.parallel.streams import MultiStreamPipeline
    from backscrub_tpu.pipeline.frame import PipelineConfig

    mesh = make_mesh(min(len(jax.devices()), 8))
    dp = mesh.shape["data"]
    if n_streams % dp:
        n_streams = ((n_streams // dp) + 1) * dp
    print(f"mesh {dict(mesh.shape)}, serving {n_streams} streams")

    ms = MultiStreamPipeline("segm_lite_v681.tflite",
                             PipelineConfig(width=640, height=480),
                             n_streams, mesh)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (n_streams, 480, 640, 3), np.uint8)
    bgs = rng.integers(0, 256, (n_streams, 480, 640, 3), np.uint8)

    out, masks = ms.step(frames, bgs)  # compile
    import jax as j
    j.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_frames):
        out, masks = ms.step(frames, bgs)
    j.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{n_frames} batched steps: {n_frames * n_streams / dt:.1f} "
          f"aggregate frames/s ({n_frames / dt:.1f} steps/s)")

    # The production shape: N live sources glued to the batched dispatch by
    # MultiStreamServer (per-stream EMA, streams may end at different times).
    from backscrub_tpu.runtime.multistream import MultiStreamServer
    lengths = [10 + (s % 3) for s in range(n_streams)]
    iters = [iter([frames[s]] * lengths[s]) for s in range(n_streams)]
    sources = [lambda it=it: next(it, None) for it in iters]
    counts = [0] * n_streams
    sinks = [lambda _o, s=s: counts.__setitem__(s, counts[s] + 1)
             for s in range(n_streams)]
    server = MultiStreamServer(ms, sources, sinks, backgrounds=bgs)
    ticks = server.run()
    print(f"MultiStreamServer: {ticks} ticks, per-stream deliveries {counts}")


if __name__ == "__main__":
    main()
