"""Probe: continuation-chain megakernel on the real TPU (round 5).

Compile-checks the compact-spacing continuation chain (the deeplab/bodypix
33x33 C>=96 regime as chained rowpad Pallas kernels, ops/megakernel.py
body_mega_continuation_for) on real hardware, asserts decode parity vs the
XLA body path under the tolerance invariant, and times the FULL fused step
both ways with bench.py's scan+checksum harness (the only trustworthy
timing through this tunnel — CLAUDE.md measurement doctrine).

Run: ``python tools/probe_cont.py [deeplab|bodypix] [--parity-only]``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from backscrub_tpu.models.specs import install_default_search_roots
install_default_search_roots()

import numpy as np

NAMES = {"deeplab": "deeplabv3_257_mv_gpu.tflite",
         "bodypix": "body-pix-float-050-8.tflite"}


def main():
    import jax.numpy as jnp
    from backscrub_tpu.pipeline.maskgen import MaskGen
    from backscrub_tpu.models.specs import resolve_model_path
    import bench

    fam = sys.argv[1] if len(sys.argv) > 1 else "deeplab"
    parity_only = "--parity-only" in sys.argv
    path = resolve_model_path(NAMES[fam])
    W, H = 1280, 720
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)

    on = MaskGen(path, W, H, edge_fused=True, edge_cont=True)
    e = on.edge
    print(f"{fam}: mega_prefix={e.mega_prefix is not None} "
          f"mega_cont={None if e.mega_cont is None else len(e.mega_cont)} "
          f"body_residual={e._body is not None}", flush=True)
    off = MaskGen(path, W, H, edge_fused=True, edge_mega=False)

    # parity under the tolerance invariant (3 steps so the EMA settles)
    for i in range(3):
        a = on.process(img).astype(np.int16)
        b = off.process(img).astype(np.int16)
        dmax = int(np.abs(a - b).max())
        frac = float((a != b).mean())
        print(f"  step {i}: maxdiff={dmax} fracdiff={frac:.5f}", flush=True)
        assert dmax <= 1 and frac <= 0.02, "tolerance invariant violated"
    print("  parity OK", flush=True)
    if parity_only:
        return

    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    for label, cont in (("cont-chain", True), ("xla-body", False)):
        cfg = PipelineConfig(width=W, height=H, edge_cont=cont)
        pipe = FramePipeline(path, cfg)
        fps_best, med_ms, fps_med = bench.measure(pipe, W, H, iters=200)
        print(f"  {label}: {med_ms * 1e3:.1f} us/step median "
              f"({fps_med:.0f} fps)", flush=True)


if __name__ == "__main__":
    main()
