"""Probe: dilated-DW formulation A/B on the real TPU (round 5).

The round-4 rooflines show deeplab's three dilation-4 480-channel DWs at
~12.5 us each (165 GB/s — 20% of the HBM roof) plus ~34 us of relu6
relayout copies around the 33x33 regime.  This probe times the FULL fused
step (scan+checksum harness, the only trustworthy timing through this
tunnel) with the dilated DWs lowered two ways:

  conv   — grouped-conv emitter with rhs_dilation (shipping default)
  shift  — fh*fw shifted multiply-adds (BACKSCRUB_DW_DILATED=shift);
           lane-full C>=96 differs from the rejected C=16 case

and asserts mask parity between the modes under the tolerance invariant.
Each mode runs in a FRESH subprocess (XLA cache makes the second compile
cheap; in-process re-tracing would share stale lowering constants).

Run: ``python tools/probe_dw.py [deeplab|bodypix]``.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = {"deeplab": "deeplabv3_257_mv_gpu.tflite",
         "bodypix": "body-pix-float-050-8.tflite"}


def run_one(fam: str, mode: str):
    """Child: time the fused step with the given DW mode; print one line."""
    from backscrub_tpu.models.specs import install_default_search_roots
    install_default_search_roots()
    import numpy as np
    import bench
    from backscrub_tpu.models.specs import resolve_model_path
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig

    path = resolve_model_path(NAMES[fam])
    W, H = 1280, 720
    cfg = PipelineConfig(width=W, height=H)
    pipe = FramePipeline(path, cfg)
    fps_best, med_ms, fps_med = bench.measure(pipe, W, H, iters=200)
    print(f"RESULT {fam} {mode}: {med_ms * 1e3:.1f} us/step median "
          f"({fps_med:.0f} fps)", flush=True)
    # mask bytes for cross-mode parity (fixed frame, 3 steps)
    from backscrub_tpu.pipeline.maskgen import MaskGen
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    mg = MaskGen(path, W, H)
    for _ in range(3):
        m = mg.process(img)
    np.save(f"/tmp/probe_dw_{fam}_{mode}.npy", np.asarray(m))


def main():
    fam = sys.argv[1] if len(sys.argv) > 1 else "deeplab"
    for mode in ("conv", "shift"):
        env = dict(os.environ)
        env.pop("BACKSCRUB_DW_DILATED", None)
        if mode == "shift":
            env["BACKSCRUB_DW_DILATED"] = "shift"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), fam,
             "--child", mode], env=env)
        if r.returncode:
            sys.exit(r.returncode)
    import numpy as np
    a = np.load(f"/tmp/probe_dw_{fam}_conv.npy").astype(np.int16)
    b = np.load(f"/tmp/probe_dw_{fam}_shift.npy").astype(np.int16)
    dmax = int(np.abs(a - b).max())
    frac = float((a != b).mean())
    print(f"parity {fam}: maxdiff={dmax} fracdiff={frac:.5f}", flush=True)
    assert dmax <= 1 and frac <= 0.02, "tolerance invariant violated"


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_one(sys.argv[1], sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
