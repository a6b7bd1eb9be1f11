#!/usr/bin/env python3
"""One-variant perf/parity probe for per-model experiments.

Measures the full 720p fused step for ONE (model, precision, edge, mega)
variant with the scan+checksum harness (bench.measure — see CLAUDE.md's
CRITICAL measurement note) and dumps parity artifacts for cross-variant
diffs:

  /tmp/ab_<model>_<tag>_mask.npy    frame-res u8 mask on the portrait asset
  /tmp/ab_<model>_<tag>_arg.npy     model-res decode map (argmax class for
                                    deeplab, thresholded channel otherwise)

Run each variant in its OWN process (this container has one core; in-process
sequencing contends and XLA programs fuse differently when colocated).

Usage: python tools/ab.py --model deeplab --precision high --edge auto --tag h
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from backscrub_tpu.models.specs import install_default_search_roots
install_default_search_roots()

PRECS = {"highest": "HIGHEST", "high": "HIGH", "default": "DEFAULT"}


def portrait_720p() -> np.ndarray:
    import cv2
    from gen_assets import ensure_assets
    portrait = ensure_assets()[0]
    img = cv2.imread(portrait)
    return cv2.resize(img, (1280, 720), interpolation=cv2.INTER_AREA)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="deeplab")
    ap.add_argument("--precision", default="highest", choices=sorted(PRECS))
    ap.add_argument("--edge", default="auto", choices=["auto", "off"])
    ap.add_argument("--mega", default="auto", choices=["auto", "off"])
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--tag", default="base")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import bench
    from roofline import MODEL_SHORT
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.models.specs import resolve_model_path
    from backscrub_tpu.pipeline.maskgen import preprocess

    prec = getattr(jax.lax.Precision, PRECS[args.precision])
    cfg = PipelineConfig(
        width=1280, height=720,
        edge_fused=(False if args.edge == "off" else None),
        edge_mega=(False if args.mega == "off" else None))
    pipe = FramePipeline(resolve_model_path(MODEL_SHORT[args.model]), cfg,
                         precision=prec)
    fps_best, med_ms, fps_med = bench.measure(pipe, 1280, 720,
                                              iters=args.iters)

    rec = {"model": args.model, "tag": args.tag,
           "precision": args.precision, "edge": args.edge, "mega": args.mega,
           "fps_best": round(fps_best, 1), "fps_median": round(fps_med, 1),
           "p50_ms": round(med_ms, 4)}

    if not args.skip_parity:
        frame = portrait_720p()
        mg = pipe.maskgen
        mask = mg.process(frame)
        np.save(f"/tmp/ab_{args.model}_{args.tag}_mask.npy", mask)
        # model-level decode map through the CLASSIC preprocess at this
        # precision — isolates the CNN-precision effect from the edge path
        x = preprocess(jnp.asarray(frame), mg.geo, mg.spec,
                       use_bilateral=True, precision=prec)
        out = np.asarray(mg.model.raw_fn(mg.model.params, x[None])[0],
                         np.float32)
        if out.shape[-1] > 2:
            dec = np.argmax(out, -1).astype(np.int32)
        elif out.shape[-1] == 2:
            dec = (out[..., 1] > out[..., 0]).astype(np.int32)
        else:
            dec = (out[..., 0] > 0.5).astype(np.int32)
        np.save(f"/tmp/ab_{args.model}_{args.tag}_arg.npy", dec)
        rec["mask_mean"] = float(mask.mean())
        rec["decode_person_frac"] = float((dec != dec.max()).mean())
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
