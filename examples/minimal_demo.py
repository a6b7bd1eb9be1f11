#!/usr/bin/env python3
"""Minimal readable demo — the analog of the reference's historic Python
prototype (attic/deepseg.py, ~2.5 FPS on CPU): load a segmentation model,
mask one image, composite a background, save the result.  The whole
device-side path here is ~15,000 FPS at 720p on one TPU v5e chip.

Usage: python examples/minimal_demo.py input.jpg background.jpg out.png
"""

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tools"))

from backscrub_tpu import FramePipeline, PipelineConfig


def main():
    # defaults: repo-owned synthetic assets (tools/gen_assets.py), generated
    # deterministically on first use — no dependency on a mounted reference
    if len(sys.argv) > 2:
        inp, bgp = sys.argv[1], sys.argv[2]
    else:
        from gen_assets import ensure_assets
        inp, _, bgp = ensure_assets()
    out = sys.argv[3] if len(sys.argv) > 3 else "demo_out.png"

    frame = cv2.resize(cv2.imread(inp), (640, 480))
    bg = cv2.resize(cv2.imread(bgp), (640, 480))

    pipe = FramePipeline("selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
                         PipelineConfig(width=640, height=480, output_format="bgr"))
    for _ in range(4):  # settle the ~3-frame temporal EMA
        composited, mask = pipe.step(frame, bg)

    cv2.imwrite(out, np.asarray(composited))
    print(f"person pixels: {(np.asarray(mask) < 128).mean():.1%}; wrote {out}")


if __name__ == "__main__":
    main()
