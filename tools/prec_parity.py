#!/usr/bin/env python3
"""Decode-level parity of the device CNN vs TFLite CPU across MXU
precisions, on content-rich frames.

The shipped parity gates run on the synthetic portrait, which VOC-trained
DeepLab reads as all-background — a vacuous input for measuring whether
dropping conv precision (HIGHEST -> HIGH/DEFAULT) flips decode decisions.
This probe evaluates the *decode map* (21-way argmax for DeepLab,
threshold decision for BodyPix/selfie) against TFLite CPU on frames with
real class structure: the portrait, the synthetic background, and
low-frequency random fields (whose score maps exercise many argmax
boundaries per frame).

Prints one JSON line per (model, precision): mean/min agreement over the
frame set — the evidence for choosing each family's default precision.

Usage: python tools/prec_parity.py [--model deeplab] [--frames 6]
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


def make_frames(n: int, w: int = 1280, h: int = 720):
    """Portrait + still background + any real photos the environment has
    (diagnostic only — extra photo roots come from the
    BACKSCRUB_TPU_BACKGROUNDS search path, never a hardcoded mount;
    real photographs excite non-background classes) + low-frequency
    random fields."""
    import glob
    import cv2
    from gen_assets import ensure_assets
    portrait, _, still = ensure_assets()
    frames = [cv2.resize(cv2.imread(portrait), (w, h)),
              cv2.resize(cv2.imread(still), (w, h))]
    photos = []
    for root in os.environ.get("BACKSCRUB_TPU_BACKGROUNDS", "").split(":"):
        if root:
            photos += (sorted(glob.glob(os.path.join(root, "*.jpg")))
                       + sorted(glob.glob(os.path.join(root, "*.png"))))
    for p in photos[:4]:
        img = cv2.imread(p)
        if img is not None:
            frames.append(cv2.resize(img, (w, h)))
    rng = np.random.default_rng(7)
    while len(frames) < n:
        # low-frequency field: upsampled tiny noise -> smooth class regions
        tiny = rng.integers(0, 256, (9, 16, 3), np.uint8)
        frames.append(cv2.resize(tiny, (w, h),
                                 interpolation=cv2.INTER_CUBIC))
    return frames[:n]


def golden_and_input(path, frame, w, h, spec):
    """TFLite CPU decode map + the identically preprocessed input."""
    import cv2
    import tensorflow as tf
    from backscrub_tpu.pipeline.geometry import compute_roi

    it = tf.lite.Interpreter(model_path=path)
    it.allocate_tensors()
    din = it.get_input_details()[0]
    dout = it.get_output_details()[0]
    ih, iw = din["shape"][1:3]
    oh, ow = dout["shape"][1:3]
    g = compute_roi(w, h, iw, ih, ow, oh)
    roi = frame[g.roi.y:g.roi.y + g.roi.h, g.roi.x:g.roi.x + g.roi.w]
    canvas = np.zeros((ih, iw, 3), np.uint8)
    small = cv2.resize(roi.astype(np.float32), (g.in_roi.w, g.in_roi.h),
                       interpolation=cv2.INTER_LINEAR)
    canvas[g.in_roi.y:g.in_roi.y + g.in_roi.h,
           g.in_roi.x:g.in_roi.x + g.in_roi.w] = \
        np.clip(np.round(small), 0, 255).astype(np.uint8)
    rgb = cv2.cvtColor(canvas, cv2.COLOR_BGR2RGB)
    rgb = cv2.bilateralFilter(rgb, 5, 100.0, 100.0)
    x = rgb.astype(np.float32) * spec.scale + spec.offset
    it.set_tensor(din["index"], x[None])
    it.invoke()
    out = it.get_tensor(dout["index"])[0]
    return decode_map(out, spec), out, x


def decode_map(out: np.ndarray, spec) -> np.ndarray:
    if spec.decode.startswith("argmax"):
        return out.argmax(-1).astype(np.int32)
    if spec.decode == "threshold":
        return (out[..., 0] > spec.threshold).astype(np.int32)
    return (out[..., 0] < out[..., 1]).astype(np.int32)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="deeplab")
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args(argv)

    import jax
    from roofline import MODEL_SHORT
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import resolve_model_path, spec_for_model

    path = resolve_model_path(MODEL_SHORT[args.model])
    spec = spec_for_model(path)
    frames = make_frames(args.frames)
    goldens = []
    for f in frames:
        goldens.append(golden_and_input(path, f, 1280, 720, spec))

    # decode margin of the CPU golden: how far a score deviation must move
    # a pixel before its decode decision can flip.  For argmax decodes the
    # margin is top1-top2 (a flip needs a deviation pair summing past it);
    # for threshold decodes it is |score - threshold|.
    def margins(out: np.ndarray) -> np.ndarray:
        if spec.decode.startswith("argmax"):
            part = np.partition(out, -2, axis=-1)
            return part[..., -1] - part[..., -2]
        if spec.decode == "threshold":
            return np.abs(out[..., 0] - spec.threshold)
        return np.abs(out[..., 1] - out[..., 0])

    for prec_name in ("highest", "high", "default"):
        prec = getattr(jax.lax.Precision, prec_name.upper())
        m = load_model(path, precision=prec)
        ags, persons, devs, margin_mins = [], [], [], []
        for (gmap, gout, x) in goldens:
            dev = np.asarray(m(x[None]), np.float32)[0]
            dmap = decode_map(dev, spec)
            ags.append(float((dmap == gmap).mean()))
            persons.append(float((dmap != 0).mean()))
            devs.append(float(np.abs(dev - gout).max()))
            mg = margins(gout)
            margin_mins.append(float(np.percentile(mg, 0.01)))
        print(json.dumps({
            "model": args.model, "precision": prec_name,
            "agreement_mean": round(float(np.mean(ags)), 6),
            "agreement_min": round(float(np.min(ags)), 6),
            "per_frame": [round(a, 6) for a in ags],
            "nonzero_frac": [round(p, 4) for p in persons],
            # flip-safety evidence: a decode flip needs ~2x the score
            # deviation to exceed the local margin; dev_max << margin_p001
            # means agreement=1.0 is forced, not lucky
            "score_dev_max_vs_cpu": round(float(np.max(devs)), 5),
            "golden_margin_p001": round(float(np.min(margin_mins)), 5),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
