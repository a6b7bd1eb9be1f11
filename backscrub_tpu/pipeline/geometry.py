"""Aspect-ratio ROI geometry between camera frame and model input.

Mirrors the ROI setup at ``lib/libbackscrub.cc:238-246``:

- frame wider than model (frameratio < modelratio): segment only the
  centered frame column whose aspect matches the model; everything outside
  stays background (mask = 255).
- model wider than frame: letterbox the frame into the centered model
  sub-rect; the model's margins see black.

One generalization over the reference: the model-side rect is computed in
*output* coordinates too (scaled by output/input resolution), which makes
BodyPix (input 257x257, output 33x33) well-defined — the reference indexes
its 33x33 output with input-resolution coordinates, which only works when
the two resolutions agree.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Rect:
    x: int
    y: int
    w: int
    h: int


@dataclasses.dataclass(frozen=True)
class RoiGeometry:
    frame_w: int
    frame_h: int
    model_in_w: int
    model_in_h: int
    model_out_w: int
    model_out_h: int
    roi: Rect        # frame-side crop that the model sees
    in_roi: Rect     # model-input-side rect the frame is resized into
    out_roi: Rect    # same rect in model-output coordinates


def compute_roi(frame_w: int, frame_h: int, model_in_w: int, model_in_h: int,
                model_out_w: int, model_out_h: int) -> RoiGeometry:
    model_ratio = model_in_h / model_in_w
    frame_ratio = frame_h / frame_w
    if frame_ratio < model_ratio:
        # frame is wider than model: use only the frame center
        w = int(frame_h / model_ratio)
        roi = Rect((frame_w - w) // 2, 0, w, frame_h)
        in_roi = Rect(0, 0, model_in_w, model_in_h)
    else:
        # model is wider than frame: center the frame in the model
        roi = Rect(0, 0, frame_w, frame_h)
        w = int(model_in_h / frame_ratio)
        in_roi = Rect((model_in_w - w) // 2, 0, w, model_in_h)
    sx = model_out_w / model_in_w
    sy = model_out_h / model_in_h
    out_roi = Rect(int(round(in_roi.x * sx)), int(round(in_roi.y * sy)),
                   max(1, int(round(in_roi.w * sx))), max(1, int(round(in_roi.h * sy))))
    return RoiGeometry(frame_w, frame_h, model_in_w, model_in_h,
                       model_out_w, model_out_h, roi, in_roi, out_roi)
