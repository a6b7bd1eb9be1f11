"""Golden mask-parity helpers: the cv2 + TFLite CPU reference path.

An independent implementation of bs_maskgen_process semantics
(`lib/libbackscrub.cc:279-372` in the reference) used as the golden for
both the test suite (tests/test_pipeline.py) and the deployment fidelity
gate (`bench.py --parity`).  Lives in the package — NOT under tests/ —
so importing it never drags in test configuration (tests/conftest.py pins
JAX to the CPU platform at import time, which would silently defeat an
on-device parity check).

cv2 and tensorflow are imported lazily; this module keeps jax untouched.
"""

from __future__ import annotations

import numpy as np


def reference_maskgen(path, frames_bgr, width, height, spec) -> np.ndarray:
    """Golden mask for a frame sequence via cv2 + TFLite CPU."""
    import cv2
    import tensorflow as tf
    from ..pipeline.geometry import compute_roi

    it = tf.lite.Interpreter(model_path=path)
    it.allocate_tensors()
    din = it.get_input_details()[0]
    dout = it.get_output_details()[0]
    ih, iw = din["shape"][1:3]
    oh, ow = dout["shape"][1:3]
    g = compute_roi(width, height, iw, ih, ow, oh)
    ema = np.full((oh, ow), 255, np.uint8)
    mask_full = np.full((height, width), 255, np.uint8)
    for frame in frames_bgr:
        roi = frame[g.roi.y:g.roi.y + g.roi.h, g.roi.x:g.roi.x + g.roi.w]
        canvas = np.zeros((ih, iw, 3), np.uint8)
        # float-precision resize: cv2's u8 path is 11-bit fixed point and
        # disagrees with its own float path by +-1 on ~13% of pixels; the
        # golden uses the precise convention so the comparison measures the
        # pipeline, not cv2's quantization
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
        if spec.decode == "argmax_person":
            val = np.where(out.argmax(-1) == spec.person_class, 0, 255).astype(np.uint8)
        elif spec.decode == "threshold":
            val = np.where(out[..., 0] > spec.threshold, 0, 255).astype(np.uint8)
        else:
            val = np.where(out[..., 0] < out[..., 1], 0, 255).astype(np.uint8)
        ema = ((val & 0xE0) | (ema >> 3)).astype(np.uint8)
        small = ema[g.out_roi.y:g.out_roi.y + g.out_roi.h,
                    g.out_roi.x:g.out_roi.x + g.out_roi.w]
        up = cv2.resize(small, (g.roi.w, g.roi.h), interpolation=cv2.INTER_LINEAR)
        up = cv2.blur(up, (5, 5))
        mask_full[g.roi.y:g.roi.y + g.roi.h, g.roi.x:g.roi.x + g.roi.w] = up
    return mask_full


def iou(a_person: np.ndarray, b_person: np.ndarray) -> float:
    inter = np.logical_and(a_person, b_person).sum()
    union = np.logical_or(a_person, b_person).sum()
    return 1.0 if union == 0 else float(inter / union)


def classmap_agreement(path, frame_bgr, width, height, spec,
                       model=None) -> float:
    """Fraction of pixels where the device CNN's argmax class equals
    TFLite CPU's, on the identically preprocessed frame.

    Content-agnostic parity signal for multi-class models: DeepLab's
    person-IoU gate is vacuous on frames where it detects no person
    (iou() defines empty-vs-empty as 1.0), but 21-way argmax agreement
    over every pixel stays a strong fidelity check on any frame —
    including the repo's synthetic portrait, which VOC-trained DeepLab
    does not read as a person."""
    import cv2
    import tensorflow as tf
    from ..graph.executor import load_model
    from ..pipeline.geometry import compute_roi

    it = tf.lite.Interpreter(model_path=path)
    it.allocate_tensors()
    din = it.get_input_details()[0]
    dout = it.get_output_details()[0]
    ih, iw = din["shape"][1:3]
    oh, ow = dout["shape"][1:3]
    g = compute_roi(width, height, iw, ih, ow, oh)
    roi = frame_bgr[g.roi.y:g.roi.y + g.roi.h, g.roi.x:g.roi.x + g.roi.w]
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
    ref = it.get_tensor(dout["index"])[0]
    m = model if model is not None else load_model(path)
    dev = np.asarray(m(x[None]))[0]
    return float((ref.argmax(-1) == dev.argmax(-1)).mean())
