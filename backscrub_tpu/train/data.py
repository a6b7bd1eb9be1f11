"""Training-data pipeline for fine-tuning segmentation models.

The reference documents retraining only as an external-tooling exercise
(models/retrain.md); here fine-tuning is first-class (train/trainer.py),
and this module supplies its input: (BGR frame, person-probability target)
pairs shuffled, augmented, and normalized into model-sized batches.

Conventions:
- frames are BGR u8 full-color images of any size (resized to the model
  input on the host at dataset-build time — training data prep is not on
  the serving hot path);
- targets are per-pixel person probability in [0, 1] at the model OUTPUT
  resolution, the exact contract of Trainer.step/evaluate;
- mask images on disk default to "person_white" (255 = person, the usual
  dataset convention); pass mask_convention="backscrub" for our serving
  convention (0 = person, lib/libbackscrub.cc mask semantics).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


class SegmentationData:
    """Batches of (normalized model input, person-prob target).

    Build with :meth:`from_arrays`, :meth:`from_dir`, or
    :meth:`self_label`; iterate with :meth:`batches`.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, spec):
        if len(x) != len(y):
            raise ValueError(f"{len(x)} frames vs {len(y)} targets")
        if len(x) == 0:
            raise ValueError("empty dataset")
        self.x = x  # (N, ih, iw, 3) f32, already normalized per spec
        self.y = y  # (N, oh, ow) f32 in [0, 1]
        self.spec = spec

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_arrays(cls, frames_bgr: Sequence[np.ndarray],
                    targets: Sequence[np.ndarray], model, spec,
                    mask_convention: str = "person_white"):
        """frames: BGR u8 (any size); targets: (h, w) u8 masks or float
        probabilities (any size, resized to the model output)."""
        import cv2
        ih, iw = model.input_shape[1:3]
        oh, ow = model.output_shape[1:3]
        xs, ys = [], []
        for f, t in zip(frames_bgr, targets):
            f = cv2.resize(np.asarray(f), (iw, ih))
            xs.append(_normalize(f, spec))
            t = np.asarray(t)
            if t.dtype == np.uint8:
                t = t.astype(np.float32) / 255.0
            if mask_convention == "backscrub":
                t = 1.0 - t  # serving convention: 0 = person -> prob 1
            elif mask_convention != "person_white":
                raise ValueError(
                    f"mask_convention must be 'person_white' or 'backscrub', "
                    f"got {mask_convention!r}")
            t = cv2.resize(t.astype(np.float32), (ow, oh))
            ys.append(np.clip(t, 0.0, 1.0))
        return cls(np.stack(xs), np.stack(ys), spec)

    @classmethod
    def from_dir(cls, images_dir: str, masks_dir: str, model, spec,
                 mask_convention: str = "person_white"):
        """Matching filenames: images_dir/x.png + masks_dir/x.png (mask
        grayscale).  Any cv2-readable extensions."""
        import cv2
        frames, targets = [], []
        for name in sorted(os.listdir(images_dir)):
            mpath = os.path.join(masks_dir, name)
            if not os.path.exists(mpath):
                continue
            img = cv2.imread(os.path.join(images_dir, name))
            msk = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
            if img is None or msk is None:
                import sys
                print(f"warning: skipping unreadable pair {name!r}",
                      file=sys.stderr)
                continue
            frames.append(img)
            targets.append(msk)
        if not frames:
            raise FileNotFoundError(
                f"no matching image/mask pairs in {images_dir} / {masks_dir}")
        return cls.from_arrays(frames, targets, model, spec,
                               mask_convention=mask_convention)

    @classmethod
    def self_label(cls, frames_bgr: Sequence[np.ndarray], teacher, model, spec):
        """Label frames with a teacher MaskGen (distillation: the teacher's
        serving-convention masks become soft person-prob targets)."""
        targets = []
        for f in frames_bgr:
            f = np.asarray(f)
            if f.shape[:2] != (teacher.geo.frame_h, teacher.geo.frame_w):
                import cv2
                f = cv2.resize(f, (teacher.geo.frame_w, teacher.geo.frame_h))
            mask = np.asarray(teacher.process(f))  # 0 = person
            targets.append(1.0 - mask.astype(np.float32) / 255.0)
        return cls.from_arrays(frames_bgr, targets, model, spec)

    # -- iteration ------------------------------------------------------------
    def batches(self, batch_size: int, *, rng: Optional[np.random.Generator] = None,
                augment: bool = True,
                epochs: int = 1) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Shuffled (x, y) batches; partial final batch dropped (static
        shapes keep one jit compilation).  Augmentation: horizontal flip
        (mirrors the target) and brightness/contrast jitter in the
        normalized domain (target unchanged)."""
        rng = rng or np.random.default_rng(0)
        n = len(self.x)
        if batch_size > n:
            raise ValueError(f"batch_size {batch_size} > dataset size {n}")
        for _ in range(epochs):
            order = rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i:i + batch_size]
                x = self.x[idx].copy()
                y = self.y[idx].copy()
                if augment:
                    flip = rng.random(batch_size) < 0.5
                    x[flip] = x[flip, :, ::-1]
                    y[flip] = y[flip, :, ::-1]
                    gain = rng.uniform(0.9, 1.1, (batch_size, 1, 1, 1)).astype(np.float32)
                    bias = rng.uniform(-0.05, 0.05, (batch_size, 1, 1, 1)).astype(np.float32)
                    lo, hi = self._norm_range()
                    x = np.clip(x * gain + bias * (hi - lo), lo, hi)
                yield x, y

    def _norm_range(self):
        s, o = self.spec.scale, self.spec.offset
        return (0 * s + o, 255 * s + o)


def _normalize(frame_bgr_u8: np.ndarray, spec) -> np.ndarray:
    """BGR u8 -> normalized RGB f32 per the model spec (the same
    normalization the serving preprocess applies, lib/libbackscrub.cc:302)."""
    rgb = frame_bgr_u8[..., ::-1].astype(np.float32)
    return rgb * np.float32(spec.scale) + np.float32(spec.offset)
