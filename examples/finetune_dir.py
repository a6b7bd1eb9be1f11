#!/usr/bin/env python3
"""Fine-tune a segmentation model from an on-disk dataset.

The complete training loop on the framework's own primitives:

1. ``SegmentationData.from_dir`` loads matched image/mask pairs,
2. ``Trainer`` runs augmented mini-batches on the default device (add
   ``mesh=make_mesh(N)`` for multi-chip dp+tp+sp),
3. ``Trainer.evaluate`` reports loss + decode-rule-exact mask IoU,
4. the tuned weights export back to a TFLite-loadable file.

Usage: python examples/finetune_dir.py <images_dir> <masks_dir> [epochs]
With no arguments, a tiny synthetic dataset is generated so the example
is runnable anywhere (JAX_PLATFORMS=cpu works).
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def make_synthetic_dataset(root, n=8, w=160, h=96):
    import cv2
    imgs, msks = os.path.join(root, "img"), os.path.join(root, "msk")
    os.makedirs(imgs), os.makedirs(msks)
    rng = np.random.default_rng(0)
    for i in range(n):
        frame = rng.integers(0, 256, (h, w, 3), np.uint8)
        mask = np.zeros((h, w), np.uint8)
        x0, y0 = rng.integers(10, w // 2), rng.integers(10, h // 2)
        mask[y0:y0 + h // 3, x0:x0 + w // 3] = 255  # person = white
        frame[mask > 0] = (frame[mask > 0] // 2) + 96  # make it learnable
        cv2.imwrite(os.path.join(imgs, f"{i}.png"), frame)
        cv2.imwrite(os.path.join(msks, f"{i}.png"), mask)
    return imgs, msks


def main():
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import resolve_model_path, spec_for_model
    from backscrub_tpu.tflite.export import export_params_to_tflite
    from backscrub_tpu.train.data import SegmentationData
    from backscrub_tpu.train.trainer import Trainer, TrainConfig

    if len(sys.argv) >= 3:
        images_dir, masks_dir = sys.argv[1], sys.argv[2]
        tmp = None
    else:
        tmp = tempfile.mkdtemp(prefix="bs_finetune_")
        images_dir, masks_dir = make_synthetic_dataset(tmp)
        print(f"no dataset given; synthesized one in {tmp}")
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    model_path = resolve_model_path("segm_lite_v681.tflite")
    model = load_model(model_path)
    spec = spec_for_model(model_path)
    ds = SegmentationData.from_dir(images_dir, masks_dir, model, spec)
    print(f"dataset: {len(ds.x)} pairs at {ds.x.shape[1:]}")

    tr = Trainer(model, spec, config=TrainConfig(learning_rate=1e-3))
    before = tr.evaluate(ds.x, ds.y)
    rng = np.random.default_rng(1)
    bs = min(4, len(ds.x))
    for x, y in ds.batches(bs, rng=rng, epochs=epochs):
        loss = tr.step(x, y)
    after = tr.evaluate(ds.x, ds.y)
    print(f"loss {before['loss']:.4f} -> {after['loss']:.4f}; "
          f"mask IoU {before['iou']:.3f} -> {after['iou']:.3f}")

    out = "/tmp/segm_lite_finetuned.tflite"
    n = export_params_to_tflite(model_path, model, tr.params, out)
    print(f"exported {n} tensors -> {out}")


if __name__ == "__main__":
    main()
