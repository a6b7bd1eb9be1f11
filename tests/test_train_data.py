"""Training-data pipeline (train/data.py): construction, augmentation
consistency, and end-to-end trainability."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from conftest import model_path

MODEL = "segm_lite_v681.tflite"


@pytest.fixture(scope="module")
def model_and_spec():
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import spec_for_model
    p = model_path(MODEL)
    return load_model(p), spec_for_model(p)


def test_from_arrays_shapes_and_normalization(rng, model_and_spec):
    from backscrub_tpu.train.data import SegmentationData
    model, spec = model_and_spec
    frames = [rng.integers(0, 256, (120, 200, 3), np.uint8) for _ in range(6)]
    masks = [rng.integers(0, 256, (60, 100), np.uint8) for _ in range(6)]
    ds = SegmentationData.from_arrays(frames, masks, model, spec)
    assert ds.x.shape == (6,) + tuple(model.input_shape[1:])
    assert ds.y.shape == (6,) + tuple(model.output_shape[1:3])
    lo, hi = ds.x.min(), ds.x.max()
    assert 0.0 <= lo and hi <= 1.0  # meet norm is x/255
    assert 0.0 <= ds.y.min() and ds.y.max() <= 1.0


def test_mask_conventions(rng, model_and_spec):
    from backscrub_tpu.train.data import SegmentationData
    model, spec = model_and_spec
    frame = rng.integers(0, 256, (96, 160, 3), np.uint8)
    mask = np.zeros((96, 160), np.uint8)  # backscrub: all-person
    ds_b = SegmentationData.from_arrays([frame], [mask], model, spec,
                                        mask_convention="backscrub")
    ds_w = SegmentationData.from_arrays([frame], [mask], model, spec)
    assert ds_b.y.mean() == 1.0  # 0 = person -> prob 1
    assert ds_w.y.mean() == 0.0  # white convention: 0 = background


def test_batches_flip_consistency(rng, model_and_spec):
    """When a flip fires, x and y flip together (same augmentation draw)."""
    from backscrub_tpu.train.data import SegmentationData
    model, spec = model_and_spec
    # asymmetric data so flips are detectable
    frames, masks = [], []
    for _ in range(4):
        f = np.zeros((96, 160, 3), np.uint8)
        f[:, :80] = 200
        m = np.zeros((96, 160), np.uint8)
        m[:, :80] = 255
        frames.append(f)
        masks.append(m)
    ds = SegmentationData.from_arrays(frames, masks, model, spec)
    for x, y in ds.batches(4, rng=np.random.default_rng(3)):
        for b in range(4):
            left_bright = x[b, :, :40].mean() > x[b, :, -40:].mean()
            left_person = y[b, :, :20].mean() > y[b, :, -20:].mean()
            assert left_bright == left_person  # flip applied to both or neither


def test_batches_drop_partial_and_epochs(rng, model_and_spec):
    from backscrub_tpu.train.data import SegmentationData
    model, spec = model_and_spec
    frames = [rng.integers(0, 256, (96, 160, 3), np.uint8) for _ in range(5)]
    masks = [rng.integers(0, 256, (96, 160), np.uint8) for _ in range(5)]
    ds = SegmentationData.from_arrays(frames, masks, model, spec)
    bs = list(ds.batches(2, epochs=3, augment=False))
    assert len(bs) == 2 * 3  # 5//2 per epoch
    with pytest.raises(ValueError):
        next(ds.batches(6))


def test_from_dir_and_train(tmp_path, rng, model_and_spec):
    """Disk pairs -> dataset -> a few Trainer steps reduce the loss."""
    from backscrub_tpu.train.data import SegmentationData
    from backscrub_tpu.train.trainer import Trainer, TrainConfig
    model, spec = model_and_spec

    imgs, msks = tmp_path / "img", tmp_path / "msk"
    imgs.mkdir(), msks.mkdir()
    for i in range(4):
        f = rng.integers(0, 256, (96, 160, 3), np.uint8)
        m = np.zeros((96, 160), np.uint8)
        m[20:70, 40:120] = 255
        cv2.imwrite(str(imgs / f"{i}.png"), f)
        cv2.imwrite(str(msks / f"{i}.png"), m)
    cv2.imwrite(str(imgs / "unpaired.png"),
                rng.integers(0, 256, (96, 160, 3), np.uint8))
    ds = SegmentationData.from_dir(str(imgs), str(msks), model, spec)
    assert len(ds.x) == 4  # unpaired image skipped

    tr = Trainer(model, spec, config=TrainConfig(learning_rate=3e-3))
    losses = []
    for x, y in ds.batches(4, epochs=6, augment=False):
        losses.append(tr.step(x, y))
    assert losses[-1] < losses[0]


def test_self_label_teacher(rng, model_and_spec):
    from backscrub_tpu.pipeline.maskgen import MaskGen
    from backscrub_tpu.train.data import SegmentationData
    model, spec = model_and_spec
    teacher = MaskGen(model_path(MODEL), 160, 96)
    frames = [rng.integers(0, 256, (96, 160, 3), np.uint8) for _ in range(2)]
    ds = SegmentationData.self_label(frames, teacher, model, spec)
    assert ds.y.shape == (2,) + tuple(model.output_shape[1:3])
    assert 0.0 <= ds.y.min() and ds.y.max() <= 1.0
