"""Fine-tune -> checkpoint -> export-to-tflite round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from backscrub_tpu.graph.executor import load_model
from backscrub_tpu.models.specs import spec_for_model
from backscrub_tpu.tflite.export import export_params_to_tflite
from backscrub_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from backscrub_tpu.train.trainer import Trainer, TrainConfig

from conftest import model_path, tflite_invoke


def test_export_roundtrip_unmodified(tmp_path):
    """Exporting unchanged params reproduces the original model bit-for-bit
    in behavior (buffers identical up to f32<->f16 exact round trip)."""
    src = model_path("segm_lite_v681.tflite")
    m = load_model(src)
    out = str(tmp_path / "same.tflite")
    n = export_params_to_tflite(src, m, {k: np.asarray(v) for k, v in m.params.items()}, out)
    assert n > 50
    x = np.random.default_rng(0).random(m.input_shape, np.float32)
    np.testing.assert_allclose(tflite_invoke(out, x), tflite_invoke(src, x),
                               atol=1e-6, rtol=1e-6)


def test_finetune_then_export_changes_tflite(tmp_path, rng):
    src = model_path("segm_lite_v681.tflite")
    m = load_model(src)
    tr = Trainer(m, spec_for_model(src), config=TrainConfig(learning_rate=1e-3))
    x = rng.random((2, 96, 160, 3), np.float32)
    t = np.ones((2, 96, 160), np.float32)  # everything is person
    for _ in range(3):
        tr.step(x, t)
    out = str(tmp_path / "tuned.tflite")
    n = export_params_to_tflite(src, m, {k: np.asarray(v) for k, v in tr.params.items()}, out)
    assert n > 50
    y_orig = tflite_invoke(src, x[:1])
    y_tuned = tflite_invoke(out, x[:1])
    assert not np.allclose(y_orig, y_tuned)
    # tuned model pushed toward person (channel 1 logits up)
    assert (y_tuned[..., 1] - y_tuned[..., 0]).mean() > (y_orig[..., 1] - y_orig[..., 0]).mean()
    # and our own loader agrees with TFLite on the tuned file
    m2 = load_model(out)
    np.testing.assert_allclose(np.asarray(m2(x[:1])), y_tuned, atol=1e-3, rtol=1e-3)


def test_export_from_quantized_model_dequantizes(tmp_path, rng):
    """Exporting a quantize='int8' model writes dequantized weights (not raw
    int8 codes cast to float); the result stays close to the original."""
    src = model_path("segm_lite_v681.tflite")
    m = load_model(src, quantize="int8")
    out = str(tmp_path / "deq.tflite")
    n = export_params_to_tflite(src, m, {k: np.asarray(v) for k, v in m.params.items()}, out)
    assert n > 50
    x = rng.random(m.input_shape, np.float32)
    y_src = tflite_invoke(src, x)
    y_out = tflite_invoke(out, x)
    # int8 weight round trip: small quantization error, same decisions
    assert np.abs(y_out - y_src).max() < 2.0
    agree = ((y_src[..., 1] > y_src[..., 0]) == (y_out[..., 1] > y_out[..., 0])).mean()
    assert agree > 0.99


def test_export_multisubgraph_roundtrip(tmp_path, rng):
    """Multi-subgraph (WHILE/IF) models export with weights routed to the
    correct subgraph buffers."""
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec((1, 8), tf.float32)])
        def __call__(self, x):
            i = tf.constant(0)
            w = tf.constant(np.linspace(0.5, 1.5, 8, dtype=np.float32))
            _, y = tf.while_loop(lambda i, v: i < 2,
                                 lambda i, v: (i + 1, v * w), [i, x])
            return y

    m = M()
    blob = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m).convert()
    src = str(tmp_path / "ctrl.tflite")
    open(src, "wb").write(blob)
    from backscrub_tpu.tflite.loader import load_tflite
    from backscrub_tpu.graph.executor import build_model
    cm = build_model(load_tflite(src))
    out = str(tmp_path / "ctrl2.tflite")
    export_params_to_tflite(src, cm, {k: np.asarray(v) for k, v in cm.params.items()}, out)
    x = rng.random((1, 8), np.float32)
    np.testing.assert_allclose(tflite_invoke(out, x), tflite_invoke(src, x),
                               atol=1e-7, rtol=1e-7)


def test_checkpoint_roundtrip(tmp_path, rng):
    src = model_path("segm_lite_v681.tflite")
    m = load_model(src)
    tr = Trainer(m, spec_for_model(src), config=TrainConfig(learning_rate=1e-3))
    x = rng.random((2, 96, 160, 3), np.float32)
    t = np.zeros((2, 96, 160), np.float32)
    tr.step(x, t)
    ck = str(tmp_path / "ck.npz")
    save_checkpoint(ck, tr.params, tr.opt_state, step=7)
    params2, opt2, step = load_checkpoint(ck, tr.params, tr.opt_state)
    assert step == 7
    for k in tr.params:
        np.testing.assert_array_equal(np.asarray(tr.params[k]), params2[k])
    # resumed trainer continues from identical state: identical next loss
    l_a = tr.step(x, t)
    tr.params, tr.opt_state = ({k: jnp.asarray(v) for k, v in params2.items()},
                               jax.tree_util.tree_map(jnp.asarray, opt2))
    l_b = tr.step(x, t)
    np.testing.assert_allclose(l_a, l_b, rtol=1e-6)


import jax  # noqa: E402  (used in test_checkpoint_roundtrip)


def test_trainer_evaluate_metrics():
    """evaluate() returns loss+IoU; IoU rises as training fits a target."""
    import jax.numpy as jnp
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import spec_for_model
    from backscrub_tpu.train.trainer import Trainer, TrainConfig

    path = model_path("segm_lite_v681.tflite")
    model = load_model(path)
    spec = spec_for_model(path)
    rng = np.random.default_rng(5)
    x = rng.random((2, 96, 160, 3), np.float32)
    y = np.zeros((2, 96, 160), np.float32)
    y[:, 30:70, 40:120] = 1.0

    tr = Trainer(model, spec, config=TrainConfig(learning_rate=3e-3))
    before = tr.evaluate(x, y)
    assert set(before) == {"loss", "iou"} and 0.0 <= before["iou"] <= 1.0
    for _ in range(8):
        tr.step(x, y)
    after = tr.evaluate(x, y)
    assert after["loss"] < before["loss"]
    assert after["iou"] >= before["iou"]
