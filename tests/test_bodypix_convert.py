"""Offline test of the BodyPix TFJS -> .tflite conversion path
(tools/get_bodypix.py; reference models/body-pix/get-model.sh + myconverter.py).

No network in this environment, so a miniature TFJS graph model (model.json
GraphDef-in-JSON + binary weight shard, the real wire format) is built
locally; the converter must graft the input at ``sub_2`` (skipping the
preprocessing nodes like the reference converter), produce a valid
flatbuffer, and the result must agree with stock TFLite AND load through
this framework's own loader.
"""

import base64
import json
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from get_bodypix import build_concrete_function, convert, load_weights

SIZE = 9


def _attr_strides(*s):
    return {"list": {"i": [str(x) for x in s]}}


def _attr_pad(p):
    return {"s": base64.b64encode(p.encode()).decode()}


@pytest.fixture
def tfjs_dir(tmp_path, rng):
    """A miniature BodyPix-shaped TFJS graph model on disk."""
    w0 = rng.standard_normal((3, 3, 3, 4)).astype(np.float32) * 0.3
    b0 = rng.standard_normal((4,)).astype(np.float32) * 0.1
    dw = rng.standard_normal((3, 3, 4, 1)).astype(np.float32) * 0.3
    b1 = rng.standard_normal((4,)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((1, 1, 4, 1)).astype(np.float32) * 0.3
    b2 = rng.standard_normal((1,)).astype(np.float32) * 0.1
    weights = dict(w0=w0, b0=b0, dw=dw, b1=b1, w2=w2, b2=b2)

    nodes = [
        # preprocessing nodes BEFORE the graft point: must be skipped
        {"name": "image", "op": "Placeholder"},
        {"name": "mul_1", "op": "Mul", "input": ["image", "image"]},
        {"name": "sub_2", "op": "Sub", "input": ["mul_1", "mul_1"]},
        # the network proper
        {"name": "w0", "op": "Const"},
        {"name": "b0", "op": "Const"},
        {"name": "conv0", "op": "Conv2D", "input": ["sub_2", "w0"],
         "attr": {"strides": _attr_strides(1, 1, 1, 1),
                  "padding": _attr_pad("SAME"),
                  "dilations": _attr_strides(1, 1, 1, 1)}},
        {"name": "bias0", "op": "BiasAdd", "input": ["conv0", "b0"]},
        {"name": "relu0", "op": "Relu6", "input": ["bias0"]},
        {"name": "dw", "op": "Const"},
        {"name": "b1", "op": "Const"},
        {"name": "conv1", "op": "DepthwiseConv2dNative",
         "input": ["relu0", "dw"],
         "attr": {"strides": _attr_strides(1, 1, 1, 1),
                  "padding": _attr_pad("SAME"),
                  "dilations": _attr_strides(1, 1, 1, 1)}},
        {"name": "bias1", "op": "BiasAdd", "input": ["conv1", "b1"]},
        {"name": "relu1", "op": "Relu6", "input": ["bias1"]},
        {"name": "w2", "op": "Const"},
        {"name": "b2", "op": "Const"},
        {"name": "conv2", "op": "Conv2D", "input": ["relu1", "w2"],
         "attr": {"strides": _attr_strides(1, 1, 1, 1),
                  "padding": _attr_pad("SAME"),
                  "dilations": _attr_strides(1, 1, 1, 1)}},
        {"name": "float_segments", "op": "BiasAdd", "input": ["conv2", "b2"]},
    ]

    blob = b"".join(weights[k].tobytes() for k in weights)
    shard = "group1-shard1of1.bin"
    manifest = [{"paths": [shard],
                 "weights": [{"name": k, "shape": list(weights[k].shape),
                              "dtype": "float32"} for k in weights]}]
    mj = {"modelTopology": {"node": nodes}, "weightsManifest": manifest}
    d = tmp_path / "tfjs"
    d.mkdir()
    (d / "model.json").write_text(json.dumps(mj))
    (d / shard).write_bytes(blob)
    return str(d), weights


def _expected(weights, x):
    """The miniature network in plain TF for a golden value."""
    y = tf.nn.relu6(tf.nn.bias_add(
        tf.nn.conv2d(x, weights["w0"], [1, 1, 1, 1], "SAME"), weights["b0"]))
    y = tf.nn.relu6(tf.nn.bias_add(
        tf.nn.depthwise_conv2d(y, weights["dw"], [1, 1, 1, 1], "SAME"),
        weights["b1"]))
    y = tf.nn.bias_add(
        tf.nn.conv2d(y, weights["w2"], [1, 1, 1, 1], "SAME"), weights["b2"])
    return y.numpy()


def test_weights_manifest_roundtrip(tfjs_dir):
    d, weights = tfjs_dir
    mj = json.load(open(os.path.join(d, "model.json")))
    loaded = load_weights(d, mj["weightsManifest"])
    assert set(loaded) == set(weights)
    for k in weights:
        np.testing.assert_array_equal(loaded[k], weights[k])


def test_concrete_function_grafts_at_sub_2(tfjs_dir, rng):
    d, weights = tfjs_dir
    mj = json.load(open(os.path.join(d, "model.json")))
    cf = build_concrete_function(mj["modelTopology"]["node"],
                                 load_weights(d, mj["weightsManifest"]),
                                 size=SIZE)
    x = rng.standard_normal((1, SIZE, SIZE, 3)).astype(np.float32)
    # grafted input: the Mul/Sub preprocessing must NOT run on x
    np.testing.assert_allclose(cf(tf.constant(x)).numpy(),
                               _expected(weights, x), rtol=1e-5, atol=1e-5)


def test_convert_produces_loadable_tflite(tfjs_dir, rng, tmp_path):
    d, weights = tfjs_dir
    out = str(tmp_path / "body-pix-mini.tflite")
    blob = convert(d, out, size=SIZE)
    assert blob[4:8] == b"TFL3"
    x = rng.standard_normal((1, SIZE, SIZE, 3)).astype(np.float32)
    golden = _expected(weights, x)

    # stock TFLite agrees
    it = tf.lite.Interpreter(model_path=out)
    it.allocate_tensors()
    det = it.get_input_details()[0]
    assert tuple(det["shape"]) == (1, SIZE, SIZE, 3)
    it.set_tensor(det["index"], x)
    it.invoke()
    y_tfl = it.get_tensor(it.get_output_details()[0]["index"])
    np.testing.assert_allclose(y_tfl, golden, rtol=1e-5, atol=1e-5)

    # and this framework's own loader runs the produced file
    from backscrub_tpu.graph.executor import load_model
    m = load_model(out)
    np.testing.assert_allclose(np.asarray(m(x)), golden, rtol=1e-5, atol=1e-5)
