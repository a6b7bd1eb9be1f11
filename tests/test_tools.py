"""Tooling tests: Keras->tflite conversion into our executor, cmake config,
loopback self-test harness."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_keras_model_loads_in_executor(tmp_path):
    tf = pytest.importorskip("tensorflow")
    # a tiny conv segmentation-ish net exercising several lowerings
    inp = tf.keras.Input((32, 32, 3))
    x = tf.keras.layers.Conv2D(8, 3, padding="same", activation="relu")(inp)
    x = tf.keras.layers.DepthwiseConv2D(3, padding="same")(x)
    x = tf.keras.layers.Conv2D(4, 1, activation="relu")(x)
    x = tf.keras.layers.UpSampling2D(interpolation="bilinear")(x)
    out = tf.keras.layers.Conv2D(1, 1, activation="sigmoid")(x)
    model = tf.keras.Model(inp, out)

    sys.path.insert(0, REPO)
    from tools.convert_model import convert
    dst = str(tmp_path / "custom_selfie.tflite")
    saved = str(tmp_path / "saved")
    model.export(saved)  # SavedModel
    convert(saved, dst)

    from backscrub_tpu.graph.executor import load_model
    m = load_model(dst)
    x_in = np.random.default_rng(0).random((1, 32, 32, 3), np.float32)
    y = np.asarray(m(x_in))
    assert y.shape[-3:] == (64, 64, 1)
    # golden vs TFLite on the converted file
    from conftest import tflite_invoke
    ref = tflite_invoke(dst, x_in)
    np.testing.assert_allclose(y, ref, atol=1e-4, rtol=1e-4)


def test_convert_model_with_shape_plumbing(tmp_path):
    """Flatten+Dense heads emit SHAPE->STRIDED_SLICE->PACK->RESHAPE chains;
    these must fold at trace time (static shapes under XLA)."""
    tf = pytest.importorskip("tensorflow")
    inp = tf.keras.Input((16, 16, 3))
    x = tf.keras.layers.Conv2D(4, 3, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    x = tf.keras.layers.Flatten()(x)
    out = tf.keras.layers.Dense(10, activation="softmax")(x)
    model = tf.keras.Model(inp, out)
    blob = tf.lite.TFLiteConverter.from_keras_model(model).convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    g = load_tflite_bytes(blob)
    m = build_model(g)
    x_in = np.random.default_rng(0).random(m.input_shape, np.float32)
    y = np.asarray(m(x_in))

    import tensorflow as tf2
    it = tf2.lite.Interpreter(model_content=blob)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x_in)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])
    np.testing.assert_allclose(y, ref, atol=1e-5, rtol=1e-5)


def test_control_flow_while_if(tmp_path):
    """WHILE/IF ops lower to lax.while_loop/lax.cond with their referenced
    subgraphs traced inline; output matches TFLite exactly."""
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec((1, 8), tf.float32)])
        def __call__(self, x):
            i = tf.constant(0)
            _, y = tf.while_loop(lambda i, v: i < 3,
                                 lambda i, v: (i + 1, v * 1.5 + 0.1), [i, x])
            return tf.cond(tf.reduce_sum(y) > 10.0,
                           lambda: y * 2.0, lambda: y - 1.0)

    m = M()
    blob = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m).convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    g = load_tflite_bytes(blob)
    assert g.subgraphs is not None and len(g.subgraphs) >= 4
    assert {"WHILE", "IF"} <= set(g.op_histogram())
    cm = build_model(g)
    x = np.random.default_rng(0).random((1, 8), np.float32)
    got = np.asarray(cm(x))
    it = tf.lite.Interpreter(model_content=blob)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_dynamic_range_quantized_model_loads(tmp_path):
    """int8-weight (dynamic-range) .tflite files dequantize on load and run
    as float.  TFLite's own kernels quantize activations on the fly, so
    a ~1% relative tolerance applies (our float path is the more precise)."""
    tf = pytest.importorskip("tensorflow")
    inp = tf.keras.Input((16, 16, 8))
    x = tf.keras.layers.Conv2D(32, 3, padding="same", activation="relu")(inp)
    x = tf.keras.layers.Conv2D(16, 3, padding="same")(x)
    model = tf.keras.Model(inp, x)
    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    blob = conv.convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    g = load_tflite_bytes(blob)
    # weights must have been int8 in the file and f32 after load
    assert all(t.data.dtype == np.float32 for t in g.tensors
               if t.is_constant and t.data.ndim == 4)
    m = build_model(g)
    x_in = np.random.default_rng(0).random((1, 16, 16, 8), np.float32)
    got = np.asarray(m(x_in))
    it = tf.lite.Interpreter(model_content=blob)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x_in)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, f"relative error {rel}"


def test_builtin_transpose_conv_odd_dims(tmp_path):
    """Builtin TRANSPOSE_CONV derives geometry from its output_shape input;
    stride-2 on odd spatial dims is the case where the custom-op SAME
    formula would produce the wrong size."""
    tf = pytest.importorskip("tensorflow")
    inp = tf.keras.Input((5, 5, 3))
    y = tf.keras.layers.Conv2DTranspose(4, 2, strides=2, padding="same")(inp)
    y = tf.keras.layers.Conv2DTranspose(2, 3, strides=2, padding="same")(y)
    model = tf.keras.Model(inp, y)
    blob = tf.lite.TFLiteConverter.from_keras_model(model).convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    m = build_model(load_tflite_bytes(blob))
    x = np.random.default_rng(0).random((1, 5, 5, 3), np.float32)
    got = np.asarray(m(x))
    it = tf.lite.Interpreter(model_content=blob)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])
    assert got.shape == ref.shape == (1, 20, 20, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_extended_op_coverage(tmp_path):
    """Space/depth moves, NN-resize, mirror pad, unary math, reducers,
    l2-normalize: converted graphs using the extended op set match TFLite."""
    tf = pytest.importorskip("tensorflow")
    inp = tf.keras.Input((16, 16, 4))
    y = tf.keras.layers.Lambda(lambda x: tf.nn.space_to_depth(x, 2))(inp)
    y = tf.keras.layers.Lambda(lambda x: tf.nn.depth_to_space(x, 2))(y)
    y = tf.keras.layers.Lambda(
        lambda x: tf.image.resize(x, (32, 32), method="nearest"))(y)
    y = tf.keras.layers.Lambda(
        lambda x: tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]], mode="REFLECT"))(y)
    y = tf.keras.layers.Lambda(
        lambda x: tf.abs(x) + tf.sqrt(tf.abs(x) + 1.0) - tf.exp(-x))(y)
    y = tf.keras.layers.Lambda(
        lambda x: tf.reduce_sum(x, axis=-1, keepdims=True))(y)
    y = tf.keras.layers.Lambda(lambda x: tf.nn.l2_normalize(x, axis=-1))(y)
    model = tf.keras.Model(inp, y)
    blob = tf.lite.TFLiteConverter.from_keras_model(model).convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    m = build_model(load_tflite_bytes(blob))
    x = np.random.default_rng(0).random((1, 16, 16, 4), np.float32)
    got = np.asarray(m(x))

    it = tf.lite.Interpreter(model_content=blob)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_loopback_selftest_harness(tmp_path):
    out = str(tmp_path / "pattern.yuv")
    r = subprocess.run(
        [sys.executable, "tools/loopback_test.py", f"file:{out}", "64x32", "3"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert r.returncode == 0, r.stderr[-400:]
    data = open(out, "rb").read()
    assert len(data) == 3 * 32 * 128
    # moving pattern: frames differ
    f0, f1 = data[:32 * 128], data[32 * 128:2 * 32 * 128]
    assert f0 != f1


def test_cmake_package_config_installs(tmp_path):
    """The consumer config (FindBackscrub equivalent) installs and defines
    the imported targets."""
    build = str(tmp_path / "b")
    prefix = str(tmp_path / "p")
    env = dict(os.environ)
    r = subprocess.run(["cmake", "-S", os.path.join(REPO, "native"), "-B", build,
                        "-G", "Ninja", f"-DCMAKE_INSTALL_PREFIX={prefix}"],
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    r = subprocess.run(["cmake", "--build", build], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    r = subprocess.run(["cmake", "--install", build], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.exists(os.path.join(prefix, "include", "backscrub.h"))
    assert os.path.exists(os.path.join(prefix, "lib", "cmake", "BackscrubTpu",
                                       "BackscrubTpuConfig.cmake"))
    # a consumer project can find_package it
    consumer = tmp_path / "consumer"
    consumer.mkdir()
    (consumer / "CMakeLists.txt").write_text(
        "cmake_minimum_required(VERSION 3.16)\nproject(c CXX)\n"
        "find_package(BackscrubTpu REQUIRED)\n"
        "get_target_property(loc BackscrubTpu::bsio IMPORTED_LOCATION)\n"
        "message(STATUS \"bsio at ${loc}\")\n")
    r = subprocess.run(["cmake", "-S", str(consumer), "-B", str(consumer / "b"),
                        f"-DBackscrubTpu_DIR={prefix}/lib/cmake/BackscrubTpu"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    assert "bsio at" in r.stdout


def _tflite_golden(blob, x):
    import tensorflow as tf
    it = tf.lite.Interpreter(model_content=blob)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x)
    it.invoke()
    return it.get_tensor(it.get_output_details()[0]["index"])


def test_space_to_batch_roundtrip():
    """SPACE_TO_BATCH_ND / BATCH_TO_SPACE_ND — TF's lowering of atrous
    (dilated) convolutions in DeepLabv3+/Xception exports."""
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec((1, 8, 10, 4), tf.float32)])
        def __call__(self, x):
            y = tf.space_to_batch_nd(x, [2, 2], [[1, 1], [2, 0]])
            y = tf.nn.relu(y) * 0.5
            return tf.batch_to_space(y, [2, 2], [[1, 1], [2, 0]])

    m = M()
    blob = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m).convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    g = load_tflite_bytes(blob)
    hist = g.op_histogram()
    assert "SPACE_TO_BATCH_ND" in hist and "BATCH_TO_SPACE_ND" in hist
    cm = build_model(g)
    x = np.random.default_rng(0).random((1, 8, 10, 4), np.float32)
    np.testing.assert_allclose(np.asarray(cm(x)), _tflite_golden(blob, x),
                               atol=1e-6, rtol=1e-6)


def test_math_op_batch_two():
    """BATCH_MATMUL, FLOOR_DIV/MOD, ARG_MIN+ONE_HOT, REDUCE_MIN/PROD,
    CUMSUM(exclusive,reverse), LOG_SOFTMAX, FILL vs TFLite."""
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec((2, 6, 8), tf.float32)])
        def __call__(self, x):
            bm = tf.matmul(x, x, transpose_b=True) @ x          # adj_y path
            fd = tf.math.floordiv(x * 5.0, 2.0)
            fm = tf.math.floormod(x * 5.0, -2.0)                # sign-of-divisor
            oh = tf.one_hot(tf.argmin(x, axis=-1, output_type=tf.int32),
                            8, on_value=2.0, off_value=-1.0)
            rm = tf.reduce_min(x, axis=-1, keepdims=True)
            rp = tf.reduce_prod(x * 0.9 + 0.1, axis=1, keepdims=True)
            cs = tf.cumsum(x, axis=-1, exclusive=True, reverse=True)
            ls = tf.nn.log_softmax(x, axis=-1)
            return bm + fd + fm + oh + rm + rp + cs + ls

    m = M()
    blob = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m).convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    g = load_tflite_bytes(blob)
    hist = g.op_histogram()
    for op in ["BATCH_MATMUL", "FLOOR_DIV", "FLOOR_MOD", "ONE_HOT",
               "REDUCE_MIN", "REDUCE_PROD", "CUMSUM", "LOG_SOFTMAX"]:
        assert op in hist, (op, hist)
    cm = build_model(g)
    x = (np.random.default_rng(1).random((2, 6, 8), np.float32) + 0.25)
    np.testing.assert_allclose(np.asarray(cm(x)), _tflite_golden(blob, x),
                               atol=1e-4, rtol=1e-4)


def test_fill_op():
    """FILL with a runtime value (constant fills get folded by the converter)."""
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec((1, 4), tf.float32)])
        def __call__(self, x):
            return tf.fill([1, 3, 4], tf.reduce_max(x))

    m = M()
    blob = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m).convert()
    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    g = load_tflite_bytes(blob)
    assert "FILL" in g.op_histogram(), g.op_histogram()
    cm = build_model(g)
    x = np.random.default_rng(2).random((1, 4), np.float32)
    np.testing.assert_allclose(np.asarray(cm(x)), _tflite_golden(blob, x),
                               atol=1e-6, rtol=1e-6)


def test_unet_style_model_golden():
    """A classic U-Net topology (strided conv encoder, Conv2DTranspose
    decoder, skip concatenations, sigmoid head) — the shape most real
    bring-your-own segmentation models take — loads and matches TFLite."""
    tf = pytest.importorskip("tensorflow")
    inp = tf.keras.Input((32, 32, 3))
    e1 = tf.keras.layers.Conv2D(8, 3, padding="same", activation="relu")(inp)
    e2 = tf.keras.layers.Conv2D(16, 3, strides=2, padding="same",
                                activation="relu")(e1)
    e3 = tf.keras.layers.Conv2D(32, 3, strides=2, padding="same",
                                activation="relu")(e2)
    d2 = tf.keras.layers.Conv2DTranspose(16, 3, strides=2, padding="same",
                                         activation="relu")(e3)
    d2 = tf.keras.layers.Concatenate()([d2, e2])
    d1 = tf.keras.layers.Conv2DTranspose(8, 3, strides=2, padding="same",
                                         activation="relu")(d2)
    d1 = tf.keras.layers.Concatenate()([d1, e1])
    out = tf.keras.layers.Conv2D(1, 1, activation="sigmoid")(d1)
    model = tf.keras.Model(inp, out)
    blob = tf.lite.TFLiteConverter.from_keras_model(model).convert()

    sys.path.insert(0, REPO)
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    from backscrub_tpu.graph.executor import build_model
    g = load_tflite_bytes(blob)
    assert "TRANSPOSE_CONV" in g.op_histogram()
    assert "CONCATENATION" in g.op_histogram()
    cm = build_model(g)
    x = np.random.default_rng(7).random((1, 32, 32, 3), np.float32)
    np.testing.assert_allclose(np.asarray(cm(x)), _tflite_golden(blob, x),
                               atol=1e-5, rtol=1e-5)
