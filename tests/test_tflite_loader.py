"""Loader unit tests: tensor/op inventories must match SURVEY.md §2.2."""

import numpy as np
import pytest

from backscrub_tpu.tflite.loader import load_tflite

from conftest import model_path

EXPECTED = {
    # name -> (input shape, output shape, ops that must be present)
    "segm_lite_v681.tflite": ((1, 96, 160, 3), (1, 96, 160, 2),
                              {"CONV_2D", "FULLY_CONNECTED", "HARD_SWISH",
                               "Convolution2DTransposeBias", "DEQUANTIZE"}),
    "segm_full_v679.tflite": ((1, 144, 256, 3), (1, 144, 256, 2),
                              {"CONV_2D", "Convolution2DTransposeBias"}),
    "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite":
        ((1, 256, 256, 3), (1, 256, 256, 1), {"Convolution2DTransposeBias"}),
    "deeplabv3_257_mv_gpu.tflite": ((1, 257, 257, 3), (1, 257, 257, 21),
                                    {"CONV_2D", "DEPTHWISE_CONV_2D",
                                     "AVERAGE_POOL_2D", "RESIZE_BILINEAR"}),
    "body-pix-float-050-8.tflite": ((1, 257, 257, 3), (1, 33, 33, 1),
                                    {"CONV_2D", "DEPTHWISE_CONV_2D"}),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_load_inventory(name):
    in_shape, out_shape, ops = EXPECTED[name]
    g = load_tflite(model_path(name))
    assert tuple(g.tensor(g.inputs[0]).shape) == in_shape
    assert tuple(g.tensor(g.outputs[0]).shape) == out_shape
    hist = g.op_histogram()
    assert ops <= set(hist), f"missing ops: {ops - set(hist)}"


def test_f16_weights_kept_half():
    g = load_tflite(model_path("segm_lite_v681.tflite"))
    halves = [t for t in g.tensors if t.is_constant and t.dtype == np.float16]
    assert len(halves) >= 100  # 110 dequantized weight tensors


def test_loader_rejects_garbage():
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    with pytest.raises(Exception):
        load_tflite_bytes(b"not a flatbuffer at all")
    # truncated real model
    with open(model_path("segm_lite_v681.tflite"), "rb") as f:
        blob = f.read()
    with pytest.raises(Exception):
        load_tflite_bytes(blob[: len(blob) // 3])


def test_custom_op_options_parsed():
    g = load_tflite(model_path("segm_lite_v681.tflite"))
    tcb = [n for n in g.nodes if n.kind == "Convolution2DTransposeBias"]
    assert len(tcb) == 1
    o = tcb[0].options
    assert o["stride_h"] >= 1 and o["stride_w"] >= 1
    assert o["padding"] in ("SAME", "VALID")


def test_loader_fuzz_byte_flips():
    """Seeded byte-flip fuzz: 40 mutated copies of a real model must either
    load or raise a Python exception — never crash the process or hang.
    (The parser is pure Python over flatbuffers; this pins that malformed
    offsets/enums surface as exceptions, not memory errors.)"""
    from backscrub_tpu.tflite.loader import load_tflite_bytes
    with open(model_path("segm_lite_v681.tflite"), "rb") as f:
        blob = bytearray(f.read())
    rng = np.random.default_rng(42)
    outcomes = {"ok": 0, "raised": 0}
    for _ in range(40):
        mutated = bytearray(blob)
        # flip a handful of bytes, biased toward the header/metadata region
        for _ in range(int(rng.integers(1, 6))):
            region = len(mutated) if rng.random() < 0.5 else min(65536, len(mutated))
            idx = int(rng.integers(0, region))
            mutated[idx] ^= int(rng.integers(1, 256))
        try:
            g = load_tflite_bytes(bytes(mutated))
            g.op_histogram()
            outcomes["ok"] += 1
        except Exception:
            outcomes["raised"] += 1
    assert outcomes["ok"] + outcomes["raised"] == 40
