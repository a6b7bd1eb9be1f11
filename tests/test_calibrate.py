"""Activation-range calibration tests."""

import numpy as np
import pytest

from backscrub_tpu.graph.executor import load_model
from backscrub_tpu.quant.calibrate import calibrate, report

from conftest import model_path


def test_calibrate_records_ranges(rng):
    m = load_model(model_path("segm_lite_v681.tflite"))
    samples = [rng.random(m.input_shape, np.float32) for _ in range(2)]
    ranges = calibrate(m.graph, m.params, samples)
    assert len(ranges) > 100  # every activation in the 241-node graph
    # ranges aggregate over samples: input tensor covers [0,1)-ish
    in_r = ranges[m.graph.inputs[0]]
    assert 0.0 <= in_r.lo < 0.05 and 0.95 < in_r.hi <= 1.0
    # output logits recorded
    out_r = ranges[m.graph.outputs[0]]
    assert out_r.hi > out_r.lo
    txt = report(ranges)
    assert "activations calibrated" in txt


def test_calibrate_monotone_aggregation(rng):
    m = load_model(model_path("segm_lite_v681.tflite"))
    a = [np.zeros(m.input_shape, np.float32)]
    b = [np.ones(m.input_shape, np.float32)]
    r_a = calibrate(m.graph, m.params, a)
    r_ab = calibrate(m.graph, m.params, a + b)
    k = m.graph.inputs[0]
    assert r_ab[k].hi >= r_a[k].hi
    assert r_ab[k].lo <= r_a[k].lo
