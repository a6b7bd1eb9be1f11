"""End-to-end golden parity: JAX executor vs TFLite CPU on all five models.

This is the acceptance gate from SURVEY.md §7 step 3 and the BASELINE.json
metric (mask IoU >= 0.99); at the tensor level we hold a much tighter line
(1e-3 absolute) than the IoU budget requires.
"""

import numpy as np
import pytest

from backscrub_tpu.graph.executor import load_model

from conftest import ALL_MODELS, model_path, tflite_invoke


@pytest.mark.parametrize("name", ALL_MODELS)
def test_model_matches_tflite(name, rng):
    path = model_path(name)
    m = load_model(path)
    x = rng.random(m.input_shape, dtype=np.float32)
    y = np.asarray(m(x))
    ref = tflite_invoke(path, x)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=1e-3)


def test_batched_execution(rng):
    """The executor is batch-polymorphic even though TFLite graphs pin N=1."""
    path = model_path("segm_lite_v681.tflite")
    m = load_model(path)
    xb = rng.random((4,) + m.input_shape[1:], dtype=np.float32)
    yb = np.asarray(m(xb))
    assert yb.shape == (4,) + m.output_shape[1:]
    y0 = np.asarray(m(xb[:1]))
    np.testing.assert_allclose(yb[:1], y0, atol=1e-4, rtol=1e-4)
