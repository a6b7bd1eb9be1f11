"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(mesh/pjit/shard_map paths) is exercised without TPU hardware, per the
project build rules.  Numeric golden tests vs TFLite also want CPU: exact
f32 convolutions.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# container's mounted reference assets as an explicit extra search root
# (inherited by CLI/native subprocess tests; library code never hardcodes it)
os.environ.setdefault("BACKSCRUB_TPU_MODELS", "/root/reference/models")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may have imported jax already (pinning the
# TPU platform); override post-import, before any backend is instantiated.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib
import numpy as np
import pytest

MODELS_DIR = None
for cand in [
    pathlib.Path(__file__).resolve().parent.parent / "models",
    pathlib.Path("/root/reference/models"),
]:
    if cand.is_dir() and list(cand.glob("*.tflite")):
        MODELS_DIR = cand
        break

from backscrub_tpu.models.specs import BUNDLED_MODELS

ALL_MODELS = list(BUNDLED_MODELS)


def model_path(name: str) -> str:
    if MODELS_DIR is None:
        pytest.skip("no .tflite model assets available")
    p = MODELS_DIR / name
    if not p.exists():
        pytest.skip(f"model {name} not available")
    return str(p)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def tflite_invoke(path: str, x: np.ndarray) -> np.ndarray:
    """Run TFLite CPU as the golden reference (SURVEY.md §4)."""
    import tensorflow as tf
    it = tf.lite.Interpreter(model_path=path)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x.astype(np.float32))
    it.invoke()
    return it.get_tensor(it.get_output_details()[0]["index"])


def _assets():
    """Repo-owned synthetic assets (tools/gen_assets.py): the suite no
    longer depends on the mounted reference's backgrounds/ directory."""
    import sys
    tools = str(pathlib.Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from gen_assets import ensure_assets
    return ensure_assets()


def portrait_path() -> str:
    """1280x720 synthetic head-and-shoulders portrait all five models
    segment as a person (replaces reference screenshot.jpg in tests)."""
    return _assets()[0]


def background_video_path() -> str:
    """Short animated background video (replaces retrowave.webm)."""
    return _assets()[1]


def background_image_path() -> str:
    """Still background image (replaces background.png)."""
    return _assets()[2]
