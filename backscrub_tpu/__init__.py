"""backscrub-tpu: TPU-native background replacement framework.

Rebuild of backscrub's capabilities (virtual-webcam person segmentation +
background replacement) designed for TPU from the ground up: .tflite models
compile to single XLA programs, the whole per-frame pipeline is one fused
device dispatch, and scaling happens via a (data, model) device mesh.

Public surface:
- load_model / CompiledModel       (graph executor)
- MaskGen, bs_maskgen_* aliases    (reference lib API parity)
- FramePipeline, PipelineConfig    (whole-frame program)
- BackgroundSource, sources/sinks  (host I/O)
- Trainer                          (fine-tuning on meshes)
"""

import os

__version__ = "0.1.0"


def _apply_platform_override():
    """Honor BACKSCRUB_TPU_PLATFORM=cpu|tpu even when a sitecustomize has
    already imported jax and pinned a platform (env vars like JAX_PLATFORMS
    are read at jax import time, which may predate this process's control —
    notably inside the embedded interpreter of native/bs_capi.cc).  Applied
    post-import, before any backend is instantiated, like tests/conftest."""
    plat = os.environ.get("BACKSCRUB_TPU_PLATFORM")
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
        if plat != "cpu":
            # An accelerator request must survive environments where the
            # chip registers under a different platform name (the tunneled
            # deployment chip is platform "axon", so jax_platforms="tpu"
            # raises "No jellyfish device found").  Probe now and fall back
            # to JAX's automatic choice, which prefers the accelerator.
            try:
                jax.devices()
            except RuntimeError:
                jax.config.update("jax_platforms", None)
    except Exception:  # pragma: no cover - best-effort
        pass


def _enable_compile_cache():
    """Persistent XLA compilation cache: first compile of the 241-node model
    graphs is expensive (especially via remote compile); subsequent processes
    reuse the serialized executable."""
    try:
        import jax
        cache_dir = os.environ.get(
            "BACKSCRUB_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "backscrub_tpu", "xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_apply_platform_override()
_enable_compile_cache()

from .graph.executor import CompiledModel, build_model, load_model  # noqa: E402
from .models.specs import (DEFAULT_MODEL, ModelSpec, resolve_model_path,  # noqa: E402
                           resolve_path, spec_for_model)
from .pipeline.frame import FramePipeline, PipelineConfig  # noqa: E402
from .pipeline.maskgen import (MaskGen, bs_maskgen_delete, bs_maskgen_new,  # noqa: E402
                               bs_maskgen_process, bs_tensorflow_version)
from .runtime.serving import ServingLoop  # noqa: E402

__all__ = [
    "CompiledModel", "build_model", "load_model",
    "ModelSpec", "spec_for_model", "resolve_model_path", "resolve_path",
    "DEFAULT_MODEL",
    "FramePipeline", "PipelineConfig",
    "MaskGen", "bs_maskgen_new", "bs_maskgen_process", "bs_maskgen_delete",
    "bs_tensorflow_version", "ServingLoop",
    "__version__",
]
