"""Device-mesh parallelism for multi-stream serving and training.

The reference is single-machine, single-stream (SURVEY.md §2.4 — its only
concurrency is a 3-thread pipeline).  The TPU-native scaling story is
different: a *batch of camera streams* sharded across chips over ICI.

Mesh axes:
- ``data``  — batch/stream parallelism: each chip serves a slice of streams.
- ``model`` — tensor parallelism: conv output channels (HWIO "O" dim) and
  the matching biases are sharded; XLA inserts all-gathers/reduce-scatters
  where layers change sharding.

Spatial partitioning (sp) of the image H axis is exposed for training large
inputs; XLA SPMD inserts halo exchanges for convolutions automatically.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              model: Optional[int] = None) -> Mesh:
    """Create a (data, model) mesh over the first n devices.

    Default split: largest power-of-two model axis <= 2 (conv channel counts
    in these nets are small), rest on data.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is not None and model is not None:
        pass
    elif data is not None:
        if n % data:
            raise ValueError(f"data={data} does not divide {n} devices")
        model = n // data
    elif model is not None:
        if n % model:
            raise ValueError(f"model={model} does not divide {n} devices")
        data = n // model
    else:
        model = 2 if n % 2 == 0 and n > 1 else 1
        data = n // model
    grid = np.array(devs[:data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def param_sharding_spec(name: str, arr, mesh: Mesh) -> P:
    """Sharding rule for executor params (keys "t<idx>", layouts per ops/conv.py):

    - conv kernels HWIO: shard O over "model" when divisible
    - biases / 1-D (O,): shard over "model" when divisible
    - FC kernels (K, O): shard O over "model"
    - everything else replicated
    """
    msize = mesh.shape["model"]
    if msize == 1:
        return P()
    shape = arr.shape
    if len(shape) >= 1 and shape[-1] % msize == 0 and shape[-1] >= msize * 8:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(params: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place params on the mesh with tensor-parallel shardings."""
    out = {}
    for k, v in params.items():
        out[k] = jax.device_put(v, NamedSharding(mesh, param_sharding_spec(k, v, mesh)))
    return out


def stream_batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading stream/batch axis over "data"."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


class MultiStreamRunner:
    """Serve a fixed batch of camera streams across a mesh.

    Wraps a :class:`CompiledModel` (or any ``fn(params, x)``) so a stream
    batch (S, H, W, C) is processed with S sharded over the ``data`` axis
    and weights tensor-parallel over ``model``.  This is the TPU-native
    replacement for running many reference processes side by side.
    """

    def __init__(self, fn, params, mesh: Mesh):
        self.mesh = mesh
        self.params = shard_params(params, mesh)
        self._fn = jax.jit(
            fn,
            in_shardings=(
                {k: NamedSharding(mesh, param_sharding_spec(k, v, mesh))
                 for k, v in params.items()},
                stream_batch_sharding(mesh),
            ),
        )

    def __call__(self, stream_batch):
        x = jax.device_put(jnp.asarray(stream_batch), stream_batch_sharding(self.mesh))
        return self._fn(self.params, x)
