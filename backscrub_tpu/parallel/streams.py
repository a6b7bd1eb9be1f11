"""Multi-stream frame pipeline: N camera streams, one mesh, one dispatch.

The reference serves exactly one camera per process; the TPU-native scaling
unit is a *stream batch* (SURVEY.md §2.4): frames from S streams stack into
(S, H, W, 3), shard over the mesh ``data`` axis, and run the full fused
frame program (mask + composite + YUYV) in a single dispatch.  Per-stream
temporal EMA state is carried as an (S, oh, ow) donated device buffer with
the same sharding, so streams never mix.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.frame import FramePipeline, PipelineConfig
from .mesh import shard_params


class MultiStreamPipeline:
    """Run the whole-frame program over a sharded stream batch.

    ``step(frames (S,H,W,3) u8, backgrounds (S,H,W,3) u8)`` ->
    (yuyv (S,H,2W) u8, masks (S,H,W) u8); S must be a multiple of the
    ``data`` axis size.
    """

    def __init__(self, model: str, config: PipelineConfig, n_streams: int,
                 mesh: Mesh, *, compute_dtype=jnp.float32,
                 precision=None):
        if n_streams % mesh.shape["data"] != 0:
            raise ValueError(
                f"n_streams={n_streams} not divisible by data axis "
                f"{mesh.shape['data']}")
        self.mesh = mesh
        self.n_streams = n_streams
        self.pipe = FramePipeline(model, config, compute_dtype=compute_dtype,
                                  precision=precision)
        self._batch_sharding = NamedSharding(mesh, P("data"))
        self.ema = jax.device_put(
            jnp.full((n_streams,) + self.pipe.maskgen.ema_shape, 255,
                     jnp.uint8), self._batch_sharding)
        self.params = shard_params(self.pipe.maskgen.model.params, mesh)
        self._green_batch = None
        # batched compose: the pipeline stages are written with ellipsis
        # indexing, so the same compose fn handles the leading stream axis
        raw = self.pipe._make_step("explicit", config.flip_horizontal,
                                   config.flip_vertical, True)
        self._step = jax.jit(raw, donate_argnums=(3,))

    def step(self, frames, backgrounds: Optional[np.ndarray] = None):
        S = self.n_streams
        if self.pipe.cfg.input_format == "mjpg":
            # (coefs per component, per-stream qtabs) — each leaf is
            # stream-batched on axis 0 and shards over the data axis
            coefs, qtabs = frames
            f = (tuple(jax.device_put(jnp.asarray(c), self._batch_sharding)
                       for c in coefs),
                 jax.device_put(jnp.asarray(qtabs), self._batch_sharding))
        else:
            f = jax.device_put(jnp.asarray(frames), self._batch_sharding)
        if backgrounds is None:
            # green fallback; backgrounds are always BGR (S,H,W,3) even when
            # the camera frames arrive as raw YUYV bytes; cached on device
            if self._green_batch is None:
                self._green_batch = jax.device_put(
                    jnp.broadcast_to(jnp.asarray(self.pipe.green),
                                     (S,) + self.pipe.green.shape),
                    self._batch_sharding)
            b = self._green_batch
        elif isinstance(backgrounds, jax.Array):
            # already device-resident (e.g. MultiStreamServer's one-time
            # static upload): re-putting with the same sharding is a no-op
            b = jax.device_put(backgrounds, self._batch_sharding)
        else:
            b = jax.device_put(jnp.asarray(np.ascontiguousarray(backgrounds)),
                               self._batch_sharding)
        out, masks, self.ema = self._step(self.params, f, b, self.ema)
        return out, masks

    def reset(self):
        self.ema = jax.device_put(
            jnp.full((self.n_streams,) + self.pipe.maskgen.ema_shape, 255,
                     jnp.uint8), self._batch_sharding)

    def reset_stream(self, s: int):
        """Reset ONE stream's temporal EMA to the all-background init
        (libbackscrub.cc:248 semantics) without touching the others —
        used when a batch slot is re-occupied by a new live stream
        (MultiStreamServer.attach)."""
        self.ema = jax.device_put(self.ema.at[s].set(255),
                                  self._batch_sharding)
