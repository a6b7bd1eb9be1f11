"""Pallas TPU kernels for pipeline stages where XLA fusion falls short.

Currently: the bilateral filter (lib/libbackscrub.cc:297 equivalent).  Its
weights are data-dependent (exp of the local L1 color distance), so XLA
materializes 13 shifted neighbor reads with separate weight tensors; the
Pallas kernel keeps the whole 13-tap stencil in VMEM and accumulates
num/den in registers, one HBM read + one write per pixel.

The kernel operates channels-leading (3, H, W): lanes = W (aligned to 128
for the model input sizes: 160/256/257-pad), sublanes = H rows.  Reflect
padding happens outside (cheap, fused by XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single source of truth for the OpenCV tap set/space weights
from ..pipeline.image import _bilateral_taps as _taps


def _bilateral_kernel(x_ref, out_ref, *, taps, inv2sc, rows, cols):
    # x_ref: (3, rows+4, cols+4) padded block in VMEM; out: (3, rows, cols)
    center = x_ref[:, 2:2 + rows, 2:2 + cols]
    num = jnp.zeros((3, rows, cols), jnp.float32)
    den = jnp.zeros((1, rows, cols), jnp.float32)
    for (di, dj, sw) in taps:
        nb = x_ref[:, 2 + di:2 + di + rows, 2 + dj:2 + dj + cols]
        cdist = jnp.sum(jnp.abs(nb - center), axis=0, keepdims=True)
        w = sw * jnp.exp(inv2sc * cdist * cdist)
        num = num + w * nb
        den = den + w
    out_ref[:, :, :] = num / den


@functools.partial(jax.jit, static_argnames=("sigma_color", "sigma_space"))
def bilateral5_pallas(rgb_f32, sigma_color: float = 100.0,
                      sigma_space: float = 100.0):
    """Pallas bilateral filter, d=5; input (H, W, 3) f32 u8-range values.

    Numerically equivalent to pipeline.image.bilateral5 (same taps, same
    reflect-101 border).
    """
    h, w = rgb_f32.shape[0], rgb_f32.shape[1]
    x = jnp.transpose(rgb_f32, (2, 0, 1))  # (3, H, W)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    taps = _taps(5, sigma_space)
    inv2sc = -0.5 / (sigma_color ** 2)
    out = pl.pallas_call(
        functools.partial(_bilateral_kernel, taps=taps, inv2sc=inv2sc,
                          rows=h, cols=w),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xp)
    return jnp.transpose(out, (1, 2, 0))
