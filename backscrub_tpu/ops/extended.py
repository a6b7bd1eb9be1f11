"""Extended op coverage beyond the five bundled models.

Cheap, commonly-emitted TFLite ops so arbitrary converted segmentation /
vision nets load: casts, unary math, reducers, nearest-neighbor resize,
mirror pad, space/depth moves, gathers.  All lower to single jnp/lax calls
that XLA fuses; nothing here is performance-sensitive by itself.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .registry import register


def _unary(ctx, node, fn):
    ctx.set(node.outputs[0], fn(ctx.get(node.inputs[0])))


for name, fn in {
    "ABS": jnp.abs, "NEG": jnp.negative, "EXP": jnp.exp, "LOG": jnp.log,
    "SQRT": jnp.sqrt, "RSQRT": jax.lax.rsqrt, "SQUARE": jnp.square,
    "FLOOR": jnp.floor, "CEIL": jnp.ceil, "ROUND": jnp.round,
    "SIN": jnp.sin, "COS": jnp.cos, "ELU": jax.nn.elu, "GELU": jax.nn.gelu,
}.items():
    register(name)(lambda ctx, node, _f=fn: _unary(ctx, node, _f))


@register("POW")
def pow_op(ctx, node):
    ctx.set(node.outputs[0], jnp.power(ctx.get(node.inputs[0]),
                                       ctx.get(node.inputs[1])))


@register("SQUARED_DIFFERENCE")
def squared_difference(ctx, node):
    d = ctx.get(node.inputs[0]) - ctx.get(node.inputs[1])
    ctx.set(node.outputs[0], d * d)


@register("CAST")
def cast(ctx, node):
    x = ctx.get(node.inputs[0])
    out_t = ctx.graph.tensor(node.outputs[0])
    ctx.set(node.outputs[0], x.astype(out_t.dtype))


@register("SUM")
def sum_op(ctx, node):
    x = ctx.get(node.inputs[0])
    axes = tuple(int(a) for a in ctx.const_value(node.inputs[1]).reshape(-1))
    ctx.set(node.outputs[0], jnp.sum(x, axis=axes,
                                     keepdims=node.options.get("keep_dims", False)))


@register("REDUCE_MAX")
def reduce_max(ctx, node):
    x = ctx.get(node.inputs[0])
    axes = tuple(int(a) for a in ctx.const_value(node.inputs[1]).reshape(-1))
    ctx.set(node.outputs[0], jnp.max(x, axis=axes,
                                     keepdims=node.options.get("keep_dims", False)))


def _nn_indices(in_size: int, out_size: int, align_corners: bool,
                half_pixel_centers: bool) -> np.ndarray:
    """TFLite ResizeNearestNeighbor source-index mapping (resize_nearest_neighbor.cc):
    - legacy: floor(dst * in/out)
    - align_corners: round(dst * (in-1)/(out-1))
    - half_pixel_centers: floor((dst + 0.5) * in/out)
    """
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        idx = np.rint(dst * (in_size - 1) / (out_size - 1))
    elif half_pixel_centers:
        idx = np.floor((dst + 0.5) * (in_size / out_size))
    else:
        idx = np.floor(dst * (in_size / out_size))
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


@register("RESIZE_NEAREST_NEIGHBOR")
def resize_nearest(ctx, node):
    x = ctx.get(node.inputs[0])
    size = ctx.const_value(node.inputs[1]).reshape(-1)
    oh, ow = int(size[0]), int(size[1])
    o = node.options
    ac = o.get("align_corners", False)
    hpc = o.get("half_pixel_centers", False)
    rows = _nn_indices(x.shape[1], oh, ac, hpc)
    cols = _nn_indices(x.shape[2], ow, ac, hpc)
    ctx.set(node.outputs[0], x[:, rows][:, :, cols])


@register("MIRROR_PAD")
def mirror_pad(ctx, node):
    x = ctx.get(node.inputs[0])
    pads = ctx.const_value(node.inputs[1])
    mode = "reflect" if node.options.get("mode", 0) == 0 else "symmetric"
    ctx.set(node.outputs[0], jnp.pad(x, [(int(a), int(b)) for a, b in pads],
                                     mode=mode))


@register("PADV2")
def padv2(ctx, node):
    x = ctx.get(node.inputs[0])
    pads = ctx.const_value(node.inputs[1])
    cval = float(ctx.const_value(node.inputs[2]).reshape(-1)[0])
    ctx.set(node.outputs[0], jnp.pad(x, [(int(a), int(b)) for a, b in pads],
                                     constant_values=cval))


@register("SPACE_TO_DEPTH")
def space_to_depth(ctx, node):
    x = ctx.get(node.inputs[0])
    b = node.options.get("block_size", 2)
    n, h, w, c = x.shape
    y = x.reshape(n, h // b, b, w // b, b, c).transpose(0, 1, 3, 2, 4, 5)
    ctx.set(node.outputs[0], y.reshape(n, h // b, w // b, b * b * c))


@register("DEPTH_TO_SPACE")
def depth_to_space(ctx, node):
    x = ctx.get(node.inputs[0])
    b = node.options.get("block_size", 2)
    n, h, w, c = x.shape
    y = x.reshape(n, h, w, b, b, c // (b * b)).transpose(0, 1, 3, 2, 4, 5)
    ctx.set(node.outputs[0], y.reshape(n, h * b, w * b, c // (b * b)))


@register("GATHER")
def gather(ctx, node):
    x = ctx.get(node.inputs[0])
    idx = ctx.const_value(node.inputs[1])
    axis = node.options.get("axis", 0)
    ctx.set(node.outputs[0], jnp.take(x, jnp.asarray(idx), axis=axis))


@register("TILE")
def tile(ctx, node):
    x = ctx.get(node.inputs[0])
    reps = ctx.const_value(node.inputs[1]).reshape(-1).astype(int)
    ctx.set(node.outputs[0], jnp.tile(x, tuple(reps)))


@register("L2_NORMALIZATION")
def l2_normalization(ctx, node):
    x = ctx.get(node.inputs[0])
    ctx.set(node.outputs[0], x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12))
