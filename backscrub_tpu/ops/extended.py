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
    idx = ctx.maybe_static(node.inputs[1])
    idx = jnp.asarray(idx) if idx is not None else ctx.get(node.inputs[1])
    axis = node.options.get("axis", 0)
    ctx.set(node.outputs[0], jnp.take(x, idx, axis=axis))


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


@register("FLOOR_DIV")
def floor_div(ctx, node):
    ctx.set(node.outputs[0], jnp.floor_divide(ctx.get(node.inputs[0]),
                                              ctx.get(node.inputs[1])))


@register("FLOOR_MOD")
def floor_mod(ctx, node):
    # TF FloorMod: result has the divisor's sign (Python % semantics) = jnp.mod
    ctx.set(node.outputs[0], jnp.mod(ctx.get(node.inputs[0]),
                                     ctx.get(node.inputs[1])))


@register("REDUCE_MIN")
def reduce_min(ctx, node):
    x = ctx.get(node.inputs[0])
    axes = tuple(int(a) for a in ctx.const_value(node.inputs[1]).reshape(-1))
    ctx.set(node.outputs[0], jnp.min(x, axis=axes,
                                     keepdims=node.options.get("keep_dims", False)))


@register("REDUCE_PROD")
def reduce_prod(ctx, node):
    x = ctx.get(node.inputs[0])
    axes = tuple(int(a) for a in ctx.const_value(node.inputs[1]).reshape(-1))
    ctx.set(node.outputs[0], jnp.prod(x, axis=axes,
                                      keepdims=node.options.get("keep_dims", False)))


@register("ARG_MIN")
def arg_min(ctx, node):
    x = ctx.get(node.inputs[0])
    axis = int(ctx.const_value(node.inputs[1]).reshape(-1)[0])
    out_t = ctx.graph.tensor(node.outputs[0])
    ctx.set(node.outputs[0], jnp.argmin(x, axis=axis).astype(out_t.dtype))


@register("LOG_SOFTMAX")
def log_softmax(ctx, node):
    ctx.set(node.outputs[0], jax.nn.log_softmax(ctx.get(node.inputs[0]), axis=-1))


@register("BATCH_MATMUL")
def batch_matmul(ctx, node):
    x = ctx.get(node.inputs[0])
    y = ctx.get(node.inputs[1])
    if node.options.get("adj_x", False):
        x = jnp.swapaxes(x, -1, -2)
    if node.options.get("adj_y", False):
        y = jnp.swapaxes(y, -1, -2)
    ctx.set(node.outputs[0], jnp.matmul(x, y))


@register("FILL")
def fill(ctx, node):
    dims = ctx.const_value(node.inputs[0]).reshape(-1).astype(int)
    val = ctx.get(node.inputs[1])
    out_t = ctx.graph.tensor(node.outputs[0])
    ctx.set(node.outputs[0],
            jnp.full(tuple(dims), val, dtype=out_t.dtype))


@register("ZEROS_LIKE")
def zeros_like(ctx, node):
    ctx.set(node.outputs[0], jnp.zeros_like(ctx.get(node.inputs[0])))


@register("ONE_HOT")
def one_hot(ctx, node):
    idx = ctx.get(node.inputs[0])
    depth = int(ctx.const_value(node.inputs[1]).reshape(-1)[0])
    on_v = ctx.get(node.inputs[2])
    off_v = ctx.get(node.inputs[3])
    axis = node.options.get("axis", -1)
    hot = jax.nn.one_hot(idx, depth, axis=axis, dtype=jnp.float32)
    ctx.set(node.outputs[0], (hot * on_v + (1.0 - hot) * off_v
                              ).astype(ctx.graph.tensor(node.outputs[0]).dtype))


@register("CUMSUM")
def cumsum(ctx, node):
    x = ctx.get(node.inputs[0])
    axis = int(ctx.const_value(node.inputs[1]).reshape(-1)[0])
    y = x
    if node.options.get("reverse", False):
        y = jnp.flip(y, axis=axis)
    y = jnp.cumsum(y, axis=axis)
    if node.options.get("exclusive", False):
        pad = [(0, 0)] * y.ndim
        pad[axis] = (1, 0)
        y = jnp.pad(y, pad)[tuple(
            slice(0, -1) if i == (axis % y.ndim) else slice(None)
            for i in range(y.ndim))]
    if node.options.get("reverse", False):
        y = jnp.flip(y, axis=axis)
    ctx.set(node.outputs[0], y)


# --- SpaceToBatchND / BatchToSpaceND: how TF lowers dilated (atrous) convs
# for exports like DeepLabv3+/Xception — conv with rate r becomes
# SPACE_TO_BATCH_ND(r) -> CONV_2D(stride 1) -> BATCH_TO_SPACE_ND(r).


@register("SPACE_TO_BATCH_ND")
def space_to_batch_nd(ctx, node):
    x = ctx.get(node.inputs[0])
    block = ctx.const_value(node.inputs[1]).reshape(-1).astype(int)
    pads = ctx.const_value(node.inputs[2]).astype(int)
    bh, bw = int(block[0]), int(block[1])
    n, h, w, c = x.shape
    x = jnp.pad(x, [(0, 0), tuple(pads[0]), tuple(pads[1]), (0, 0)])
    h2, w2 = h + pads[0].sum(), w + pads[1].sum()
    y = x.reshape(n, h2 // bh, bh, w2 // bw, bw, c)
    y = y.transpose(2, 4, 0, 1, 3, 5)  # (bh, bw, n, h2/bh, w2/bw, c)
    ctx.set(node.outputs[0], y.reshape(bh * bw * n, h2 // bh, w2 // bw, c))


@register("BATCH_TO_SPACE_ND")
def batch_to_space_nd(ctx, node):
    x = ctx.get(node.inputs[0])
    block = ctx.const_value(node.inputs[1]).reshape(-1).astype(int)
    crops = ctx.const_value(node.inputs[2]).astype(int)
    bh, bw = int(block[0]), int(block[1])
    nb, h, w, c = x.shape
    n = nb // (bh * bw)
    y = x.reshape(bh, bw, n, h, w, c).transpose(2, 3, 0, 4, 1, 5)
    y = y.reshape(n, h * bh, w * bw, c)
    (ct, cb), (cl, cr) = crops
    ctx.set(node.outputs[0],
            y[:, int(ct):h * bh - int(cb), int(cl):w * bw - int(cr), :])
