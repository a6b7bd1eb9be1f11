"""Shape-plumbing lowerings: SHAPE, STRIDED_SLICE, PACK, UNPACK, SPLIT,
TRANSPOSE, SLICE, MEAN-adjacent helpers.

The TFLite converter emits SHAPE -> STRIDED_SLICE -> PACK -> RESHAPE
chains for "flatten with dynamic batch" patterns (e.g. Keras MobileNetV3
heads).  Under XLA all shapes are static, so these chains fold at trace
time through ``ctx.static_vals``; the data-path variants fall back to
jnp ops when an input genuinely is a traced tensor.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .registry import register


@register("SHAPE")
def shape_op(ctx, node):
    x = ctx.get(node.inputs[0])
    ctx.set_static(node.outputs[0], np.asarray(x.shape, np.int32))


def _strided_slice_args(ctx, node):
    begin = ctx.const_value(node.inputs[1]).reshape(-1).astype(int)
    end = ctx.const_value(node.inputs[2]).reshape(-1).astype(int)
    strides = ctx.const_value(node.inputs[3]).reshape(-1).astype(int) \
        if len(node.inputs) > 3 and node.inputs[3] >= 0 else np.ones_like(begin)
    o = node.options
    if o.get("ellipsis_mask", 0) or o.get("new_axis_mask", 0):
        raise NotImplementedError(
            "STRIDED_SLICE with ellipsis_mask/new_axis_mask is not supported")
    return begin, end, strides, o.get("begin_mask", 0), o.get("end_mask", 0), \
        o.get("shrink_axis_mask", 0)


def _build_slices(shape, begin, end, strides, bmask, emask, smask):
    idx = []
    for d in range(len(begin)):
        b = None if (bmask >> d) & 1 else int(begin[d])
        e = None if (emask >> d) & 1 else int(end[d])
        s = int(strides[d])
        if (smask >> d) & 1:
            bb = int(begin[d]) % shape[d] if begin[d] < 0 else int(begin[d])
            idx.append(bb)  # integer index: drops the axis
        else:
            idx.append(slice(b, e, s))
    return tuple(idx)


@register("STRIDED_SLICE")
def strided_slice(ctx, node):
    begin, end, strides, bmask, emask, smask = _strided_slice_args(ctx, node)
    static = ctx.maybe_static(node.inputs[0])
    if static is not None:
        sl = _build_slices(static.shape, begin, end, strides, bmask, emask, smask)
        ctx.set_static(node.outputs[0], np.asarray(static[sl]))
        return
    x = ctx.get(node.inputs[0])
    sl = _build_slices(x.shape, begin, end, strides, bmask, emask, smask)
    ctx.set(node.outputs[0], x[sl])


@register("PACK")
def pack(ctx, node):
    axis = node.options.get("axis", 0)
    statics = [ctx.maybe_static(i) for i in node.inputs]
    if all(s is not None for s in statics):
        # scalar elements may arrive as () or (1,) mixes; normalize
        if all(np.asarray(s).size == 1 for s in statics):
            statics = [np.asarray(s).reshape(()) for s in statics]
        ctx.set_static(node.outputs[0], np.stack(statics, axis=axis))
        return
    ctx.set(node.outputs[0], jnp.stack([ctx.get(i) for i in node.inputs], axis=axis))


@register("UNPACK")
def unpack(ctx, node):
    axis = node.options.get("axis", 0)
    x = ctx.get(node.inputs[0])
    parts = jnp.split(x, x.shape[axis], axis=axis)
    for out_idx, p in zip(node.outputs, parts):
        ctx.set(out_idx, jnp.squeeze(p, axis=axis))


@register("SPLIT")
def split(ctx, node):
    # inputs: [axis(const), data]
    axis = int(ctx.const_value(node.inputs[0]).reshape(-1)[0])
    x = ctx.get(node.inputs[1])
    parts = jnp.split(x, len(node.outputs), axis=axis)
    for out_idx, p in zip(node.outputs, parts):
        ctx.set(out_idx, p)


@register("TRANSPOSE")
def transpose(ctx, node):
    x = ctx.get(node.inputs[0])
    perm = ctx.const_value(node.inputs[1]).reshape(-1).astype(int)
    ctx.set(node.outputs[0], jnp.transpose(x, tuple(perm)))


@register("SLICE")
def slice_op(ctx, node):
    x = ctx.get(node.inputs[0])
    begin = ctx.const_value(node.inputs[1]).reshape(-1).astype(int)
    size = ctx.const_value(node.inputs[2]).reshape(-1).astype(int)
    idx = tuple(slice(int(b), None if s == -1 else int(b + s))
                for b, s in zip(begin, size))
    ctx.set(node.outputs[0], x[idx])
