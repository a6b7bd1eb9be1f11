"""Shape/data-movement lowerings: CONCATENATION, RESHAPE, RESIZE_BILINEAR,
SOFTMAX, PAD, SQUEEZE, EXPAND_DIMS, ARG_MAX.

RESIZE_BILINEAR is expressed as two small dense interpolation-matrix
contractions (separable bilinear), computed in numpy at trace time and baked
as constants — on TPU these ride the MXU instead of doing per-pixel gathers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .registry import register


@register("CONCATENATION")
def concatenation(ctx, node):
    from .common import apply_activation
    parts = [ctx.get(i) for i in node.inputs]
    y = jnp.concatenate(parts, axis=node.options.get("axis", -1))
    ctx.set(node.outputs[0], apply_activation(y, node.options.get("activation")))


@register("RESHAPE")
def reshape(ctx, node):
    x = ctx.get(node.inputs[0])
    if "new_shape" in node.options:
        shape = node.options["new_shape"]
    else:
        shape = ctx.const_value(node.inputs[1]).reshape(-1).tolist()
    ctx.set(node.outputs[0], x.reshape([int(s) for s in shape]))


@register("SQUEEZE")
def squeeze(ctx, node):
    x = ctx.get(node.inputs[0])
    dims = node.options.get("squeeze_dims")
    ctx.set(node.outputs[0], jnp.squeeze(x, axis=tuple(dims) if dims else None))


@register("EXPAND_DIMS")
def expand_dims(ctx, node):
    x = ctx.get(node.inputs[0])
    axis = int(ctx.const_value(node.inputs[1]).reshape(-1)[0])
    ctx.set(node.outputs[0], jnp.expand_dims(x, axis))


@register("SOFTMAX")
def softmax(ctx, node):
    import jax
    x = ctx.get(node.inputs[0])
    beta = node.options.get("beta", 1.0)
    ctx.set(node.outputs[0], jax.nn.softmax(x * beta, axis=-1))


@register("PAD")
def pad(ctx, node):
    x = ctx.get(node.inputs[0])
    pads = ctx.const_value(node.inputs[1])
    ctx.set(node.outputs[0], jnp.pad(x, [(int(lo), int(hi)) for lo, hi in pads]))


@register("ARG_MAX")
def arg_max(ctx, node):
    x = ctx.get(node.inputs[0])
    axis = int(ctx.const_value(node.inputs[1]).reshape(-1)[0])
    ctx.set(node.outputs[0], jnp.argmax(x, axis=axis).astype(jnp.int32))


def resize_matrix(in_size: int, out_size: int, align_corners: bool,
                  half_pixel_centers: bool) -> np.ndarray:
    """Dense (out, in) bilinear interpolation matrix, TFLite conventions.

    - legacy (both flags false): src = dst * in/out
    - align_corners:             src = dst * (in-1)/(out-1)
    - half_pixel_centers:        src = (dst + 0.5) * in/out - 0.5
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    elif half_pixel_centers:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    else:
        src = dst * (in_size / out_size)
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), lo] += 1.0 - frac
    mat[np.arange(out_size), hi] += frac
    return mat.astype(np.float32)


def resize_bilinear_nhwc(x, out_h: int, out_w: int, align_corners: bool = False,
                         half_pixel_centers: bool = False, precision=None):
    """Separable bilinear resize of an NHWC tensor via two contractions."""
    ah = jnp.asarray(resize_matrix(x.shape[1], out_h, align_corners, half_pixel_centers),
                     dtype=x.dtype)
    aw = jnp.asarray(resize_matrix(x.shape[2], out_w, align_corners, half_pixel_centers),
                     dtype=x.dtype)
    # (N,H,W,C): rows then cols.  einsum keeps channels minor for the MXU.
    y = jnp.einsum("oh,nhwc->nowc", ah, x, precision=precision)
    y = jnp.einsum("pw,nowc->nopc", aw, y, precision=precision)
    return y


@register("RESIZE_BILINEAR")
def resize_bilinear(ctx, node):
    x = ctx.get(node.inputs[0])
    size = ctx.const_value(node.inputs[1]).reshape(-1)
    o = node.options
    y = resize_bilinear_nhwc(
        x, int(size[0]), int(size[1]),
        align_corners=o.get("align_corners", False),
        half_pixel_centers=o.get("half_pixel_centers", False),
        precision=ctx.precision,
    )
    ctx.set(node.outputs[0], y)
