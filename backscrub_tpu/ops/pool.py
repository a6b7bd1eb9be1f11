"""Pooling lowerings: AVERAGE_POOL_2D, MAX_POOL_2D, MEAN.

TFLite SAME-padded average pooling divides by the number of *valid* window
elements (padding excluded); we reproduce that with a ones-count
reduce_window when padding actually occurs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .common import apply_activation, tflite_same_padding
from .registry import register


@register("AVERAGE_POOL_2D")
def average_pool(ctx, node):
    x = ctx.get(node.inputs[0])
    o = node.options
    window = (1, o["filter_h"], o["filter_w"], 1)
    strides = (1, o["stride_h"], o["stride_w"], 1)
    if o["padding"] == "VALID":
        pads = [(0, 0)] * 4
    else:
        ph = tflite_same_padding(x.shape[1], o["filter_h"], o["stride_h"])
        pw = tflite_same_padding(x.shape[2], o["filter_w"], o["stride_w"])
        pads = [(0, 0), ph, pw, (0, 0)]
    summed = lax.reduce_window(x, jnp.array(0, x.dtype), lax.add, window, strides,
                               [(lo, hi) for lo, hi in pads])
    if any(lo or hi for lo, hi in pads):
        ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
        count = lax.reduce_window(ones, jnp.array(0, x.dtype), lax.add, window, strides,
                                  [(lo, hi) for lo, hi in pads])
        y = summed / count
    else:
        y = summed / np.prod([o["filter_h"], o["filter_w"]], dtype=np.float32)
    ctx.set(node.outputs[0], apply_activation(y, o.get("activation")))


@register("MAX_POOL_2D")
def max_pool(ctx, node):
    x = ctx.get(node.inputs[0])
    o = node.options
    window = (1, o["filter_h"], o["filter_w"], 1)
    strides = (1, o["stride_h"], o["stride_w"], 1)
    if o["padding"] == "VALID":
        pads = [(0, 0)] * 4
    else:
        ph = tflite_same_padding(x.shape[1], o["filter_h"], o["stride_h"])
        pw = tflite_same_padding(x.shape[2], o["filter_w"], o["stride_w"])
        pads = [(0, 0), ph, pw, (0, 0)]
    neg_inf = jnp.array(-jnp.inf, x.dtype)
    y = lax.reduce_window(x, neg_inf, lax.max, window, strides, pads)
    ctx.set(node.outputs[0], apply_activation(y, o.get("activation")))


@register("MEAN")
def mean(ctx, node):
    x = ctx.get(node.inputs[0])
    axes = ctx.const_value(node.inputs[1]).reshape(-1).tolist()
    keep = node.options.get("keep_dims", False)
    ctx.set(node.outputs[0], jnp.mean(x, axis=tuple(int(a) for a in axes), keepdims=keep))
