"""Pooling lowerings: AVERAGE_POOL_2D, MAX_POOL_2D, MEAN.

TFLite SAME-padded average pooling divides by the number of *valid* window
elements (padding excluded); we reproduce that with a ones-count
reduce_window when padding actually occurs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .common import apply_activation, tflite_same_padding
from .registry import register


@register("AVERAGE_POOL_2D")
def average_pool(ctx, node):
    x = ctx.get(node.inputs[0])
    o = node.options
    fh, fw = o["filter_h"], o["filter_w"]
    sh, sw = o["stride_h"], o["stride_w"]
    # Global pooling (SE blocks in the Meet/MLKit models, DeepLab ASPP):
    # a plain mean — differentiable and trivially fused.
    if o["padding"] == "VALID" and (fh, fw) == (x.shape[1], x.shape[2]):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        ctx.set(node.outputs[0], apply_activation(y, o.get("activation")))
        return
    # General case: depthwise conv with a uniform kernel (keeps autodiff and
    # the MXU path).  TFLite SAME average pooling divides by the count of
    # valid (unpadded) elements; divide by a ones-image pooled the same way.
    c = x.shape[-1]
    if o["padding"] == "VALID":
        pads = [(0, 0), (0, 0)]
    else:
        pads = [tflite_same_padding(x.shape[1], fh, sh),
                tflite_same_padding(x.shape[2], fw, sw)]
    kern = jnp.ones((fh, fw, 1, c), x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    summed = lax.conv_general_dilated(x, kern, (sh, sw), pads,
                                      dimension_numbers=dn, feature_group_count=c)
    if any(lo or hi for lo, hi in pads):
        ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
        count = lax.conv_general_dilated(ones, jnp.ones((fh, fw, 1, 1), x.dtype),
                                         (sh, sw), pads, dimension_numbers=dn)
        y = summed / count
    else:
        y = summed / jnp.asarray(fh * fw, x.dtype)  # keep bf16 activations bf16
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
