"""Convolution lowerings: CONV_2D, DEPTHWISE_CONV_2D, FULLY_CONNECTED,
TRANSPOSE_CONV, and the MediaPipe custom op Convolution2DTransposeBias.

All convs run NHWC with HWIO kernels — the layout the TPU MXU wants — via
``lax.conv_general_dilated``.  Weight layout transforms (TFLite stores conv
filters OHWI, depthwise filters 1HW(C*M)) happen once at build time in
numpy, so the compiled program sees MXU-ready kernels.

The custom transposed conv reproduces the reference semantics at
``lib/transpose_conv_bias.cc:80-111`` (scatter accumulate, OHWI filter) and
its SAME-padding shape math at ``lib/transpose_conv_bias.cc:171-181``:
``pad_total = max(0, f - (in-1) % s - 1)``, leading side ``pad_total // 2``,
``out = s*(in-1) + f - pad_total``.  Here it is expressed as an
``lhs_dilation`` (fractionally strided) convolution, which XLA maps onto the
MXU instead of a 6-deep scalar loop nest.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .common import apply_activation
from .registry import register

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _conv_precision(ctx):
    return ctx.precision


@register("CONV_2D")
def conv2d(ctx, node):
    x = ctx.get(node.inputs[0])
    o = node.options
    w = ctx.get_const(node.inputs[1],
                      prepare=lambda a: np.transpose(a, (1, 2, 3, 0)),   # OHWI->HWIO
                      inverse=lambda a: np.transpose(a, (3, 0, 1, 2)),
                      variant="hwio")
    dil = (o.get("dilation_h", 1), o.get("dilation_w", 1))
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(o["stride_h"], o["stride_w"]),
        padding=o["padding"],
        rhs_dilation=dil,
        dimension_numbers=_DIMNUMS,
        precision=_conv_precision(ctx),
        preferred_element_type=ctx.acc_dtype,
    )
    if len(node.inputs) > 2 and node.inputs[2] >= 0:
        y = y + ctx.get_const(node.inputs[2])
    y = apply_activation(y, o.get("activation"))
    ctx.set(node.outputs[0], y.astype(x.dtype))


def _dw_shift_dilated(x, w, dil, acc_dtype):
    """Dilated SAME stride-1 depthwise conv as fh*fw shifted multiply-adds.

    Probe-only alternative to the grouped-conv emitter for the atrous DWs
    of deeplab/bodypix (33x33, C>=96: channels fill the lanes, unlike the
    C=16 case where the same formulation measured 1.3 GB/s and was
    rejected — see the note in depthwise_conv2d).  Gated by
    BACKSCRUB_DW_DILATED=shift; tools/probe_dw.py measures it.
    """
    fh, fw = w.shape[0], w.shape[1]
    dh, dw_ = dil
    pt_h, pt_w = (fh - 1) * dh, (fw - 1) * dw_
    lo_h, lo_w = pt_h // 2, pt_w // 2
    H, W = x.shape[1], x.shape[2]
    xp = jnp.pad(x.astype(acc_dtype),
                 ((0, 0), (lo_h, pt_h - lo_h), (lo_w, pt_w - lo_w), (0, 0)))
    acc = None
    for i in range(fh):
        for j in range(fw):
            tap = lax.slice(xp, (0, i * dh, j * dw_, 0),
                            (xp.shape[0], i * dh + H, j * dw_ + W,
                             xp.shape[3]))
            term = tap * w[i, j, 0, :].astype(acc_dtype)
            acc = term if acc is None else acc + term
    return acc


@register("DEPTHWISE_CONV_2D")
def depthwise_conv2d(ctx, node):
    x = ctx.get(node.inputs[0])
    in_ch = x.shape[-1]
    o = node.options
    mult = o.get("depth_multiplier", 1)
    # TFLite filter (1, fh, fw, in_ch*mult) -> HWIO with I=1, O=in_ch*mult,
    # grouped with feature_group_count=in_ch.  Output channel c*mult+m maps to
    # input channel c in both conventions.
    # (A shift-and-accumulate elementwise lowering was measured and
    # rejected: XLA fuses the fh*fw shifted multiply-adds into one fusion
    # that runs at 1.3 GB/s — 92us for the first 48x80x16 DW at B=1 vs
    # <1us on the grouped-conv emitter.  The emitter has its own pathology
    # at batch — the same layer costs 312us/step at B=16 — documented in
    # PERF.md as an XLA emitter issue, not fixable by reformulation here.
    # The DILATED C>=96 case is separately probeable via
    # BACKSCRUB_DW_DILATED=shift: full lanes change the economics —
    # tools/probe_dw.py holds the measurement.)
    w = ctx.get_const(node.inputs[1],
                      prepare=lambda a: np.transpose(a, (1, 2, 0, 3)),  # (fh, fw, 1, C*M)
                      inverse=lambda a: np.transpose(a, (2, 0, 1, 3)),
                      variant="dw")
    dil = (o.get("dilation_h", 1), o.get("dilation_w", 1))
    import os
    if (dil != (1, 1) and mult == 1 and o.get("padding") == "SAME"
            and o["stride_h"] == 1 and o["stride_w"] == 1
            and os.environ.get("BACKSCRUB_DW_DILATED") == "shift"):
        y = _dw_shift_dilated(x, w, dil, ctx.acc_dtype)
    else:
        y = lax.conv_general_dilated(
            x, w,
            window_strides=(o["stride_h"], o["stride_w"]),
            padding=o["padding"],
            rhs_dilation=dil,
            dimension_numbers=_DIMNUMS,
            feature_group_count=in_ch,
            precision=_conv_precision(ctx),
            preferred_element_type=ctx.acc_dtype,
        )
    if len(node.inputs) > 2 and node.inputs[2] >= 0:
        y = y + ctx.get_const(node.inputs[2])
    y = apply_activation(y, o.get("activation"))
    ctx.set(node.outputs[0], y.astype(x.dtype))


@register("FULLY_CONNECTED")
def fully_connected(ctx, node):
    x = ctx.get(node.inputs[0])
    w = ctx.get_const(node.inputs[1],
                      prepare=lambda a: np.transpose(a, (1, 0)),         # (O,K)->(K,O)
                      inverse=lambda a: np.transpose(a, (1, 0)),
                      variant="ko")
    o = node.options
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    y = jnp.dot(x2, w, precision=_conv_precision(ctx), preferred_element_type=ctx.acc_dtype)
    if len(node.inputs) > 2 and node.inputs[2] >= 0:
        y = y + ctx.get_const(node.inputs[2])
    y = apply_activation(y, o.get("activation"))
    out_shape = lead + (w.shape[-1],) if o.get("keep_num_dims", False) else (x2.shape[0], w.shape[-1])
    ctx.set(node.outputs[0], y.reshape(out_shape).astype(x.dtype))


def transpose_conv_shape(in_size: int, filter_size: int, stride: int, padding: str):
    """Output size + (lo, hi) conv padding for the lhs-dilated formulation.

    Matches lib/transpose_conv_bias.cc:171-181 exactly for SAME, and the
    standard ``s*(in-1)+f`` for VALID.
    """
    if padding == "SAME":
        pad_total = max(0, filter_size - (in_size - 1) % stride - 1)
    else:
        pad_total = 0
    out = stride * (in_size - 1) + filter_size - pad_total
    p_lead = pad_total // 2  # scatter-side leading pad (Eval: padding_size/2)
    lo = filter_size - 1 - p_lead
    # solve: dilated_len + lo + hi - f + 1 == out, dilated_len = s*(in-1)+1
    hi = out - (stride * (in_size - 1) + 1) - lo + filter_size - 1
    return out, (lo, hi)


def _conv_pads_for_output(in_size, filter_size, stride, out_size, pad_total):
    """(lo, hi) padding of the lhs-dilated conv realizing a transposed conv
    with the given scatter-side total padding and target output size."""
    p_lead = pad_total // 2
    lo = filter_size - 1 - p_lead
    hi = out_size - (stride * (in_size - 1) + 1) - lo + filter_size - 1
    return lo, hi


def _lower_transpose_conv(ctx, node, x_idx, w_idx, bias_idx, stride_h, stride_w,
                          padding, out_hw=None):
    x = ctx.get(x_idx)
    # OHWI -> flip HW -> HWIO
    w = ctx.get_const(w_idx,
                      prepare=lambda a: np.transpose(a[:, ::-1, ::-1, :], (1, 2, 3, 0)),
                      inverse=lambda a: np.transpose(a, (3, 0, 1, 2))[:, ::-1, ::-1, :],
                      variant="tconv")
    fh, fw = w.shape[0], w.shape[1]
    if out_hw is None:
        # MediaPipe custom-op SAME formula (transpose_conv_bias.cc:171-181)
        _, pad_h = transpose_conv_shape(x.shape[1], fh, stride_h, padding)
        _, pad_w = transpose_conv_shape(x.shape[2], fw, stride_w, padding)
    else:
        # builtin TRANSPOSE_CONV: output shape is given; derive the total
        # scatter padding from it (tflite transpose_conv.cc ComputePadding:
        # pad_total = max(0, (in-1)*s + f - out))
        oh, ow = out_hw
        pt_h = max(0, (x.shape[1] - 1) * stride_h + fh - oh)
        pt_w = max(0, (x.shape[2] - 1) * stride_w + fw - ow)
        pad_h = _conv_pads_for_output(x.shape[1], fh, stride_h, oh, pt_h)
        pad_w = _conv_pads_for_output(x.shape[2], fw, stride_w, ow, pt_w)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride_h, stride_w),
        dimension_numbers=_DIMNUMS,
        precision=_conv_precision(ctx),
        preferred_element_type=ctx.acc_dtype,
    )
    if bias_idx is not None and bias_idx >= 0:
        y = y + ctx.get_const(bias_idx)
    ctx.set(node.outputs[0], y.astype(x.dtype))


@register("Convolution2DTransposeBias")
def conv2d_transpose_bias(ctx, node):
    # inputs: [data, weights, bias]; options parsed from the raw C struct.
    o = node.options
    _lower_transpose_conv(ctx, node, node.inputs[0], node.inputs[1], node.inputs[2],
                          o["stride_h"], o["stride_w"], o.get("padding", "SAME"))


@register("TRANSPOSE_CONV")
def transpose_conv(ctx, node):
    # builtin: inputs = [output_shape(const), weights, data, (bias)]
    o = node.options
    bias = node.inputs[3] if len(node.inputs) > 3 else None
    out_shape = ctx.const_value(node.inputs[0]).reshape(-1)
    _lower_transpose_conv(ctx, node, node.inputs[2], node.inputs[1], bias,
                          o["stride_h"], o["stride_w"], o.get("padding", "SAME"),
                          out_hw=(int(out_shape[1]), int(out_shape[2])))
