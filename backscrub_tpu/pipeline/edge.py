"""Fused phase-split edge path: the first conv and the transpose-conv tail
without the lane-padding tax.

Why this exists (PERF.md "Remaining floor"): the model's two edge layers
touch tensors whose minor (channel) dim is 2-3, which XLA lays out in
(8, 128) tiles — every byte moves up to 42x inflated, making a 0.03%-of-
FLOPs layer cost 45% of the CNN (first conv 19.9 us, transpose conv
14.4 us of the 137.6 us 720p step).  Round-3's measured negative results
(PERF.md) showed any *local* reformulation just relocates the relayout;
the fix is to keep a phase-split layout END-TO-END:

- The preprocess resize einsums emit a **quadrant layout** for free: the
  interpolation matrices' rows/cols are permuted so the stride-2 phases
  of the model grid land in contiguous blocks (plus reflect-101 border
  rows for the bilateral and the letterbox embedding, all folded into the
  same matrices).  No deinterleave op ever runs.
- A Pallas kernel consumes the quadrant planes and performs bilateral
  filter + normalize + first conv (3x3 stride 2) + activation in one VMEM
  pass, emitting the NHWC body input directly.
- The body (everything between the edge layers) runs unchanged via the
  standard IR lowerings.
- The 2x2-stride-2 transpose conv collapses to one phase-major K->1 dot
  (``two_channel`` decode only uses ``out0 < out1`` = sign of the channel
  difference, and ``threshold`` models compare sigmoid(out) to a constant
  = out vs logit(threshold)); einsum("pk,hwk->phw") emits the phase-MAJOR
  (2, 2, xh, xw) layout directly, decode + EMA update are elementwise on
  it, and the EMA state is carried in that layout.  The mask-upscale
  matrices are factored over the (phase, index) pairs to consume it, so
  postprocess cost is unchanged.  No tiny-minor-dim tensor survives.

Reference behavior being reproduced: preprocess chain
``lib/libbackscrub.cc:279-298`` (crop/resize/letterbox/BGR2RGB/bilateral/
normalize), decode loops ``:317-361``, upscale+blur ``:366-371``.

Numerics: the resize/bilateral math is the same expression sequence as
``pipeline.image``/``ops.pallas_kernels`` (same taps, same order).  The
first conv has two execution modes: small canvases run the 27-tap
contraction as f32 VPU FMAs (at least as precise as the MXU HIGHEST
6-pass); large canvases (``front_conv_dot``, gated on conv plane area)
run it as an MXU dot at HIGHEST, whose summation order differs from the
FMA loop by the usual reassociation ulps.  That, and the tail's
channel-difference dot (vs computing both channels separately), can flip
decode decisions on threshold-boundary pixels — the same +-1-ulp class
as batched serving (CLAUDE.md), gated by the IoU goldens, the tolerance
invariant in tests, and the on-chip parity run.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.misc import resize_matrix
from .geometry import RoiGeometry
from .image import _bilateral_taps


# ---------------------------------------------------------------------------
# Pattern detection

@dataclasses.dataclass
class EdgeInfo:
    """What the fused edge path replaces, detected from the folded IR."""
    # front
    front_ok: bool
    body_start: int = 0          # first body node index (after conv[+act])
    body_in_tensor: int = -1     # tensor the body consumes (= front output)
    front_w_key: str = ""        # params key of the first conv kernel (HWIO)
    front_b_key: str = ""
    front_activation: str = "NONE"   # NONE | RELU6 | HARD_SWISH
    pad_lo_h: int = 0            # SAME leading pad of the stride-2 conv
    pad_lo_w: int = 0
    conv_oh: int = 0
    conv_ow: int = 0
    # tail
    tail_ok: bool = False
    body_end: int = 0            # one past the last body node index
    body_out_tensor: int = -1
    tail_w_key: str = ""
    tail_b_key: str = ""
    tail_kind: str = ""          # "two_channel" | "threshold"
    tail_threshold: float = 0.0  # decode threshold (logit-domain for sigmoid)


def _same_pad_lo(in_size: int, k: int, stride: int) -> int:
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k - in_size, 0)
    return total // 2


def detect_edge(model, spec) -> Optional[EdgeInfo]:
    """Inspect a CompiledModel's folded IR for the fusable edge pattern.

    Front: node 0 is a 3x3 stride-2 SAME CONV_2D from 3 channels, whose
    activation is inline or a single following HARD_SWISH/RELU6 node.
    Tail: last node is a 2x2 stride-2 Convolution2DTransposeBias (optionally
    followed by LOGISTIC) whose output feeds a sign/threshold decode.
    """
    g = model.graph
    nodes = g.nodes
    if len(nodes) < 4 or getattr(model, "host_params", None) is None:
        return None
    n0 = nodes[0]
    info = EdgeInfo(front_ok=False)
    if (n0.kind == "CONV_2D" and n0.options.get("stride_h") == 2
            and n0.options.get("stride_w") == 2
            and n0.options.get("padding") == "SAME"
            and n0.options.get("dilation_h", 1) == 1
            and n0.options.get("dilation_w", 1) == 1
            and n0.inputs[0] == g.inputs[0]):
        w_key, b_key = f"t{n0.inputs[1]}@hwio", f"t{n0.inputs[2]}"
        wt = model.host_params.get(w_key)
        act = n0.options.get("activation", "NONE")
        start, out_t = 1, n0.outputs[0]
        if act == "NONE" and nodes[1].kind in ("HARD_SWISH", "RELU6") \
                and nodes[1].inputs[0] == out_t:
            # standalone activation node folds into the kernel
            act = nodes[1].kind
            start, out_t = 2, nodes[1].outputs[0]
        consumers = [n for n in nodes[start:] for i in n.inputs if i == out_t]
        if (wt is not None and wt.shape[:3] == (3, 3, 3)
                and b_key in model.host_params
                and act in ("NONE", "RELU6", "HARD_SWISH")
                and len(consumers) >= 1):
            ih, iw = model.input_shape[1:3]
            info = EdgeInfo(
                front_ok=True, body_start=start, body_in_tensor=out_t,
                front_w_key=w_key, front_b_key=b_key, front_activation=act,
                pad_lo_h=_same_pad_lo(ih, 3, 2), pad_lo_w=_same_pad_lo(iw, 3, 2),
                conv_oh=-(-ih // 2), conv_ow=-(-iw // 2))
    # --- tail
    last = len(nodes) - 1
    tnode = None
    if nodes[last].kind == "Convolution2DTransposeBias" and spec.decode == "two_channel":
        tnode, end, kind = nodes[last], last, "two_channel"
    elif (nodes[last].kind == "LOGISTIC" and last >= 1
          and nodes[last - 1].kind == "Convolution2DTransposeBias"
          and nodes[last].inputs[0] == nodes[last - 1].outputs[0]
          and spec.decode == "threshold"):
        tnode, end, kind = nodes[last - 1], last - 1, "threshold"
    if tnode is not None and tnode.options.get("stride_h") == 2 \
            and tnode.options.get("stride_w") == 2:
        w_key, b_key = f"t{tnode.inputs[1]}@tconv", f"t{tnode.inputs[2]}"
        wt = model.host_params.get(w_key)  # flipped HWIO (2, 2, 16, O)
        want_o = 2 if kind == "two_channel" else 1
        oh, ow = model.output_shape[1:3]
        xh, xw = g.tensor(tnode.inputs[0]).shape[1:3]
        # exact phase-dot form needs kernel == stride and zero SAME padding
        if (wt is not None and wt.shape[:2] == (2, 2) and wt.shape[3] == want_o
                and b_key in model.host_params
                and (oh, ow) == (2 * xh, 2 * xw)
                and nodes[last].outputs[0] == g.outputs[0]):
            thr = 0.0
            if kind == "threshold":
                t = float(spec.threshold)
                thr = math.log(t / (1.0 - t))  # sigmoid(y) > t  <=>  y > logit(t)
            info.tail_ok = True
            info.body_end = end
            info.body_out_tensor = tnode.inputs[0]
            info.tail_w_key, info.tail_b_key = w_key, b_key
            info.tail_kind, info.tail_threshold = kind, thr
    if not info.front_ok and not info.tail_ok:
        return None
    if not info.tail_ok:
        info.body_end = len(nodes)
        info.body_out_tensor = g.outputs[0]
    if not info.front_ok:
        info.body_start = 0
        info.body_in_tensor = g.inputs[0]
    return info


# ---------------------------------------------------------------------------
# Quadrantized preprocess matrices

def _reflect101(r: int, n: int) -> int:
    if r < 0:
        return -r
    if r >= n:
        return 2 * n - 2 - r
    return r


@functools.lru_cache(maxsize=64)
def front_axis_matrix(src: int, dst_roi: int, canvas: int, lo: int):
    """One axis of the quadrantized preprocess operator.

    src:      ROI extent in frame pixels (resize source)
    dst_roi:  in_roi extent in model-canvas pixels (resize target)
    canvas:   model input extent (letterbox canvas; margins = zero rows)
    lo:       in_roi offset inside the canvas

    Returns (Aq, qn) where Aq is ((2*qn), src) f32: row s = a*qn + i holds
    the interpolation row for padded canvas coordinate r = 2i+a-4.
    Coordinates -2..canvas+1 are the bilateral's reflect-101(2) halo; the
    extra outermost pair (-4,-3 / canvas+2,canvas+3) is zero padding so
    the kernel's neighbor reads for *masked-out* border plane rows stay
    in bounds without any in-kernel pad op (Mosaic has no general pad).
    Bit-compatible with resize -> letterbox pad -> reflect-101(2): every
    row is either a copy of a resize row, a duplicate (reflect), or zero
    (letterbox margin / outer halo), so each output element's dot
    product is identical to the unquadrantized chain's.
    """
    a_res = resize_matrix(src, dst_roi, False, True).astype(np.float64)
    hp = canvas + 8
    qn = (hp + 1) // 2
    aq = np.zeros((2 * qn, src), np.float64)
    for a in (0, 1):
        for i in range(qn):
            rp = 2 * i + a
            r = rp - 4
            if rp >= hp or r < -2 or r > canvas + 1:
                continue
            r = _reflect101(r, canvas)
            t = r - lo
            if 0 <= t < dst_roi:
                aq[a * qn + i] = a_res[t]
    return aq.astype(np.float32), qn


# ---------------------------------------------------------------------------
# Fused front kernel: bilateral + normalize + 3x3/s2 conv + activation

def _front_compute(z, w_ref, *, qh, qw, H, W, oh, ow, cout, taps, inv2sc,
                   use_bilateral, scale, offset, pad_lo_h, pad_lo_w,
                   activation, conv_dot=False, wv=None, wv_widen=None):
    """Shared kernel/interpreter body.

    z: (3, 2*qh, 2*qw) f32, rounded quadrantized resize output (BGR order);
    H, W are the model canvas extents.  w_ref: (28, Cout) SMEM ref — rows
    0..26 hold the HWIO kernel flattened as ((di*3+dj)*3+c) with input
    channel c reading our BGR plane c; row 27 is the bias.  Returns a list
    of Cout (oh, ow) activation planes.
    """

    # bilateral + normalize + conv-SAME zero border, all as full-size phase
    # planes: planes[a][b][c] has shape (qh-2, qw-2); row k covers model
    # row m = 2k+a-2 (one halo row each side of the canvas), with
    # out-of-canvas rows/cols zeroed by an iota mask — the conv's SAME
    # padding — instead of an in-kernel pad op (unsupported by Mosaic).
    #
    # Lane shifts are the dominant cost, not the arithmetic (probed: a
    # no-exp ablation times identically, r4 probe_front.py) — so the
    # column (lane) offsets are factored out ONCE into 18 full-height
    # windows; every tap/slab read below is then a sublane-only slice of
    # one of them.  The naive form paid 13 taps x 3 ch x 4 quadrants
    # = 156 misaligned lane shifts; this pays 18.
    npl, npw = qh - 2, qw - 2
    col = {}
    for c in range(3):
        for b2 in (0, 1):
            for oj in (0, 1, 2):
                col[c, b2, oj] = z[c, :, b2 * qw + oj:b2 * qw + oj + npw]
    planes = [[None, None], [None, None]]
    for a in (0, 1):
        rowm = 2 * jax.lax.broadcasted_iota(jnp.int32, (npl, npw), 0) + (a - 2)
        rvalid = (rowm >= 0) & (rowm < H)
        for b in (0, 1):
            # plane row k / col j <-> quadrant row k+1 / col j+1 of (a, b)
            ctr = [col[c, b, 1][a * qh + 1:a * qh + 1 + npl, :]
                   for c in range(3)]
            if use_bilateral:
                num = [jnp.zeros((npl, npw), jnp.float32) for _ in range(3)]
                den = jnp.zeros((npl, npw), jnp.float32)
                for (di, dj, sw) in taps:
                    a2, b2 = (a + di) % 2, (b + dj) % 2
                    oi = 1 + ((a + di) - a2) // 2
                    oj = 1 + ((b + dj) - b2) // 2
                    nb = [col[c, b2, oj][a2 * qh + oi:a2 * qh + oi + npl, :]
                          for c in range(3)]
                    cdist = (jnp.abs(nb[0] - ctr[0]) + jnp.abs(nb[1] - ctr[1])
                             + jnp.abs(nb[2] - ctr[2]))
                    wgt = sw * jnp.exp(inv2sc * cdist * cdist)
                    for c in range(3):
                        num[c] = num[c] + wgt * nb[c]
                    den = den + wgt
                vals = [jnp.round(num[c] / den) for c in range(3)]
            else:
                vals = ctr
            colm = 2 * jax.lax.broadcasted_iota(jnp.int32, (npl, npw), 1) + (b - 2)
            valid = rvalid & (colm >= 0) & (colm < W)
            planes[a][b] = [jnp.where(valid, vals[c] * scale + offset, 0.0)
                            for c in range(3)]

    # conv: out[i,j,o] = sum_{di,dj,c} plane[phase(di)][phase(dj)][c]
    #                      [i + off_r(di), j + off_c(dj)] * w[di,dj,c,o]
    slabs = []
    for di in range(3):
        rr = di - pad_lo_h
        a = rr % 2
        tr = (rr - a) // 2 + 1  # +1: plane row 0 is the m=a-2 halo row
        for dj in range(3):
            cc = dj - pad_lo_w
            b = cc % 2
            tc = (cc - b) // 2 + 1
            for c in range(3):
                slabs.append(jax.lax.slice(planes[a][b][c], (tr, tc),
                                           (tr + oh, tc + ow)))
    if conv_dot:
        # MXU contraction instead of the 27*cout vreg FMA loop (the loop is
        # vreg-issue-bound at ~1.3 us per output channel at the 257x257
        # canvas — tools/probe_front.py).  A direct (cout,27)@(27,oh,ow)
        # dot does NOT compile: Mosaic lowers it via a (27,oh,ow) ->
        # (27,oh*ow) shape cast that is unsupported for lane-misaligned ow.
        # Instead each slab is first widened to the lane-aligned rowpad
        # width rs via the 0/1 embedding matmul (exact at HIGHEST), the
        # (27,oh,rs) stack collapses to (27,oh*rs) for free, and ONE MXU
        # dot contracts all taps x channels.  Bias is added under a
        # column-validity mask so the rs padding columns stay zero.
        wide = [jax.lax.dot(s, wv_widen, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                for s in slabs]                          # 27 x (oh, rs)
        rs = wv_widen.shape[1]
        stk = jnp.stack(wide).reshape(len(slabs), oh * rs)
        res = jax.lax.dot_general(
            wv[: len(slabs), :].T, stk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(cout, oh, rs)
        colv = jax.lax.broadcasted_iota(jnp.int32, (oh, rs), 1) < ow
        pre = [jnp.where(colv, res[o] + w_ref[27, o], 0.0)
               for o in range(cout)]
    else:
        pre = []
        for o in range(cout):
            acc = jnp.full((oh, ow), 0.0, jnp.float32) + w_ref[27, o]
            for t, slab in enumerate(slabs):
                acc = acc + slab * w_ref[t, o]
            pre.append(acc)
    outs = []
    for acc in pre:
        if activation == "RELU6":
            acc = jnp.clip(acc, 0.0, 6.0)
        elif activation == "HARD_SWISH":
            acc = acc * jnp.clip(acc + 3.0, 0.0, 6.0) * (1.0 / 6.0)
        outs.append(acc)
    return outs


def _front_kernel(z_ref, w_ref, out_ref, *, out_layout, widen_ref=None,
                  wv_ref=None, conv_dot=False, **kw):
    # (an "nhwc" layout writing lane-strided per-channel columns was
    # measured 17-21 us slower and removed — see PERF.md)
    outs = _front_compute(z_ref[0], w_ref, conv_dot=conv_dot,
                          wv=None if wv_ref is None else wv_ref[...],
                          wv_widen=None if widen_ref is None
                          else widen_ref[...], **kw)
    for o, plane in enumerate(outs):
        if conv_dot:
            # plane is already (oh, rs) widened (the slab-widen dots feed
            # the tap contraction); store as-is
            out_ref[0, o] = plane.astype(out_ref.dtype)
        elif out_layout == "rowpad":
            # (oh, rs) row-padded plane: a (ow, rs) 0/1 embedding matmul
            # (exact at HIGHEST — f32 splits into 3 bf16 terms losslessly
            # and 0/1 columns just copy) widens the plane with whole-tile
            # stores; jnp.pad here lowers to a lane-misaligned concatenate
            # that crashes Mosaic.  Feeds the body megakernel's
            # (c, rows*rs) layout via a free XLA reshape.
            out_ref[0, o] = jax.lax.dot(
                plane, widen_ref[...], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(out_ref.dtype)
        else:
            out_ref[0, o] = plane.astype(out_ref.dtype)


def front_fused_call(zt, w_flat, *, qh, qw, H, W, oh, ow, taps, inv2sc,
                     use_bilateral, scale, offset, pad_lo_h, pad_lo_w,
                     activation, out_layout, out_dtype, interpret=False,
                     rs=128, conv_dot=False):
    """zt: (N, 3, 2qh, 2qw) f32, w_flat (28, Cout) [27 taps + bias row]
    -> chw (N, C, oh, ow) or rowpad (N, C, oh, rs)."""
    n = zt.shape[0]
    cout = w_flat.shape[1]
    if out_layout == "rowpad":
        oshape = (n, cout, oh, rs)
    else:
        oshape = (n, cout, oh, ow)
    blk = (1,) + oshape[1:]
    extra_args = []
    in_specs = [
        pl.BlockSpec((1, 3, 2 * qh, 2 * qw), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((28, cout), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    if out_layout == "rowpad":
        widen = np.zeros((ow, rs), np.float32)
        widen[np.arange(ow), np.arange(ow)] = 1.0
        extra_args.append(widen)
        in_specs.append(pl.BlockSpec((ow, rs), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if conv_dot:
        if out_layout != "rowpad":
            raise ValueError("conv_dot requires the rowpad front layout "
                             "(the widen matrix lane-aligns the dot)")
        # the MXU contraction needs the tap weights in VMEM (SMEM feeds
        # scalars only); the SMEM copy still serves the bias row
        extra_args.append(jnp.asarray(w_flat, jnp.float32))
        in_specs.append(pl.BlockSpec((28, cout), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    def kern(z_ref, w_ref, *rest):
        rest = list(rest)
        out_ref = rest.pop()
        widen_ref = rest.pop(0) if out_layout == "rowpad" else None
        wv_ref = rest.pop(0) if conv_dot else None
        _front_kernel(
            z_ref, w_ref, out_ref, qh=qh, qw=qw, H=H, W=W, oh=oh, ow=ow,
            cout=cout, taps=tuple(taps), inv2sc=inv2sc,
            use_bilateral=use_bilateral, scale=scale, offset=offset,
            pad_lo_h=pad_lo_h, pad_lo_w=pad_lo_w, activation=activation,
            out_layout=out_layout, widen_ref=widen_ref, wv_ref=wv_ref,
            conv_dot=conv_dot)

    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(blk, lambda i: (i,) + (0,) * (len(blk) - 1),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(oshape, out_dtype),
        # the unrolled bilateral holds ~24 taps x 9 plane temporaries on the
        # Mosaic stack; at 256-wide canvases that exceeds the default 16 MiB
        # scoped-vmem cap (segm_full needs ~21 MiB).  v5e has 128 MiB of
        # physical VMEM — raise the cap for this kernel only.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(zt, w_flat, *extra_args)


# ---------------------------------------------------------------------------
# Fused tail: 2x2/s2 transpose conv as one phase-major dot + decode + EMA.
#
# Because kernel == stride, each output phase p = 2a+b is an independent
# 1x1 contraction of the body activation; ``two_channel`` decode only uses
# sign(out1 - out0) and ``threshold`` compares sigmoid(out) to a constant
# (= out vs logit(threshold)), so the two output channels collapse to ONE
# K->1 dot per phase.  einsum("pk,...hwk->...phw") emits the phase-MAJOR
# (2,2,xh,xw) layout directly (lhs-free dims lead), so no tiny-minor-dim
# tensor and no relayout ever materializes; decode + the EMA bit trick
# are elementwise on well-tiled (xh, xw)-minor arrays.  No Pallas needed.

@functools.lru_cache(maxsize=32)
def quadrant_upscale_matrices(xh: int, xw: int, crop_y: int,
                              crop_x: int, crop_h: int, crop_w: int,
                              up_h: int, up_w: int):
    """(blur5 ∘ upscale ∘ out_roi-crop) over a (2, 2, xh, xw) quadrant EMA.

    The standard fused post path computes  Ah @ small @ Aw.T  with
    small = ema[crop] (maskgen._fold_blur_matrices).  With the EMA in
    phase-major quadrant layout the same operator factors per axis over
    the (phase, index) pair: logical mask row R (absolute model-output
    coordinate) lives at [R & 1, R >> 1].  Rows outside the crop get zero
    columns.  Returns ahq (up_h, 2, xh) and awq (up_w, 2, xw).
    """
    from .image import blur_matrix
    ah = (blur_matrix(up_h, 5).astype(np.float64)
          @ resize_matrix(crop_h, up_h, False, True).astype(np.float64))
    aw = (blur_matrix(up_w, 5).astype(np.float64)
          @ resize_matrix(crop_w, up_w, False, True).astype(np.float64))
    ahq = np.zeros((up_h, 2, xh), np.float64)
    for r in range(crop_h):
        rr = crop_y + r
        ahq[:, rr & 1, rr >> 1] = ah[:, r]
    awq = np.zeros((up_w, 2, xw), np.float64)
    for c in range(crop_w):
        cc = crop_x + c
        awq[:, cc & 1, cc >> 1] = aw[:, c]
    return ahq.astype(np.float32), awq.astype(np.float32)


# ---------------------------------------------------------------------------
# The assembled fast path

class EdgeFused:
    """Builds and owns the fused edge path for one (model, geometry).

    ``step_mask(params, frame, ema)`` is a drop-in replacement for the
    standard preprocess -> raw_fn -> decode -> ema -> postprocess chain
    inside a jitted program.  When the fused tail is active the EMA
    buffer has shape ``ema_shape`` = (2, 2, xh, xw) in phase-major
    quadrant layout (init/reset values are uniform, so no conversion is
    ever needed); otherwise it keeps the standard (out_h, out_w).

    Weights of the two edge layers are baked at construction from
    ``model.params`` (like the interpolation matrices); swapping the
    params pytree afterwards will not retarget the edge layers.
    """

    def __init__(self, model, geo: RoiGeometry, spec,
                 info: Optional[EdgeInfo] = None, *,
                 use_bilateral: bool = True, precision=None,
                 interpret: bool = False, refine: str = "box",
                 morph: str = "", u8_exact: bool = False,
                 mega: Optional[bool] = None, cont: bool = False):
        from .maskgen import _resize_precision
        self.model = model
        self.geo = geo
        self.spec = spec
        self.interpret = interpret
        self.use_bilateral = use_bilateral
        self.precision = precision
        self.rp = _resize_precision(precision)
        self.refine, self.morph, self.u8_exact = refine, morph, u8_exact
        self.info = info if info is not None else edge_applicable(
            model, spec, geo, refine=refine, u8_exact=u8_exact, morph=morph)
        if self.info is None:
            raise ValueError("model does not match the fused edge pattern")
        info = self.info

        if info.front_ok:
            ih, iw = model.input_shape[1:3]
            self.ahq, self.qh = front_axis_matrix(
                geo.roi.h, geo.in_roi.h, ih, geo.in_roi.y)
            self.awq, self.qw = front_axis_matrix(
                geo.roi.w, geo.in_roi.w, iw, geo.in_roi.x)
            w = np.asarray(model.params[info.front_w_key], np.float32)
            # HWIO with I in RGB order -> permute I to read our BGR planes,
            # then flatten taps to the kernel's SMEM layout (27 rows of
            # ((di*3+dj)*3+c), bias as row 27)
            w = np.ascontiguousarray(w[:, :, ::-1, :])
            b = np.asarray(model.params[info.front_b_key], np.float32)
            cout = w.shape[3]
            self.front_w_flat = np.concatenate(
                [w.reshape(27, cout), b.reshape(1, cout)], axis=0)
            self.taps = tuple(_bilateral_taps(5, 100.0))
            self.inv2sc = -0.5 / (100.0 ** 2)

        if info.tail_ok:
            wt = np.asarray(model.params[info.tail_w_key], np.float32)
            bt = np.asarray(model.params[info.tail_b_key], np.float32)
            # stored layout: flipped HWIO (2, 2, K, O) with
            # Wf[h, w, k, o] = W_ohwi[o, 1-h, 1-w, k]
            k = wt.shape[2]
            wd = np.zeros((4, k), np.float32)
            bd = np.zeros((4,), np.float32)
            for a in (0, 1):
                for b in (0, 1):
                    p = 2 * a + b
                    if info.tail_kind == "two_channel":
                        wd[p] = (wt[1 - a, 1 - b, :, 1].astype(np.float64)
                                 - wt[1 - a, 1 - b, :, 0]).astype(np.float32)
                        bd[p] = np.float32(np.float64(bt[1]) - np.float64(bt[0]))
                    else:
                        wd[p] = wt[1 - a, 1 - b, :, 0]
                        bd[p] = bt[0]
            self.tail_wd, self.tail_bd = wd, bd
            oh2, ow2 = model.output_shape[1:3]
            self.xh, self.xw = oh2 // 2, ow2 // 2
            o = geo.out_roi
            self.post_ahq, self.post_awq = quadrant_upscale_matrices(
                self.xh, self.xw, o.y, o.x, o.h, o.w, geo.roi.h, geo.roi.w)

        # body: one Pallas megakernel when the whole span qualifies
        # (ops/megakernel.py — ~29% faster than the XLA lowerings and it
        # kills the grouped-conv batch pathology), else a partial trace of
        # nodes[start:end] through the standard lowerings
        self.mega = None
        self.mega_prefix = None
        self.mega_cont = None
        if info.front_ok and info.tail_ok and mega is not False:
            from ..ops.megakernel import body_mega_for
            self.mega = body_mega_for(model, info, interpret=interpret)
        if self.mega is None and info.front_ok and mega is not False:
            # front-only families (deeplab/bodypix): run the tiny-minor-dim
            # early stages (129x129/65x65, C<=72) as one rowpad kernel and
            # hand the cut tensor to the XLA lowerings, which run the
            # 33x33 C>=96 stages near the MXU roof (PERF.md round 4).
            # The FLAT continuation chain (cont=True) keeps going through
            # the 33x33 regime as chained dense-layout kernels
            # (BodyMega(flat=True): RS = row width, per-tap column
            # boundary masks, 3-pass HIGH dot emulation).  Byte-exact
            # decode parity on TPU; measured per family on the real chip
            # (tools/probe_cont.py, same-session A/Bs): a WIN for deeplab
            # (266.1 vs 280.8 us) — its span is MXU-dot-heavy — and a
            # LOSS for bodypix (~195 vs 167.6 us: 7 dilation-2 C=256 DWs
            # whose VPU traversal bill beats XLA's conv emitter), so the
            # default comes from ModelSpec.edge_cont.  Two earlier
            # formulations lost for BOTH families and are superseded:
            # RS=128 rowpad (deeplab 409/bodypix 305 us — 3.9x lane
            # padding multiplies every dot MAC) and shift-decomposed
            # dilated DWs under XLA (BACKSCRUB_DW_DILATED=shift, 196 vs
            # 167.9 / 286.8 vs 281.2).  PERF.md round 5 has the table.
            from ..ops.megakernel import (body_mega_continuation_for,
                                          body_mega_prefix_for)
            r = body_mega_prefix_for(model, info, interpret=interpret)
            if r is not None:
                self.mega_prefix, self._cut_end, self._cut_tid = r
                if cont:
                    rc = body_mega_continuation_for(
                        model, info, self._cut_end, self._cut_tid,
                        interpret=interpret)
                    if rc is not None:
                        self.mega_cont, self._cont_end, self._cont_tid = rc
        if mega and self.mega is None:
            raise ValueError("mega=True but the body span does not qualify "
                             "for the megakernel (needs both fused edge "
                             "layers and a supported op span)")
        if self.mega is not None:
            self._body = None
        elif self.mega_cont is not None:
            # remainder after the continuation chain (empty when the chain
            # reaches the graph output — bodypix)
            self._body = (None if (self._cont_end == info.body_end
                                   and self._cont_tid == info.body_out_tensor)
                          else _make_span_fn(model, self._cont_end,
                                             info.body_end, self._cont_tid,
                                             info.body_out_tensor))
        elif self.mega_prefix is not None:
            self._body = _make_span_fn(model, self._cut_end, info.body_end,
                                       self._cut_tid, info.body_out_tensor)
        else:
            self._body = _make_span_fn(model, info.body_start, info.body_end,
                                       info.body_in_tensor,
                                       info.body_out_tensor)
        # How the front kernel emits the body input.  "chw" writes Cout
        # full planes (clean VMEM stores) and lets XLA transpose to NHWC
        # outside; "nhwc" writes lane-strided per-channel columns inside
        # the kernel — measured 17-21 us slower on v5e (the store pattern,
        # not the compute, dominates).  "rowpad" feeds the megakernel's
        # (c, rows*rs) layout directly (full-span or prefix).
        self.front_layout = ("rowpad" if (self.mega is not None
                                          or self.mega_prefix is not None)
                             else "chw")
        # MXU tap contraction in the front kernel: wins at large canvases
        # where the 27xCout vreg FMA loop is issue-bound (~1.3 us/channel
        # at 129x129, tools/probe_front.py: deeplab 44.2 -> 34.0 us) but
        # loses at small ones (segm 48x80: 6.9 -> 8.9 us — the 27 slab
        # widen dots' fixed cost dominates).  Gate on the conv plane area.
        self.front_conv_dot = (self.front_layout == "rowpad"
                               and info.conv_oh * info.conv_ow >= 8192)

    @property
    def ema_shape(self):
        """Shape of the EMA state this path carries: phase-major quadrant
        (2, 2, xh, xw) when the fused tail is active, else the standard
        (out_h, out_w).  Init/reset values are uniform, so swapping layouts
        never needs a conversion."""
        if self.info.tail_ok:
            return (2, 2, self.xh, self.xw)
        return tuple(self.model.output_shape[1:3])

    # -- front ------------------------------------------------------------
    def front(self, frame_bgr_u8):
        """(..., H, W, 3) u8 -> body input activation (..., oh, ow, C)."""
        info, geo = self.info, self.geo
        r = geo.roi
        roi = frame_bgr_u8[..., r.y:r.y + r.h, r.x:r.x + r.w, :]
        x = roi.astype(jnp.float32)
        z = jnp.einsum("sh,...hwc->...swc", jnp.asarray(self.ahq), x,
                       precision=self.rp)
        z = jnp.einsum("tw,...swc->...stc", jnp.asarray(self.awq), z,
                       precision=self.rp)
        z = jnp.round(z)
        zt = jnp.moveaxis(z, -1, -3)  # (..., 3, 2qh, 2qw)
        lead = zt.shape[:-3]
        ztn = zt.reshape((-1,) + zt.shape[-3:])
        ih, iw = self.model.input_shape[1:3]
        out = front_fused_call(
            ztn, jnp.asarray(self.front_w_flat),
            qh=self.qh, qw=self.qw, H=ih, W=iw,
            oh=info.conv_oh, ow=info.conv_ow,
            taps=self.taps, inv2sc=self.inv2sc,
            use_bilateral=self.use_bilateral,
            scale=float(self.spec.scale), offset=float(self.spec.offset),
            pad_lo_h=info.pad_lo_h, pad_lo_w=info.pad_lo_w,
            activation=info.front_activation, out_layout=self.front_layout,
            # the megakernel consumes f32 rowpad regardless of compute
            # dtype (it casts internally); emitting bf16 here would only
            # add a round-trip the kernel undoes
            out_dtype=(jnp.float32 if self.front_layout == "rowpad"
                       else self.model.compute_dtype),
            interpret=self.interpret,
            rs=(self.mega.rs if self.mega is not None
                else self.mega_prefix.rs if self.mega_prefix is not None
                else 128),
            conv_dot=self.front_conv_dot)
        if self.front_layout == "rowpad":
            # (N, C, oh, rs) -> (N, C, oh*rs): contiguous, free in XLA
            out = out.reshape(out.shape[:2] + (-1,))
        elif self.front_layout == "chw":
            out = jnp.moveaxis(out, -3, -1)
        return out.reshape(lead + out.shape[1:])

    # -- body -------------------------------------------------------------
    def body(self, params, h):
        if self.mega is not None:
            # params are baked into the megakernel (like the edge weights)
            return self.mega(h)
        if self.mega_prefix is not None:
            # rowpad prefix kernel, then bridge the spaced rowpad cut
            # tensor out: (c, rows*rs) -> lane slice at sp -> (c, rows, w).
            # One small well-shaped relayout (the cut sits at 33x33,
            # C<=72) instead of the 17 us chw->NHWC copy + ~25 us of
            # early-DW relayouts it replaces.
            h = self.mega_prefix(h)
            m = self.mega_prefix.out_meta
            rs = self.mega_prefix.rs
            h = h.reshape(h.shape[:-1] + (m.rows, rs))
            h = jax.lax.slice_in_dim(h, 0, (m.w - 1) * m.sp + 1, m.sp,
                                     axis=-1)
            if self.mega_cont is not None:
                # compact rowpad re-entry: pad each row to the chain's RS
                # and run the 33x33 regime in-kernel (sp=1 throughout)
                rs2 = self.mega_cont[0].rs
                h = jnp.pad(h, [(0, 0)] * (h.ndim - 1) + [(0, rs2 - m.w)])
                h = h.reshape(h.shape[:-2] + (m.rows * rs2,))
                for mk in self.mega_cont:
                    h = mk(h)
                mo = self.mega_cont[-1].out_meta
                h = h.reshape(h.shape[:-1] + (mo.rows,
                                              self.mega_cont[-1].rs))
                h = h[..., :mo.w]
            h = jnp.moveaxis(h, -3, -1)
            if self._body is None:
                # the continuation chain produced the body output itself
                return h
        lead = h.shape[:-3]
        hb = h.reshape((-1,) + h.shape[-3:])
        out = self._body(params, hb)
        return out.reshape(lead + out.shape[1:])

    # -- tail -------------------------------------------------------------
    def tail(self, body_out, ema_q):
        """body activation (..., xh, xw, K) + quadrant EMA (..., 2, 2, xh,
        xw) -> new quadrant EMA.  One phase-major dot + decode + the EMA
        bit trick of lib/libbackscrub.cc:330,342-357 — all on well-tiled
        spatial-minor arrays."""
        if self.mega is not None:
            # rowpad (..., K, xh*rs) -> (..., K, xh, xw) channels-leading
            rs = self.mega.rs
            body_out = body_out.reshape(body_out.shape[:-1]
                                        + (self.xh, rs))[..., :self.xw]
            dq = jnp.einsum("pk,...khw->...phw", jnp.asarray(self.tail_wd),
                            body_out.astype(jnp.float32),
                            precision=self.model.precision_setting)
        else:
            dq = jnp.einsum("pk,...hwk->...phw", jnp.asarray(self.tail_wd),
                            body_out.astype(jnp.float32),
                            precision=self.model.precision_setting)
        dq = dq + jnp.asarray(self.tail_bd)[:, None, None]
        # (..., 4, xh, xw) -> (..., 2, 2, xh, xw): major-dim split, no
        # tile change, free under XLA
        dq = dq.reshape(dq.shape[:-3] + (2, 2) + dq.shape[-2:])
        val = jnp.where(dq > self.info.tail_threshold,
                        jnp.uint8(0), jnp.uint8(255))
        return ((val & jnp.uint8(0xE0)) | (ema_q >> 3)).astype(jnp.uint8)

    # -- postprocess ------------------------------------------------------
    def postprocess(self, ema_q):
        """Quadrant EMA (..., 2, 2, xh, xw) -> full-frame mask u8 (the
        fold_blur fused post path, with the crop/upscale/blur operator
        factored over the (phase, index) pairs of each axis)."""
        geo = self.geo
        y = jnp.einsum("oah,...abhw->...obw", jnp.asarray(self.post_ahq),
                       ema_q.astype(jnp.float32), precision=self.rp)
        y = jnp.einsum("pbw,...obw->...op", jnp.asarray(self.post_awq), y,
                       precision=self.rp)
        m = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
        r = geo.roi
        pad = [(0, 0)] * (m.ndim - 2) + [(r.y, geo.frame_h - r.y - r.h),
                                         (r.x, geo.frame_w - r.x - r.w)]
        return jnp.pad(m, pad, constant_values=255)

    # -- the whole mask chain ---------------------------------------------
    def step_mask(self, params, frame, ema):
        """Full fused replacement: frame + EMA -> (mask, new EMA)."""
        from .decode import decode_val, ema_update
        from .maskgen import postprocess_mask, preprocess
        info = self.info
        if info.front_ok:
            h = self.front(frame)
        else:
            h = preprocess(frame, self.geo, self.spec,
                           use_bilateral=self.use_bilateral,
                           precision=self.precision)
        out = self.body(params, h)
        if info.tail_ok:
            new_ema = self.tail(out, ema)
            mask = self.postprocess(new_ema)
            return mask, new_ema
        val = decode_val(out.astype(jnp.float32), self.spec)
        new_ema = ema_update(ema, val)
        mask = postprocess_mask(new_ema, self.geo, precision=self.precision,
                                u8_exact=self.u8_exact, refine=self.refine,
                                frame_bgr=frame, morph=self.morph)
        return mask, new_ema


def _make_span_fn(model, start: int, end: int, in_tensor: int, out_tensor: int):
    """A traceable fn(params, x) running nodes[start:end] of the model's
    folded graph, consuming ``in_tensor`` and returning ``out_tensor``."""
    from ..graph.executor import LoweringCtx
    from ..ops.registry import get_lowering
    graph = model.graph

    def run(params, x):
        ctx = LoweringCtx(graph, params, dict(model.host_params),
                          model.compute_dtype, model.precision_setting,
                          jnp.float32, all_graphs=graph.subgraphs)
        ctx.set(in_tensor, x.astype(model.compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x)
        for node in graph.nodes[start:end]:
            get_lowering(node.kind)(ctx, node)
        return ctx.get(out_tensor)

    return run


def edge_applicable(model, spec, geo: Optional[RoiGeometry] = None, *,
                    refine: str = "box", u8_exact: bool = False,
                    morph: str = "", quantize=None) -> Optional[EdgeInfo]:
    """Gate: the fused FRONT applies whenever the pattern matches and the
    weights are unquantized; the fused TAIL additionally requires the
    default post pipeline (box refine, float post, no morph) and a crop
    fine enough for the fold_blur operator (maskgen.postprocess_mask's
    auto rule: min crop dim >= 64)."""
    if quantize:
        return None
    try:
        info = detect_edge(model, spec)
    except Exception:
        return None
    if info is None:
        return None
    if info.tail_ok and (refine != "box" or u8_exact or morph
                         or (geo is not None
                             and min(geo.out_roi.h, geo.out_roi.w) < 64)):
        info.tail_ok = False
        info.body_end = len(model.graph.nodes)
        info.body_out_tensor = model.graph.outputs[0]
    if not info.front_ok and not info.tail_ok:
        return None
    return info
