"""Body megakernel: the CNN body span as ONE Pallas program.

The classic path runs the ~128-node body (everything between the fused
edge layers, pipeline/edge.py) as ~45 XLA convolutions plus elementwise
ops on NHWC tensors whose C=16-32 channels are lane-padded up to 8x, with
~15 us of relayout copies between them (PERF.md roofline) — a
sequential-op latency floor, not a FLOP or bandwidth problem.  This
module compiles the same span into a single Pallas kernel where every
intermediate lives in VMEM in a **rowpad layout** chosen so that no
Mosaic-illegal access ever appears:

    tensor (1, h, w, c)  ->  (c, h * RS) f32,   RS = row stride (128/256)
    row i occupies lanes [i*RS, i*RS + w*sp), columns at lane spacing sp

- ``sp`` doubles at each stride-2 stage (1 -> 2 -> 4 -> 8).  Stride-2
  never compacts columns (an intra-tile lane gather Mosaic cannot do):
  the value of output column j' already sits at lane j'*(2*sp), so a
  stride-2 depthwise conv is just "keep even row blocks + mask to the
  coarser grid".
- 1x1 convs and FCs are weight-stationary MXU dots (co,ci)@(ci,L).
- Depthwise taps: row offsets are whole-RS lane offsets (tile-aligned,
  free); column offsets are small lane shifts with aligned output
  shapes (measured cheap; misaligned *outputs* are what costs).
- SE blocks: masked lane-sum pooling to (c,1) vectors, tiny dots,
  broadcast gates.
- 2x bilinear upsampling: column taps become a few shift+coefvec FMAs
  (delta = sp_out*j' - sp_in*j takes <=4 distinct values for 2x);
  row doubling assembles output row blocks into a VMEM scratch ref.
- CONCAT on channels is a sublane concat (cheap); ADD/MUL/activations
  are plain VPU ops.

Pad lanes are re-zeroed (one mask multiply) after any op that can leak
values into them (bias add, shifts); ops that need clean pads (DW,
pool, resize, output) therefore always see zeros, which also implements
SAME zero padding exactly.

Numerics: dots run at the model's precision setting (HIGHEST for the
f32 parity path) with f32 accumulation; depthwise taps are f32 VPU FMAs.
Summation order differs from XLA's conv emitter by the usual +-1-ulp
class (CLAUDE.md tolerance invariant), gated by the IoU goldens and
``bench --parity``.

Reference behavior: this replaces the TFLite interpreter invoke of
lib/libbackscrub.cc:307 for the body section only; op semantics match
the individual lowerings in ops/{conv,pool,misc,elementwise}.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import tflite_same_padding
from .misc import resize_matrix

SUPPORTED = {
    "CONV_2D", "DEPTHWISE_CONV_2D", "FULLY_CONNECTED", "AVERAGE_POOL_2D",
    "ADD", "MUL", "RELU", "RELU6", "HARD_SWISH", "LOGISTIC",
    "RESIZE_BILINEAR", "CONCATENATION",
}

# fused-activation kinds the kernel implements (_act_fn); anything else in
# a node's options must reject the span at build time, not crash at trace
ACTIVATIONS = {None, "NONE", "RELU", "RELU6", "HARD_SWISH", "LOGISTIC"}


@dataclasses.dataclass
class _T:
    """Rowpad metadata for one live tensor inside the kernel."""
    c: int
    rows: int
    w: int
    sp: int          # column lane spacing
    vec: bool = False  # (c, 1) pooled vector


def _act_fn(kind):
    if kind in (None, "NONE"):
        return lambda x: x
    if kind == "RELU":
        return jax.nn.relu
    if kind == "RELU6":
        return lambda x: jnp.clip(x, 0.0, 6.0)
    if kind == "HARD_SWISH":
        return lambda x: x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)
    if kind == "LOGISTIC":
        return jax.nn.sigmoid
    raise KeyError(kind)


class Unsupported(Exception):
    pass


def _grid_mask(meta: _T, rs: int) -> np.ndarray:
    """(1, rows*RS) 0/1 mask of populated lane positions."""
    m = np.zeros((1, meta.rows * rs), np.float32)
    for i in range(meta.rows):
        for j in range(meta.w):
            m[0, i * rs + j * meta.sp] = 1.0
    return m


def _col_resize_terms(a_w: np.ndarray, sp_out: int, sp_in: int, rows: int,
                      rs: int):
    """Group the column interpolation matrix by lane delta.

    Returns [(delta, coefvec(1, rows*RS))]: out_lane = j'*sp_out receives
    sum over j of A[j', j] * in[lane j*sp_in]; delta = sp_out*j' - sp_in*j.
    """
    terms: Dict[int, np.ndarray] = {}
    for jp in range(a_w.shape[0]):
        for j in np.nonzero(a_w[jp])[0]:
            d = sp_out * jp - sp_in * int(j)
            cv = terms.setdefault(d, np.zeros((1, rows * rs), np.float32))
            for i in range(rows):
                cv[0, i * rs + jp * sp_out] += a_w[jp, j]
    return sorted(terms.items())


class BodyMega:
    """Compiles nodes[start:end] of a model's folded graph into one Pallas
    kernel (or an equivalent plain-jnp function in interpret mode).

    ``__call__(x)`` takes the rowpad input (..., C, rows*RS) f32 and
    returns the rowpad output (..., C_out, rows_out*RS).
    """

    def __init__(self, model, start: int, end: int, in_tid: int,
                 out_tid: int, *, interpret: bool = False,
                 allow_spaced_output: bool = False, flat: bool = False):
        g = model.graph
        self.model = model
        self.interpret = interpret
        self.in_tid, self.out_tid = in_tid, out_tid
        self.allow_spaced_output = allow_spaced_output
        self.flat = flat
        hp = model.host_params
        if hp is None:
            raise Unsupported("model has no host params")

        def nhwc_meta(tid) -> _T:
            s = tuple(g.tensor(tid).shape)
            if len(s) != 4 or s[0] != 1:
                raise Unsupported(f"tensor {tid} shape {s}")
            return _T(c=int(s[3]), rows=int(s[1]), w=int(s[2]), sp=1,
                      vec=(s[1] == 1 and s[2] == 1))

        in_meta = nhwc_meta(in_tid)
        if flat:
            # FLAT layout (round 5): RS = row width exactly — spatial is
            # densely packed (c, rows*w), no pad lanes.  Built for the
            # post-prefix-cut 33x33 regime where the classic RS=128 rowpad
            # wastes 3.9x of every lane (and 3.9x of every MXU dot MAC —
            # the measured reason the round-4 continuation chain lost,
            # PERF.md round 5).  SAME zero padding can no longer lean on
            # zeroed pad lanes: row reach still uses explicit zero row
            # padding, and column taps get per-tap 0/1 boundary masks
            # (a dx-shift past a row's edge reads the next row's pixel —
            # the mask kills exactly those lanes).  Geometry-changing ops
            # (stride-2, 2x resize) are rejected: they would need lane
            # gathers/re-strides that Mosaic cannot do.
            self.rs = in_meta.w
        else:
            # row stride: smallest power-of-two lane count fitting the
            # widest row plus the depthwise reach (taps must not cross
            # row blocks)
            margin = 8  # max dj*sp reach (5x5 at sp<=4, 3x3 at sp<=8)
            self.rs = 128 if in_meta.w + margin <= 128 else 256
            if in_meta.w + margin > 256:
                raise Unsupported(f"row width {in_meta.w} too large")
        rs = self.rs

        self.meta: Dict[int, _T] = {in_tid: in_meta}
        self.plan: List[tuple] = []      # (op, ...) executed in order
        self.weights: List[np.ndarray] = []   # kernel operands, in order
        self._wcache: Dict[Tuple, int] = {}

        def wref(arr: np.ndarray, key=None) -> int:
            if key is not None and key in self._wcache:
                return self._wcache[key]
            self.weights.append(np.ascontiguousarray(arr, np.float32))
            idx = len(self.weights) - 1
            if key is not None:
                self._wcache[key] = idx
            return idx

        def mask_ref(meta: _T) -> int:
            if flat and not meta.vec and meta.w == rs and meta.sp == 1:
                # dense layout: every lane is populated — the grid mask is
                # all-ones and the re-zero multiply is pure waste (SAME
                # padding zeros come from the explicit DW row pads +
                # column-boundary masks instead)
                return -1
            return wref(_grid_mask(meta, rs), ("mask", meta.rows, meta.w,
                                               meta.sp))

        def hparam(tid, variant):
            key = f"t{tid}@{variant}"
            if key not in hp:
                raise Unsupported(f"missing host param {key}")
            return np.asarray(hp[key], np.float32)

        def bias_of(node):
            if len(node.inputs) > 2 and node.inputs[2] >= 0:
                b = hp.get(f"t{node.inputs[2]}")
                if b is None:
                    raise Unsupported("missing bias")
                return np.asarray(b, np.float32)
            return None

        def inmeta(tid) -> _T:
            # constants and tensors produced outside the span never enter
            # self.meta — reject the span instead of KeyError-ing
            if tid not in self.meta:
                raise Unsupported(f"operand t{tid} not produced in-span")
            return self.meta[tid]

        def act_of(o) -> str:
            a = o.get("activation", "NONE")
            if a not in ACTIVATIONS:
                raise Unsupported(f"fused activation {a}")
            return a or "NONE"

        for node in g.nodes[start:end]:
            k = node.kind
            if k not in SUPPORTED:
                raise Unsupported(k)
            o = node.options
            out = node.outputs[0]
            if k == "CONV_2D":
                m = inmeta(node.inputs[0])
                w = hparam(node.inputs[1], "hwio")  # (fh, fw, ci, co)
                if w.shape[:2] != (1, 1) or o.get("stride_h", 1) != 1 \
                        or o.get("stride_w", 1) != 1:
                    raise Unsupported("non-1x1 body conv")
                b = bias_of(node)
                co = w.shape[3]
                wi = wref(w[0, 0].T)                       # (co, ci)
                bi = wref((b if b is not None
                           else np.zeros(co)).reshape(co, 1))
                om = (_T(co, 1, 1, 1, vec=True) if m.vec
                      else _T(co, m.rows, m.w, m.sp))
                mi = -1 if m.vec else mask_ref(om)
                self.plan.append(("conv1x1", node.inputs[0], out, wi, bi,
                                  act_of(o), mi))
                self.meta[out] = om
            elif k == "DEPTHWISE_CONV_2D":
                m = inmeta(node.inputs[0])
                if o.get("depth_multiplier", 1) != 1 or m.vec \
                        or o.get("padding") != "SAME":
                    raise Unsupported("dw variant")
                dil = o.get("dilation_h", 1)
                if o.get("dilation_w", 1) != dil:
                    raise Unsupported("anisotropic dw dilation")
                w = hparam(node.inputs[1], "dw")   # (fh, fw, 1, C)
                fh, fw = w.shape[0], w.shape[1]
                s = o.get("stride_h", 1)
                if o.get("stride_w", 1) != s or s not in (1, 2):
                    raise Unsupported("dw stride")
                if dil != 1 and s != 1:
                    # atrous DWs in the bundled graphs are all stride 1
                    # (deeplab/bodypix 33x33 stages); a dilated stride-2
                    # would need its own output-grid math — reject
                    raise Unsupported("dilated strided dw")
                if flat and s != 1:
                    # stride-2 output would need column compaction — an
                    # intra-row lane gather the dense layout cannot express
                    raise Unsupported("flat dw stride")
                if not flat and m.w * m.sp + (fw - 1) * m.sp * dil > rs:
                    raise Unsupported("dw column reach exceeds row stride")
                b = bias_of(node)
                wi = wref(w[:, :, 0, :].reshape(fh * fw, m.c).T)  # (C, taps)
                bi = wref((b if b is not None
                           else np.zeros(m.c)).reshape(m.c, 1))
                plo_h = tflite_same_padding(m.rows, fh, s, dil)[0]
                plo_w = tflite_same_padding(m.w, fw, s, dil)[0]
                cm = None
                if flat:
                    # per-column-tap validity over the row-padded canvas:
                    # after the dj = (tj*dil - plo_w) lane shift, position
                    # (row, j) holds the neighbor row's pixel whenever
                    # j + dj leaves [0, w) — zero exactly those lanes
                    # (they are SAME zero padding).  Periodic in w with
                    # whole-row padding, so one tiled vector per tap.
                    padded_rows = m.rows + (fh - 1) * dil
                    refs = []
                    for tj in range(fw):
                        djc = tj * dil - plo_w
                        if djc == 0:  # own column — always valid
                            refs.append(-1)
                            continue
                        rowm = np.zeros(rs, np.float32)
                        j = np.arange(m.w)
                        rowm[j[(j + djc >= 0) & (j + djc < m.w)]] = 1.0
                        refs.append(wref(
                            np.tile(rowm, padded_rows)[None, :],
                            ("colmask", padded_rows, m.w, djc)))
                    cm = tuple(refs)
                if s == 1:
                    om = _T(m.c, m.rows, m.w, m.sp)
                else:
                    om = _T(m.c, -(-m.rows // 2), -(-m.w // 2), m.sp * 2)
                self.plan.append((
                    "dw", node.inputs[0], out, wi, bi, fh, fw, s, dil,
                    plo_h, plo_w, act_of(o), mask_ref(om), cm))
                self.meta[out] = om
            elif k == "FULLY_CONNECTED":
                m = inmeta(node.inputs[0])
                if not m.vec:
                    raise Unsupported("FC on spatial tensor")
                w = hparam(node.inputs[1], "ko")   # (K, O)
                b = bias_of(node)
                co = w.shape[1]
                wi = wref(w.T)                     # (O, K)
                bi = wref((b if b is not None
                           else np.zeros(co)).reshape(co, 1))
                self.plan.append(("conv1x1", node.inputs[0], out, wi, bi,
                                  act_of(o), -1))
                self.meta[out] = _T(co, 1, 1, 1, vec=True)
            elif k == "AVERAGE_POOL_2D":
                m = inmeta(node.inputs[0])
                if m.vec or o.get("padding") != "VALID" \
                        or (o.get("filter_h"), o.get("filter_w")) != (m.rows, m.w):
                    raise Unsupported("non-global pool")
                self.plan.append(("gpool", node.inputs[0], out,
                                  mask_ref(m), 1.0 / (m.rows * m.w),
                                  act_of(o)))
                self.meta[out] = _T(m.c, 1, 1, 1, vec=True)
            elif k in ("ADD", "MUL"):
                a, bb = node.inputs[0], node.inputs[1]
                ma, mb = inmeta(a), inmeta(bb)
                act = act_of(o)
                if ma.vec and not mb.vec:
                    a, bb, ma, mb = bb, a, mb, ma
                if mb.vec and not ma.vec:
                    if mb.c != ma.c:
                        raise Unsupported("broadcast channel mismatch")
                    # a broadcast ADD (and any non-NONE activation) writes
                    # the vector's value into the pad lanes — re-mask to
                    # keep the rowpad zero invariant for DW/pool consumers
                    mi = (mask_ref(ma) if k == "ADD" or act != "NONE"
                          else -1)
                    self.plan.append(("bingate", k, a, bb, out, act, mi))
                    self.meta[out] = ma
                elif (ma.c, ma.rows, ma.w, ma.sp, ma.vec) == \
                        (mb.c, mb.rows, mb.w, mb.sp, mb.vec):
                    self.plan.append(("binop", k, a, bb, out, act))
                    self.meta[out] = ma
                else:
                    raise Unsupported("binary shape mismatch")
            elif k in ("RELU", "RELU6", "HARD_SWISH", "LOGISTIC"):
                m = inmeta(node.inputs[0])
                if k == "LOGISTIC" and not m.vec:
                    raise Unsupported("spatial logistic (breaks pad zeros)")
                self.plan.append(("act", k, node.inputs[0], out))
                self.meta[out] = m
            elif k == "CONCATENATION":
                axis = o.get("axis", -1)
                if axis not in (-1, 3) or act_of(o) != "NONE":
                    raise Unsupported("concat axis")
                ms = [inmeta(i) for i in node.inputs]
                if any(m.vec for m in ms) or len({(m.rows, m.w, m.sp)
                                                  for m in ms}) != 1:
                    raise Unsupported("concat operands")
                if any(m.c % 8 for m in ms[:-1]):
                    raise Unsupported("concat channel alignment")
                self.plan.append(("concat", tuple(node.inputs), out))
                self.meta[out] = _T(sum(m.c for m in ms), ms[0].rows,
                                    ms[0].w, ms[0].sp)
            elif k == "RESIZE_BILINEAR":
                m = inmeta(node.inputs[0])
                size = g.tensor(node.inputs[1]).data
                if size is None:
                    raise Unsupported("dynamic resize size")
                oh, ow = int(size.reshape(-1)[0]), int(size.reshape(-1)[1])
                if m.vec:
                    # 1x1 -> NxN bilinear is a constant broadcast (deeplab
                    # ASPP image-pooling branch, node 63): write the (c,1)
                    # vector to every populated grid lane.  Output spacing
                    # follows any existing spatial meta of the same dims
                    # (the concat consumer requires matching sp).
                    sps = {mm.sp for mm in self.meta.values()
                           if not mm.vec and (mm.rows, mm.w) == (oh, ow)}
                    om = _T(m.c, oh, ow, sps.pop() if len(sps) == 1 else 1)
                    self.plan.append(("bcast", node.inputs[0], out,
                                      mask_ref(om)))
                    self.meta[out] = om
                    continue
                if (oh, ow) == (m.rows, m.w):
                    # same-size resize: identity iff the interpolation
                    # matrices are exact identities (deeplab node 68,
                    # align_corners 33->33)
                    ac = o.get("align_corners", False)
                    hpc = o.get("half_pixel_centers", False)
                    if (np.array_equal(resize_matrix(m.rows, oh, ac, hpc),
                                       np.eye(m.rows, dtype=np.float32))
                            and np.array_equal(
                                resize_matrix(m.w, ow, ac, hpc),
                                np.eye(m.w, dtype=np.float32))):
                        self.plan.append(("act", "NONE", node.inputs[0], out))
                        self.meta[out] = m
                        continue
                    raise Unsupported("same-size non-identity resize")
                if flat:
                    # a geometry-changing resize re-strides every row —
                    # impossible in the dense layout without lane gathers
                    raise Unsupported("flat geometry-changing resize")
                if (oh, ow) != (2 * m.rows, 2 * m.w) or m.sp % 2:
                    raise Unsupported("non-2x resize")
                ac = o.get("align_corners", False)
                hpc = o.get("half_pixel_centers", False)
                a_h = resize_matrix(m.rows, oh, ac, hpc)
                a_w = resize_matrix(m.w, ow, ac, hpc)
                om = _T(m.c, oh, ow, m.sp // 2)
                terms = _col_resize_terms(a_w, om.sp, m.sp, m.rows, rs)
                if len(terms) > 6:
                    raise Unsupported("resize tap spread")
                tids = tuple((d, wref(cv)) for d, cv in terms)
                # row assembly: per output row block, <=2 (row, coef) taps
                rowtaps = tuple(
                    tuple((int(r), float(a_h[rp, r]))
                          for r in np.nonzero(a_h[rp])[0])
                    for rp in range(oh))
                if any(len(t) > 2 for t in rowtaps):
                    raise Unsupported("resize row taps")
                self.plan.append(("resize2x", node.inputs[0], out, tids,
                                  rowtaps, mask_ref(om)))
                self.meta[out] = om
            else:  # pragma: no cover
                raise Unsupported(k)

        if flat:
            # defense in depth: every spatial tensor must keep the dense
            # (rows, w=rs, sp=1) geometry — the rejections above should
            # make this unreachable
            for mm in self.meta.values():
                if not mm.vec and (mm.w != rs or mm.sp != 1):
                    raise Unsupported("flat span geometry change")
        if out_tid not in self.meta:
            raise Unsupported("output tensor not produced by span")
        self.out_meta = self.meta[out_tid]
        if self.out_meta.vec:
            raise Unsupported("span output is a pooled vector")
        if self.out_meta.sp != 1 and not allow_spaced_output:
            # consumers (the edge tail) read columns at lane j — an output
            # left at a coarser spacing would silently interleave zeros.
            # Prefix spans (body_mega_prefix_for) opt out: their consumer
            # is the rowpad->NHWC bridge, which slices lanes at sp.
            raise Unsupported("unbalanced strides: output spacing != 1")
        self.in_meta = in_meta
        # scratch buffers for resize row assembly (kernel mode)
        self._resize_scratch = [
            pltpu.VMEM((self.meta[p[2]].c, self.meta[p[2]].rows * rs),
                       jnp.float32)
            for p in self.plan if p[0] == "resize2x"]

    # -- execution ---------------------------------------------------------

    def _run_plan(self, x, ws, scratches):
        """Shared value-level interpreter of the plan.  ``scratches`` is a
        list of VMEM refs (kernel mode) or None (interpret: uses concat)."""
        rs = self.rs
        env = {self.in_tid: x}
        prec = self.model.precision_setting
        dot3 = False
        if prec == jax.lax.Precision.HIGH:
            # Mosaic's dot lowering implements DEFAULT and HIGHEST only
            # ("Unsupported dot precision: HIGH").  Prefix/full spans keep
            # their dot operands small (C<=72 / the segm bodies), so the
            # HIGHEST upgrade costs ~1 us and is strictly more precise.
            # FLAT spans are the 33x33 C>=96 regime where dots are the
            # MXU bill — emulate the model's own 3-pass bf16x3 HIGH
            # exactly (hi/lo split, drop lo*lo) instead of paying
            # HIGHEST's 6 passes: same numerics class as the XLA body
            # this kernel replaces.
            if self.flat:
                dot3 = True
            prec = jax.lax.Precision.HIGHEST
        # Interpret mode runs on CPU, where DEFAULT-precision dots compute
        # in full f32; the real MXU truncates f32 inputs to bf16 at
        # DEFAULT.  Simulate that input rounding so interpret-mode
        # accuracy gates see the on-device numerics (they were optimistic
        # before: the bf16 megakernel gate never exercised the truncation).
        if self.interpret and prec not in (jax.lax.Precision.HIGHEST,
                                           jax.lax.Precision.HIGH):
            def dot_in(a):
                return a.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            def dot_in(a):
                return a
        dims = (((1,), (0,)), ((), ()))

        def do_dot(a, b):
            if dot3:
                # XLA's HIGH: a = ah + al, b = bh + bl (bf16 splits);
                # ah@bh + ah@bl + al@bh, each a single native bf16 MXU
                # pass with f32 accumulation; the lo*lo term is dropped
                ah = a.astype(jnp.bfloat16)
                al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
                bh = b.astype(jnp.bfloat16)
                bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

                def d(u, v):
                    return jax.lax.dot_general(
                        u, v, dims, precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
                return d(ah, bh) + d(ah, bl) + d(al, bh)
            return jax.lax.dot_general(
                dot_in(a), dot_in(b), dims,
                precision=prec, preferred_element_type=jnp.float32)

        si = 0
        for p in self.plan:
            op = p[0]
            if op == "conv1x1":
                _, tin, tout, wi, bi, act, mi = p
                y = do_dot(ws[wi], env[tin])
                y = _act_fn(act)(y + ws[bi])
                if mi >= 0:
                    y = y * ws[mi]
                env[tout] = y
            elif op == "dw":
                (_, tin, tout, wi, bi, fh, fw, s, dil, plo_h, plo_w, act,
                 mi, cm) = p
                m = self.meta[tin]
                om = self.meta[tout]
                L = m.rows * rs
                x0 = env[tin]
                w = ws[wi]
                # row reach spans (fh-1)*dil rows at dilation dil; padded
                # rows are zero, matching SAME zero padding exactly
                hi_r = (fh - 1) * dil - plo_h
                xp = jnp.pad(x0, ((0, 0), (plo_h * rs, hi_r * rs)))
                acc = None
                for tj in range(fw):
                    dj = (tj * dil - plo_w) * m.sp
                    n = xp.shape[1]
                    if dj > 0:
                        sh = jnp.pad(xp[:, dj:], ((0, 0), (0, dj)))
                    elif dj < 0:
                        sh = jnp.pad(xp[:, :n + dj], ((0, 0), (-dj, 0)))
                    else:
                        sh = xp
                    if cm is not None and cm[tj] >= 0:
                        # flat layout: zero the lanes whose shifted source
                        # column fell off the row (SAME zero padding)
                        sh = sh * ws[cm[tj]]
                    for ti in range(fh):
                        off = ti * dil * rs
                        tap = sh[:, off:off + L]
                        t = ti * fw + tj
                        term = tap * w[:, t:t + 1]
                        acc = term if acc is None else acc + term
                if s == 2:
                    # keep even rows (value already on the coarser column
                    # grid); assemble via aligned block slices
                    acc = jnp.concatenate(
                        [acc[:, (2 * r) * rs:(2 * r + 1) * rs]
                         for r in range(om.rows)], axis=1)
                y = _act_fn(act)(acc + ws[bi])
                if mi >= 0:
                    y = y * ws[mi]
                env[tout] = y
            elif op == "gpool":
                _, tin, tout, mi, inv, act = p
                xg = env[tin] if mi < 0 else env[tin] * ws[mi]
                y = jnp.sum(xg, axis=1, keepdims=True) * inv
                env[tout] = _act_fn(act)(y)
            elif op == "binop":
                _, k, a, b, tout, act = p
                f = jnp.add if k == "ADD" else jnp.multiply
                env[tout] = _act_fn(act)(f(env[a], env[b]))
            elif op == "bingate":
                _, k, a, b, tout, act, mi = p
                f = jnp.add if k == "ADD" else jnp.multiply
                y = _act_fn(act)(f(env[a], env[b]))  # (c,1) broadcast
                if mi >= 0:  # ADD/activation leaked into pad lanes
                    y = y * ws[mi]
                env[tout] = y
            elif op == "act":
                _, k, tin, tout = p
                env[tout] = _act_fn(k)(env[tin])
            elif op == "bcast":
                _, tin, tout, mi = p
                # (c, 1) vector -> constant over the populated grid lanes
                if mi >= 0:
                    env[tout] = env[tin] * ws[mi]
                else:  # dense layout: every lane populated
                    om = self.meta[tout]
                    env[tout] = jnp.broadcast_to(
                        env[tin], (om.c, om.rows * rs))
            elif op == "concat":
                _, tins, tout = p
                env[tout] = jnp.concatenate([env[t] for t in tins], axis=0)
            elif op == "resize2x":
                _, tin, tout, tids, rowtaps, mi = p
                m, om = self.meta[tin], self.meta[tout]
                L = m.rows * rs
                x0 = env[tin]
                # columns: shift + coefvec FMA on the input row structure
                cr = None
                for d, ci in tids:
                    if d > 0:
                        sh = jnp.pad(x0[:, :L - d], ((0, 0), (d, 0)))
                    elif d < 0:
                        sh = jnp.pad(x0[:, -d:], ((0, 0), (0, -d)))
                    else:
                        sh = x0
                    term = sh * ws[ci]
                    cr = term if cr is None else cr + term
                # rows: assemble each output block from <=2 input blocks
                pieces = []
                for rp, taps in enumerate(rowtaps):
                    pc = None
                    for (r, a) in taps:
                        blk = cr[:, r * rs:(r + 1) * rs] * np.float32(a)
                        pc = blk if pc is None else pc + blk
                    pieces.append(pc)
                if scratches is None:
                    y = jnp.concatenate(pieces, axis=1)
                else:
                    ref = scratches[si]
                    for rp, pc in enumerate(pieces):
                        ref[:, rp * rs:(rp + 1) * rs] = pc
                    y = ref[...]
                si += 1
                env[tout] = y * ws[mi]
            else:  # pragma: no cover
                raise AssertionError(op)
        return env[self.out_tid]

    def _kernel(self, x_ref, *refs):
        n_w = len(self.weights)
        ws = [refs[i][...] for i in range(n_w)]
        out_ref = refs[n_w]
        scratches = list(refs[n_w + 1:])
        out_ref[...] = self._run_plan(x_ref[0], ws, scratches)[None]

    def __call__(self, x):
        """x: (..., C, rows*RS) f32 rowpad -> (..., C_out, out_rows*RS)."""
        rs = self.rs
        lead = x.shape[:-2]
        xn = x.reshape((-1,) + x.shape[-2:])
        n = xn.shape[0]
        om = self.out_meta
        oshape = (n, om.c, om.rows * rs)
        if self.interpret:
            def one(xi):
                return self._run_plan(xi, self.weights, None)
            out = jax.vmap(one)(xn.astype(jnp.float32))
        else:
            out = pl.pallas_call(
                self._kernel,
                grid=(n,),
                in_specs=[pl.BlockSpec((1,) + xn.shape[1:],
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)] +
                         [pl.BlockSpec(w.shape, functools.partial(
                             lambda nd, i: (0,) * nd, w.ndim),
                             memory_space=pltpu.VMEM)
                          for w in self.weights],
                out_specs=pl.BlockSpec((1,) + oshape[1:],
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
                scratch_shapes=self._resize_scratch,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xn.astype(jnp.float32), *self.weights)
        return out.reshape(lead + oshape[1:])


def body_mega_for(model, info, *, interpret: bool = False) -> Optional[BodyMega]:
    """Build a BodyMega for the edge span if the graph qualifies, else None.

    Requires both fused edge layers (the rowpad bridge assumes the front
    kernel feeds it and the tail dot consumes it)."""
    if not (info.front_ok and info.tail_ok):
        return None
    # Defense in depth: the kernel casts host params straight to f32 and
    # would silently skip an int8 weight's __scale dequant.  MaskGen never
    # routes quantized models here (edge_applicable gates on quantize), but
    # a direct EdgeFused construction has no such guard.
    if getattr(model, "quantize_mode", None):
        return None
    # bf16 mode runs the same f32-storage kernel: its dots execute at the
    # model's precision setting (DEFAULT = one bf16 MXU pass, exactly the
    # bf16 body's matmul class) while elementwise ops stay f32 VPU — at
    # least as precise as the XLA bf16 body it replaces, and faster
    # (dots drop from HIGHEST's 6 passes to 1).
    try:
        mega = BodyMega(model, info.body_start, info.body_end,
                        info.body_in_tensor, info.body_out_tensor,
                        interpret=interpret)
    except Unsupported:
        return None
    # the tail dot consumes (K, xh, xw) at unit spacing
    oh, ow = model.output_shape[1:3]
    if (mega.out_meta.rows, mega.out_meta.w) != (oh // 2, ow // 2):
        return None
    return mega


def body_mega_prefix_for(model, info, *, interpret: bool = False,
                         min_nodes: int = 4):
    """Build a BodyMega over the longest qualifying PREFIX of the body span.

    For the front-only families (deeplab/bodypix — fused front, no
    kernel==stride tail), the early body is the tiny-minor-dim zone: the
    129x129/65x65 stages at C<=72 live in lane-padded NHWC tiles and XLA
    surrounds them with relayout copies (17 us chw->NHWC at the front
    exit + 23-25 us around the early depthwise convs per the round-4
    roofline traces), while the 33x33 C>=96 stages run near the MXU roof
    under XLA (rowpad lane spacing would *double* their dot work —
    measured reasoning in PERF.md).  So: run [body_start, cut) in one
    rowpad Pallas program and hand the cut tensor to the standard
    lowerings, choosing ``cut`` as the last point before the
    MXU-friendly regime (output c >= 96 at rows <= 33) such that exactly
    one in-span tensor crosses the cut.

    Returns (mega, cut_node_index, cut_tid) or None.  The caller bridges
    the spaced rowpad output to NHWC (lane slice at sp + transpose).
    """
    if not info.front_ok or getattr(model, "quantize_mode", None):
        return None
    g = model.graph
    nodes = g.nodes
    start = info.body_start
    end = start
    for i in range(start, info.body_end):
        node = nodes[i]
        if node.kind not in SUPPORTED:
            break
        s = g.tensor(node.outputs[0]).shape
        if s is None or len(s) != 4:
            break
        _, h, _, c = s
        if c >= 96 and h <= 33:
            break
        end = i + 1
    # everything defined at/before the cut within the span scope — the
    # span INPUT counts too: segm-family decoders skip-connect back to it,
    # and a remainder referencing it alongside cut_tid would read a tensor
    # the bridge never materialises (r4 bug: h_swish #4 "referenced before
    # definition" under refine=guided front-only mode)
    produced = {info.body_in_tensor}
    for n in nodes[start:end]:
        produced.update(n.outputs)
    while end - start >= min_nodes:
        crossing = set()
        for n in nodes[end:info.body_end]:
            for t in n.inputs:
                if t in produced:
                    crossing.add(t)
        if len(crossing) == 1:
            cut_tid = crossing.pop()
            try:
                mega = BodyMega(model, start, end, info.body_in_tensor,
                                cut_tid, interpret=interpret,
                                allow_spaced_output=True)
                return mega, end, cut_tid
            except Unsupported:
                pass
        end -= 1
        produced.difference_update(nodes[end].outputs)
    return None


def _span_vmem_estimate(g, nodes, start: int, end: int, rs: int) -> int:
    """Pessimistic all-live VMEM estimate of a span's kernel: every spatial
    intermediate at (c, rows*rs) f32 plus the weight operands.  Mosaic does
    not reliably free unrolled temporaries (CLAUDE.md round-3 lesson), so
    chunking decisions assume nothing is freed."""
    total = 0
    for n in nodes[start:end]:
        s = g.tensor(n.outputs[0]).shape
        if s and len(s) == 4 and (s[1] > 1 or s[2] > 1):
            total += int(s[3]) * int(s[1]) * rs * 4
        for t in n.inputs[1:]:
            d = g.tensor(t) if t >= 0 else None
            if d is not None and d.shape:
                total += int(np.prod(d.shape)) * 4
    return total


def body_mega_continuation_for(model, info, start: int, in_tid: int, *,
                               interpret: bool = False,
                               budget_bytes: int = 40 * 2**20):
    """Chain of FLAT-layout megakernels over the body span after the
    prefix cut (the 33x33 regime the prefix deliberately leaves to XLA).

    The round-4 rooflines showed that regime is NOT near any roof under
    XLA: deeplab's post-cut body traces 163 us of convolutions (three
    dilation-4 480-channel DWs at ~12.5 us each) plus ~50 us of relu6/
    layout copies; bodypix 63 + 51 us.  A first attempt ran it as
    compact-spacing rowpad (RS=128) kernels and LOST (deeplab 409 vs
    334 us, bodypix 305 vs 207): 33-wide rows use 33/128 of every lane,
    so every MXU dot does 3.9x the MACs and every VPU op 3.9x the work.
    The flat layout (BodyMega(flat=True), RS = row width, dense
    (c, rows*33) spatial with per-tap column-boundary masks) removes
    that multiplier: 1x1 convs are (co,ci)@(ci,1089) dots at 94% lane
    occupancy, dilated DWs are 9 masked shift-FMAs, and the whole span
    stays VMEM-resident.  The chain is split at single-crossing
    boundaries whenever the pessimistic all-live VMEM estimate exceeds
    ``budget_bytes``; consecutive links pass the dense rowpad directly —
    the inter-kernel boundary is HBM traffic only.

    Returns (megas, end_node, out_tid) or None.  The caller bridges the
    prefix's spaced rowpad output to the dense layout (lane slice at sp;
    the pad-to-RS is a no-op at RS=w) and the final output to NHWC.
    """
    if getattr(model, "quantize_mode", None):
        return None
    g = model.graph
    nodes = g.nodes
    in_shape = g.tensor(in_tid).shape
    rs_est = int(in_shape[2]) if in_shape and len(in_shape) == 4 else 128
    megas: List[BodyMega] = []
    cur, cur_in = start, in_tid
    while cur < info.body_end:
        far = cur
        for i in range(cur, info.body_end):
            n = nodes[i]
            if n.kind not in SUPPORTED:
                break
            s = g.tensor(n.outputs[0]).shape
            if s is None or len(s) != 4:
                break
            far = i + 1
        if far == cur:
            break
        produced = {cur_in}
        for n in nodes[cur:far]:
            produced.update(n.outputs)
        end = far
        built = None
        min_nodes = 4 if not megas else 1
        while end - cur >= min_nodes:
            crossing = set()
            for n in nodes[end:info.body_end]:
                for t in n.inputs:
                    if t in produced:
                        crossing.add(t)
            if end == info.body_end and info.body_out_tensor in produced:
                crossing.add(info.body_out_tensor)
            if (len(crossing) == 1
                    and _span_vmem_estimate(g, nodes, cur, end,
                                            rs_est) <= budget_bytes):
                tid = next(iter(crossing))
                try:
                    built = (BodyMega(model, cur, end, cur_in, tid,
                                      interpret=interpret, flat=True),
                             end, tid)
                    break
                except Unsupported:
                    pass
            end -= 1
            produced.difference_update(nodes[end].outputs)
        if built is None:
            break
        megas.append(built[0])
        cur, cur_in = built[1], built[2]
    if not megas:
        return None
    return megas, cur, cur_in
