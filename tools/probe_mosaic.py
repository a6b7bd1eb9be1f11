"""Mosaic capability/cost probes behind the megakernel design decisions.

Each probe compiles a tiny Pallas kernel on the real TPU, checks it
against numpy, and scan-times it (the same anti-tunnel-fraud harness as
bench.py, small form).  Run: ``python tools/probe_mosaic.py``.

Measured results (v5e, this container, 2026-08) that shaped
``ops/megakernel.py`` and ``pipeline/edge.py``:

  dw_flat_lane_shifts_9tap   ok   6.35 us   flat (c,hw): misaligned lane
                                            shifts are the dominant cost
  dw_3d_sublane_lane_shifts  ok   2.01 us   3D (c,h,w) shifts are cheaper
  dw_padded_rows_9tap        ok   3.02 us   rowpad: row taps tile-aligned,
                                            only dj=+-1 shifts misaligned
  dot_w_cihw (DEFAULT)       ok   0.11 us   weight-stationary MXU dot
  dot_highest                ok   0.51 us   6-pass f32 fidelity
  se_pool_fc_gate            ok   2.04 us   lane reduce + tiny dot + gate
  sublane_concat             ok   0.55 us   channel concat rides sublanes
  pltpu_roll_lane1           ok   1.93 us   roll is not cheaper than slice
  sublane_stride2_slice      ok   8.91 us   legal but slow — avoid
  lane_shift1_6144 (misaligned OUT shape)  5.67 us  slice to aligned
                                            output widths or pay 3-5x
  lane_stride2 / lane_stride2_6144         DOES NOT COMPILE (the
            intra-tile lane gather; why stride-2 must stay mask-only)
  einsum_3d_rhs ("oc,chw->ohw")            DOES NOT COMPILE (no 3D dots)
  reshape (C,H,W)->(C,HW) in-kernel        DOES NOT COMPILE
  jnp.pad widening (48,80)->(48,128)       CRASHES MOSAIC (lane-
            misaligned tpu.concatenate) — use a 0/1 embedding matmul
"""

import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from backscrub_tpu.models.specs import install_default_search_roots
install_default_search_roots()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=400):
    def make(K):
        @jax.jit
        def many(*a):
            def body(acc, i):
                o = fn(a[0] + (acc * 1e-12).astype(a[0].dtype), *a[1:])
                return acc + o.astype(jnp.float32).sum(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return acc
        return many
    s, b = make(10), make(iters)
    float(s(*args)), float(b(*args))
    est = []
    for _ in range(6):
        t0 = time.perf_counter(); float(s(*args)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(b(*args)); tb = time.perf_counter() - t0
        e = (tb - ts) / (iters - 10) * 1e6
        if e > 0:
            est.append(e)
        if len(est) >= 3:
            break
    return min(est) if est else float("nan")


def run(name, fn, args, ref=None, atol=1e-4):
    try:
        out = np.asarray(jax.jit(fn)(*args))
        ok = (np.allclose(out, ref, atol=atol, rtol=1e-4)
              if ref is not None else True)
        print(f"{name}: ok={ok} {timeit(fn, *args):.2f} us")
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:140]}")


def main():
    rng = np.random.default_rng(0)
    C, H, W = 16, 48, 80
    HW = H * W
    x2 = jnp.asarray(rng.random((C, HW), np.float32))
    x3 = jnp.asarray(rng.random((C, H, W), np.float32))
    w16 = jnp.asarray(rng.random((C, C), np.float32))

    # flat-layout DW: 9 misaligned lane shifts
    def k_dw_flat(xp_ref, o_ref):
        xp = xp_ref[...]
        acc = jnp.zeros((C, HW), jnp.float32)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                s = 2 * W + di * W + dj
                acc = acc + xp[:, s:s + HW] * (0.1 + di + 2 * dj)
        o_ref[...] = acc
    xpad = jnp.pad(x2, ((0, 0), (2 * W, 2 * W)))
    xr = np.asarray(xpad)
    ref = sum(xr[:, 2 * W + di * W + dj:2 * W + di * W + dj + HW]
              * (0.1 + di + 2 * dj) for di in (-1, 0, 1) for dj in (-1, 0, 1))
    run("dw_flat_lane_shifts_9tap",
        lambda xp: pl.pallas_call(k_dw_flat, out_shape=jax.ShapeDtypeStruct(
            (C, HW), jnp.float32))(xp), (xpad,), ref)

    # rowpad-layout DW: row taps tile-aligned, 2 misaligned dj shifts
    HP = H * 128
    xp = np.zeros((C, (H + 2) * 128), np.float32)
    x3n = np.asarray(x3)
    for i in range(H):
        xp[:, (i + 1) * 128:(i + 1) * 128 + W] = x3n[:, i, :]
    xpj = jnp.asarray(xp)

    def k_dwp(xp_ref, o_ref):
        xpv = xp_ref[...]
        n = xpv.shape[1]
        xm = jnp.pad(xpv[:, 1:], ((0, 0), (0, 1)))
        xpl = jnp.pad(xpv[:, :n - 1], ((0, 0), (1, 0)))
        acc = jnp.zeros((C, HP), jnp.float32)
        for di in (0, 1, 2):
            base = di * 128
            for dj, src in ((-1, xpl), (0, xpv), (1, xm)):
                acc = acc + src[:, base:base + HP] * (0.1 + di + 2 * dj)
        o_ref[...] = acc
    xmn = np.pad(xp[:, 1:], ((0, 0), (0, 1)))
    xpln = np.pad(xp[:, :-1], ((0, 0), (1, 0)))
    ref = sum(s[:, di * 128:di * 128 + HP] * (0.1 + di + 2 * dj)
              for di in (0, 1, 2)
              for dj, s in ((-1, xpln), (0, xp), (1, xmn)))
    run("dw_padded_rows_9tap",
        lambda x: pl.pallas_call(k_dwp, out_shape=jax.ShapeDtypeStruct(
            (C, HP), jnp.float32))(x), (xpj,), ref)

    # weight-stationary dots, DEFAULT and HIGHEST
    def mk_dot(prec):
        def k(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                w_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        return lambda x, w: pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (C, HW), jnp.float32))(x, w)
    ref = np.asarray(w16) @ np.asarray(x2)
    run("dot_default", mk_dot(None), (x2, w16), ref, atol=5e-2)
    run("dot_highest", mk_dot(jax.lax.Precision.HIGHEST), (x2, w16), ref,
        atol=1e-5)

    # SE block shape: masked pool + gate
    def k_se(x_ref, w_ref, o_ref):
        x = x_ref[...]
        m = jnp.mean(x, axis=1, keepdims=True)
        g = jax.nn.sigmoid(jax.lax.dot_general(
            w_ref[...], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        o_ref[...] = x * g
    xm = np.asarray(x2)
    mm = xm.mean(1, keepdims=True)
    ref = xm * (1 / (1 + np.exp(-(np.asarray(w16) @ mm))))
    run("se_pool_fc_gate",
        lambda x, w: pl.pallas_call(k_se, out_shape=jax.ShapeDtypeStruct(
            (C, HW), jnp.float32))(x, w), (x2, w16), ref, atol=1e-3)

    # channel concat on sublanes
    def k_cat(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.concatenate([a_ref[...], b_ref[...]], axis=0)
    run("sublane_concat",
        lambda a, b: pl.pallas_call(k_cat, out_shape=jax.ShapeDtypeStruct(
            (2 * C, HW), jnp.float32))(a, b), (x2, x2),
        np.concatenate([np.asarray(x2)] * 2, 0))

    # negative probes: expected to FAIL (documented constraints)
    def k_ls(x_ref, o_ref):
        o_ref[...] = x_ref[:, 0::2]
    run("lane_stride2 (expected FAIL)",
        lambda x: pl.pallas_call(k_ls, out_shape=jax.ShapeDtypeStruct(
            (C, HW // 2), jnp.float32))(x), (x2,), np.asarray(x2)[:, 0::2])

    def k_rs(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(C, HW)
    run("inkernel_reshape (expected FAIL)",
        lambda x: pl.pallas_call(k_rs, out_shape=jax.ShapeDtypeStruct(
            (C, HW), jnp.float32))(x), (x3,), np.asarray(x3).reshape(C, HW))


if __name__ == "__main__":
    main()
