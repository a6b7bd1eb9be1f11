#!/usr/bin/env python3
"""Measure s8xs8->s32 conv vs f32/bf16 on the current device.

Backs the README "int8 verdict": at batch 32 (away from dispatch overhead)
the int8 conv lowering ties f32 HIGHEST but loses to bf16 on TPU v5e, so
bf16 stays the fast path.  Shapes: the 3x3x64x128 conv at 96x160 cited in
the round-1 measurements (a mid-network Meet-lite layer).

Usage: python tools/probe_int8.py [batch ...]   (default: 1 32)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

H, W, CIN, COUT, K = 96, 160, 64, 128, 3


def bench(fn, x, w, n=100):
    o = fn(x, w)
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(x, w)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e6


def conv(prec=None, pref=None):
    @jax.jit
    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec, preferred_element_type=pref)
    return f


@jax.jit
def conv_s8_im2col(x, w):
    B = x.shape[0]
    patches = lax.conv_general_dilated_patches(
        x, (K, K), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    p = patches.reshape(B * H * W, K * K * CIN)
    wm = w.transpose(2, 0, 1, 3).reshape(K * K * CIN, COUT)
    y = lax.dot_general(p, wm, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return y.reshape(B, H, W, COUT)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 32]
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, K, CIN, COUT), np.int8))
    for B in batches:
        x8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, CIN), np.int8))
        ref = np.asarray(conv(pref=jnp.int32)(x8, w8))
        assert np.array_equal(ref, np.asarray(conv_s8_im2col(x8, w8))), \
            "im2col formulation diverged from the direct s8 conv"
        rows = [
            ("f32 HIGHEST", conv(prec=lax.Precision.HIGHEST),
             x8.astype(jnp.float32), w8.astype(jnp.float32)),
            ("bf16", conv(), x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)),
            ("s8->s32 direct", conv(pref=jnp.int32), x8, w8),
            ("s8->s32 im2col", conv_s8_im2col, x8, w8),
        ]
        for name, f, x, w in rows:
            print(f"batch {B:3d}  {name:16s} {bench(f, x, w):9.1f} us")


if __name__ == "__main__":
    main()
