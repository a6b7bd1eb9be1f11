"""Probe: where do the front kernel's 40 us go at 257x257 (deeplab/bodypix)?

Times ``front_fused_call`` standalone on the real TPU at the deeplab-720p
geometry, with ablations (scan+checksum harness, same doctrine as
bench.py).  Run: ``python tools/probe_front.py [segm]``.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from backscrub_tpu.models.specs import install_default_search_roots
install_default_search_roots()

import numpy as np
import jax
import jax.numpy as jnp


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
        est.append((tb - ts) / (iters - 10) * 1e6)
    est.sort()
    return est[len(est) // 2]


MODELS = {
    "deeplab": ("deeplabv3_257_mv_gpu.tflite", 1280, 720),
    "bodypix": ("body-pix-float-050-8.tflite", 1280, 720),
    "mlkit": ("selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
              1280, 720),
    "segm_full": ("segm_full_v679.tflite", 1280, 720),
    "segm": ("segm_lite_v681.tflite", 640, 480),
}


def main():
    from backscrub_tpu.pipeline.maskgen import MaskGen
    arg = next((a for a in sys.argv[1:] if a in MODELS), "deeplab")
    name, w, h = MODELS[arg]
    mg = MaskGen(name, w, h, edge_fused=True)
    e = mg.edge
    info = e.info
    rng = np.random.default_rng(0)
    zt = jnp.asarray(np.round(rng.uniform(0, 255,
                     (1, 3, 2 * e.qh, 2 * e.qw))).astype(np.float32))
    wf = jnp.asarray(e.front_w_flat)
    print(f"model={name} zt={zt.shape} cout={e.front_w_flat.shape[1]} "
          f"layout={e.front_layout}", file=sys.stderr)

    from backscrub_tpu.pipeline import edge as E

    def call(zt, wf, **over):
        kw = dict(qh=e.qh, qw=e.qw, H=mg.model.input_shape[1],
                  W=mg.model.input_shape[2], oh=info.conv_oh,
                  ow=info.conv_ow, taps=e.taps, inv2sc=e.inv2sc,
                  use_bilateral=True, scale=float(mg.spec.scale),
                  offset=float(mg.spec.offset), pad_lo_h=info.pad_lo_h,
                  pad_lo_w=info.pad_lo_w, activation=info.front_activation,
                  out_layout=e.front_layout, out_dtype=jnp.float32,
                  rs=(e.mega.rs if e.mega is not None else
                      e.mega_prefix.rs if e.mega_prefix is not None else 128))
        kw.update(over)
        return E.front_fused_call(zt, wf, **kw)

    t = timeit(lambda z, w: call(z, w), zt, wf)
    print(f"baseline (bilateral on):   {t:8.2f} us")
    t = timeit(lambda z, w: call(z, w, conv_dot=True), zt, wf)
    print(f"MXU-dot conv contraction:  {t:8.2f} us")
    t = timeit(lambda z, w: call(z, w, use_bilateral=False), zt, wf)
    print(f"no bilateral:              {t:8.2f} us")

    # exp -> exp2 with the log2(e) folded into inv2sc
    real_exp = jnp.exp
    try:
        jnp.exp = lambda x: jax.lax.exp2(x)
        t = timeit(lambda z, w: call(z, w, inv2sc=e.inv2sc * np.log2(np.e)),
                   zt, wf)
        print(f"exp2 weights:              {t:8.2f} us")
        # no exp at all (wrong numerics; isolates the transcendental)
        jnp.exp = lambda x: x + 1.0
        t = timeit(lambda z, w: call(z, w), zt, wf)
        print(f"linear 'exp' (no transc):  {t:8.2f} us")
    finally:
        jnp.exp = real_exp

    # half the taps (isolates per-tap slice+fma cost vs fixed cost)
    t = timeit(lambda z, w: call(z, w, taps=e.taps[::2]), zt, wf)
    print(f"12 of {len(e.taps)} taps:            {t:8.2f} us")


if __name__ == "__main__":
    main()
