"""Pallas TPU kernels for pipeline stages where XLA fusion falls short.

1. Bilateral filter (lib/libbackscrub.cc:297 equivalent).  Its weights are
   data-dependent (exp of the local L1 color distance), so XLA
   materializes 13 shifted neighbor reads with separate weight tensors;
   the Pallas kernel keeps the whole 13-tap stencil in VMEM and
   accumulates num/den in registers, one HBM read + one write per pixel.

2. Fused composite + YUYV pack (blend_pack_yuyv): alpha blend
   (app/deepseg.cc:108-134) + fixed-point RGB->YUV + 4:2:2 pair pack
   (app/deepseg.cc:87-106) in one VMEM pass.  The jnp path costs ~59 us
   of the 225 us 720p f32 step (bench --attrib) against a ~10 us
   HBM-bandwidth floor — XLA materializes several int32 intermediates;
   the kernel keeps them in registers.  Bit-exact vs
   alpha_blend_u8 + rgb_to_yuyv (tested).

Kernels operate channels-leading (3, H, W): lanes = W (aligned to 128
for the model input sizes: 160/256/257-pad), sublanes = H rows.  Reflect
padding happens outside (cheap, fused by XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single source of truth for the OpenCV tap set/space weights
from ..pipeline.image import _bilateral_taps as _taps


def _bilateral_kernel(x_ref, out_ref, *, taps, inv2sc, rows, cols):
    # x_ref: (1, 3, rows+4, cols+4) padded frame block in VMEM (leading 1 =
    # the per-frame grid step); out: (1, 3, rows, cols)
    center = x_ref[0, :, 2:2 + rows, 2:2 + cols]
    num = jnp.zeros((3, rows, cols), jnp.float32)
    den = jnp.zeros((1, rows, cols), jnp.float32)
    for (di, dj, sw) in taps:
        nb = x_ref[0, :, 2 + di:2 + di + rows, 2 + dj:2 + dj + cols]
        cdist = jnp.sum(jnp.abs(nb - center), axis=0, keepdims=True)
        w = sw * jnp.exp(inv2sc * cdist * cdist)
        num = num + w * nb
        den = den + w
    out_ref[0, :, :, :] = num / den


@functools.partial(jax.jit, static_argnames=("sigma_color", "sigma_space",
                                             "interpret"))
def bilateral5_pallas(rgb_f32, sigma_color: float = 100.0,
                      sigma_space: float = 100.0, interpret: bool = False):
    """Pallas bilateral filter, d=5; input (..., H, W, 3) f32 u8-range
    values — leading batch dims become grid steps (one frame per block,
    reflect borders stay per-frame).

    Numerically equivalent to pipeline.image.bilateral5 (same taps, same
    reflect-101 border).
    """
    lead = rgb_f32.shape[:-3]
    h, w = rgb_f32.shape[-3], rgb_f32.shape[-2]
    n = 1
    for d in lead:
        n *= d
    x = rgb_f32.reshape((n, h, w, 3))
    x = jnp.transpose(x, (0, 3, 1, 2))  # (N, 3, H, W)
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)), mode="reflect")
    taps = _taps(5, sigma_space)
    inv2sc = -0.5 / (sigma_color ** 2)
    out = pl.pallas_call(
        functools.partial(_bilateral_kernel, taps=taps, inv2sc=inv2sc,
                          rows=h, cols=w),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 3, h + 4, w + 4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3, h, w), jnp.float32),
        interpret=interpret,
    )(xp)
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(lead + (h, w, 3))


# ---------------------------------------------------------------------------
# Fused composite + YUYV pack

def _blend_pack_kernel(fr_ref, bg_ref, m_ref, y_ref, c_ref, *,
                       r_ch, b_ch, c0_is_v):
    """One row-tile: blend -> YUV fixed point -> 4:2:2 chroma plane.

    fr/bg: (3, TH, W) u8 planes (comp channel order B,G,R); m: (TH, W) u8.
    Outputs: y (TH, W) and the alternating chroma plane c (TH, W) with
    c[x] = x even ? c0_pair : c1_pair — XLA interleaves (y, c) to (H, 2W).
    """
    m = m_ref[...].astype(jnp.int32)
    im = 255 - m

    def blend(ch):
        n = bg_ref[ch].astype(jnp.int32) * m + fr_ref[ch].astype(jnp.int32) * im
        # exact n // 255 for n in [0, 65025]: (n + 1 + (n >> 8)) >> 8
        return (n + 1 + (n >> 8)) >> 8

    comp = [blend(0), blend(1), blend(2)]
    # r/b role assignment is static: correct_colors=False feeds BGR into
    # the RGB2YUV math (the reference's quirk, image.py rgb_to_yuyv docs)
    r = comp[r_ch]
    g = comp[1]
    b = comp[b_ch]
    y = (r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
    u = jnp.clip(((b - y) * 8061 + (128 << 14) + (1 << 13)) >> 14, 0, 255)
    v = jnp.clip(((r - y) * 14369 + (128 << 14) + (1 << 13)) >> 14, 0, 255)
    # pair-average chroma with truncating /2 (deepseg.cc:97-104), built as
    # one alternating plane via lane rolls (wrap lanes land on unused
    # slots): out byte 2x+1 carries c0_avg(pair) at even x, c1_avg at odd
    c0, c1 = (v, u) if c0_is_v else (u, v)
    at_even = (c0 + jnp.roll(c0, -1, axis=-1)) >> 1  # (c0[x]+c0[x+1])/2
    at_odd = (jnp.roll(c1, 1, axis=-1) + c1) >> 1    # (c1[x-1]+c1[x])/2
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    c = jnp.where((lane & 1) == 0, at_even, at_odd)
    y_ref[...] = y.astype(jnp.uint8)
    c_ref[...] = c.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("chroma_order",
                                             "correct_colors", "interpret"))
def blend_pack_yuyv(frame_bgr, bg_bgr, mask, chroma_order: str = "reference",
                    correct_colors: bool = False, interpret: bool = False):
    """(..., H, W, 3) frame/bg u8 + (..., H, W) mask u8 -> (..., H, 2W)
    YUYV bytes, bit-exact vs alpha_blend_u8 + rgb_to_yuyv + reshape (the
    jnp path).  Leading batch dims flatten into rows (each output row
    depends on one input row only).

    ``interpret=True`` runs the Pallas interpreter (CPU tests); the
    pipeline gates the compiled kernel to TPU like the bilateral."""
    lead = frame_bgr.shape[:-3]
    hh, w = frame_bgr.shape[-3], frame_bgr.shape[-2]
    if lead:
        out = blend_pack_yuyv(
            frame_bgr.reshape((-1,) + frame_bgr.shape[-2:]),
            bg_bgr.reshape((-1,) + bg_bgr.shape[-2:]),
            mask.reshape((-1, mask.shape[-1])),
            chroma_order=chroma_order, correct_colors=correct_colors,
            interpret=interpret)
        return out.reshape(lead + (hh, 2 * w))
    h = hh
    fr = jnp.transpose(frame_bgr, (2, 0, 1))
    bg = jnp.transpose(bg_bgr, (2, 0, 1))
    th = h
    for cand in (128, 120, 96, 80, 64, 48, 32, 16, 8):
        if h % cand == 0:
            th = cand
            break
    grid = (h // th,)
    r_ch, b_ch = (2, 0) if correct_colors else (0, 2)
    y, c = pl.pallas_call(
        functools.partial(_blend_pack_kernel, r_ch=r_ch, b_ch=b_ch,
                          c0_is_v=(chroma_order == "reference")),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, th, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.uint8),
                   jax.ShapeDtypeStruct((h, w), jnp.uint8)],
        interpret=interpret,
    )(fr, bg, mask)
    return jnp.stack([y, c], axis=-1).reshape(h, 2 * w)


# ---------------------------------------------------------------------------
# Fused composite + 4:2:0 pack (NV12 / I420)

def _blend_420_kernel(fr_ref, bg_ref, m_ref, y_ref, uv_ref):
    """One row-tile: blend -> BT.601 video-range Y (TH, W) + NV12
    interleaved chroma rows (TH, W; wrapper keeps even rows = each 2x2
    block's top-left sample, cv2 COLOR_BGR2YUV_I420 semantics,
    image.py _bt601_yuv420)."""
    from ..pipeline.image import (_ENC_CRY, _ENC_CGY, _ENC_CBY, _ENC_CRU,
                                  _ENC_CGU, _ENC_CBU, _ENC_CGV, _ENC_CBV,
                                  _ENC_SHIFT)
    m = m_ref[...].astype(jnp.int32)
    im = 255 - m

    def blend(ch):
        n = bg_ref[ch].astype(jnp.int32) * m + fr_ref[ch].astype(jnp.int32) * im
        return (n + 1 + (n >> 8)) >> 8  # exact n // 255 for n <= 65025

    b, g, r = blend(0), blend(1), blend(2)
    half = 1 << (_ENC_SHIFT - 1)
    y = (r * _ENC_CRY + g * _ENC_CGY + b * _ENC_CBY
         + half + (16 << _ENC_SHIFT)) >> _ENC_SHIFT
    y_ref[...] = jnp.clip(y, 0, 255).astype(jnp.uint8)
    # chroma at full height (Mosaic can't lower a strided row subsample;
    # the wrapper drops odd rows in XLA — only even rows are consumed,
    # matching the 2x2 top-left sampling)
    u = jnp.clip((r * _ENC_CRU + g * _ENC_CGU + b * _ENC_CBU
                  + half + (128 << _ENC_SHIFT)) >> _ENC_SHIFT, 0, 255)
    v = jnp.clip((r * _ENC_CBU + g * _ENC_CGV + b * _ENC_CBV
                  + half + (128 << _ENC_SHIFT)) >> _ENC_SHIFT, 0, 255)
    # NV12 row [U0, V0, U2, V2, ...]: U at even lanes (its own column),
    # V at odd lanes from the column to the left (lane roll)
    lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, u.ndim - 1)
    uv = jnp.where((lane & 1) == 0, u, jnp.roll(v, 1, axis=-1))
    uv_ref[...] = uv.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blend_pack_420(frame_bgr, bg_bgr, mask, interpret: bool = False):
    """(..., H, W, 3) frame/bg u8 + (..., H, W) mask u8 -> (Y (..., H, W),
    UV (..., H/2, W)) u8, bit-exact vs alpha_blend_u8 + _bt601_yuv420.
    NV12 = concat([Y, UV], rows); I420 takes UV[..., 0::2] / [..., 1::2]."""
    lead = frame_bgr.shape[:-3]
    h, w = frame_bgr.shape[-3], frame_bgr.shape[-2]
    if lead:
        y, uv = blend_pack_420(
            frame_bgr.reshape((-1,) + frame_bgr.shape[-2:]),
            bg_bgr.reshape((-1,) + bg_bgr.shape[-2:]),
            mask.reshape((-1, mask.shape[-1])), interpret=interpret)
        # NOTE: row-flattened chroma pairs rows (2k, 2k+1) of the FLAT
        # array; with even per-frame H these pairs never straddle frames
        return (y.reshape(lead + (h, w)),
                uv.reshape(lead + (h // 2, w)))
    fr = jnp.transpose(frame_bgr, (2, 0, 1))
    bg = jnp.transpose(bg_bgr, (2, 0, 1))
    th = h
    for cand in (128, 120, 96, 80, 64, 48, 32, 16, 8):
        if h % cand == 0:
            th = cand
            break
    grid = (h // th,)
    y, uv = pl.pallas_call(
        _blend_420_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, th, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.uint8),
                   jax.ShapeDtypeStruct((h, w), jnp.uint8)],
        interpret=interpret,
    )(fr, bg, mask)
    return y, uv[0::2]
