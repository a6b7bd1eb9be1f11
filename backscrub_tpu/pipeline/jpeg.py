"""Device half of the MJPG decode path: quantized DCT coefficients -> BGR.

The host (io/jpeg.py + native/bsjpeg.cc) stops after Huffman entropy
decode; this module runs everything downstream ON DEVICE, fused into the
frame program: dequantize, 8x8 inverse DCT, chroma upsampling, and
YCbCr->BGR conversion.

Numerics are BIT-EXACT vs cv2.imdecode (libjpeg-turbo defaults):

- IDCT reproduces ``jpeg_idct_islow`` (libjpeg jidctint.c): the Loeffler
  13-bit fixed-point butterfly, two passes with DESCALE(11)/DESCALE(18),
  including int32 wraparound semantics (jnp int32 arithmetic wraps the
  same way as C).
- Chroma upsampling reproduces libjpeg's *fancy* (triangle) upsamplers
  ``h2v1/h2v2/h1v2_fancy_upsample`` (jdsample.c) — the default
  ``do_fancy_upsampling=TRUE`` path cv2 uses; border clamping makes the
  first/last special cases fall out of the same formula.
- Color conversion reproduces ``ycc_rgb_convert`` (jdcolor.c): 16-bit
  fixed-point BT.601 with ONE_HALF rounding.

The per-pixel scalar loops these replace run on the host in the reference
(inside cv::VideoCapture's libjpeg calls); here they are dense int32
tensor ops on the VPU, and XLA fuses them with the rest of the per-frame
program (reference decode call site: app/deepseg.cc:629-632).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..io.jpeg import JpegInfo

# libjpeg jidctint.c CONST_BITS=13 multipliers
_FIX_0_298631336 = 2446
_FIX_0_390180644 = 3196
_FIX_0_541196100 = 4433
_FIX_0_765366865 = 6270
_FIX_0_899976223 = 7373
_FIX_1_175875602 = 9633
_FIX_1_501321110 = 12299
_FIX_1_847759065 = 15137
_FIX_1_961570560 = 16069
_FIX_2_053119869 = 16819
_FIX_2_562915447 = 20995
_FIX_3_072711026 = 25172


def _butterfly8(ins: Sequence, descale: int) -> List:
    """One 8-point islow IDCT pass (jidctint.c), branch-free.

    The all-zero-AC shortcut in libjpeg is bit-identical to the general
    path (DESCALE of a pure <<13 term is exact), so no branches needed.
    """
    i0, i1, i2, i3, i4, i5, i6, i7 = ins
    # even part
    z2, z3 = i2, i6
    z1 = (z2 + z3) * _FIX_0_541196100
    tmp2 = z1 - z3 * _FIX_1_847759065
    tmp3 = z1 + z2 * _FIX_0_765366865
    t0 = (i0 + i4) << 13
    t1 = (i0 - i4) << 13
    tmp10, tmp13 = t0 + tmp3, t0 - tmp3
    tmp11, tmp12 = t1 + tmp2, t1 - tmp2
    # odd part
    t0, t1, t2, t3 = i7, i5, i3, i1
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * _FIX_1_175875602
    t0 = t0 * _FIX_0_298631336
    t1 = t1 * _FIX_2_053119869
    t2 = t2 * _FIX_3_072711026
    t3 = t3 * _FIX_1_501321110
    z1 = z1 * -_FIX_0_899976223
    z2 = z2 * -_FIX_2_562915447
    z3 = z3 * -_FIX_1_961570560 + z5
    z4 = z4 * -_FIX_0_390180644 + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4

    half = 1 << (descale - 1)
    d = lambda v: (v + half) >> descale  # DESCALE: arithmetic shift
    return [d(tmp10 + t3), d(tmp11 + t2), d(tmp12 + t1), d(tmp13 + t0),
            d(tmp13 - t0), d(tmp12 - t1), d(tmp11 - t2), d(tmp10 - t3)]


def idct_islow(dequant: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) int32 dequantized coefficients -> (..., 8, 8) int32
    samples in [0, 255] (centered +128 and clamped, jidctint.c range_limit)."""
    x = dequant.astype(jnp.int32)
    # pass 1: columns (frequency axis -2), DESCALE(CONST_BITS - PASS1_BITS)
    cols = [x[..., k, :] for k in range(8)]
    ws = _butterfly8(cols, 11)
    ws = jnp.stack(ws, axis=-2)
    # pass 2: rows (axis -1), DESCALE(CONST_BITS + PASS1_BITS + 3)
    rows = [ws[..., :, k] for k in range(8)]
    out = _butterfly8(rows, 18)
    out = jnp.stack(out, axis=-1)
    return jnp.clip(out + 128, 0, 255)


def blocks_to_plane(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., bh, bw, 8, 8) -> (..., bh*8, bw*8)."""
    *lead, bh, bw, _, _ = blocks.shape
    perm = tuple(range(len(lead))) + (len(lead), len(lead) + 2,
                                      len(lead) + 1, len(lead) + 3)
    return blocks.transpose(perm).reshape(*lead, bh * 8, bw * 8)


def dequant_idct_plane(coef: jnp.ndarray, qtab: jnp.ndarray) -> jnp.ndarray:
    """(..., bh, bw, 64) int16 raw coefficients + (..., 64) quant ->
    (..., bh*8, bw*8) int32 plane of samples in [0, 255].  Leading axes
    (e.g. a stream batch with per-stream quant tables) broadcast."""
    *lead, bh, bw, _ = coef.shape
    q = qtab.astype(jnp.int32)
    if q.ndim > 1:  # per-item tables: (..., 64) -> (..., 1, 1, 64)
        q = q.reshape(q.shape[:-1] + (1, 1, 64))
    deq = coef.astype(jnp.int32) * q
    return blocks_to_plane(idct_islow(deq.reshape(*lead, bh, bw, 8, 8)))


# ---- fancy (triangle) upsamplers, jdsample.c ------------------------------
# Border clamping makes libjpeg's first/last-column special cases identical
# to the general formula: e.g. out[0] = (3*s0 + s0 + 1) >> 2 == s0.

def _fancy_h2(row: jnp.ndarray, bias_even: int, bias_odd: int,
              shift: int) -> jnp.ndarray:
    """Horizontal 2x triangle along the last axis: (..., w) -> (..., 2w)."""
    left = jnp.concatenate([row[..., :1], row[..., :-1]], axis=-1)
    right = jnp.concatenate([row[..., 1:], row[..., -1:]], axis=-1)
    even = (row * 3 + left + bias_even) >> shift
    odd = (row * 3 + right + bias_odd) >> shift
    return jnp.stack([even, odd], axis=-1).reshape(*row.shape[:-1],
                                                   row.shape[-1] * 2)


def upsample_h2v1(plane: jnp.ndarray) -> jnp.ndarray:
    """h2v1_fancy_upsample: (h, w) -> (h, 2w)."""
    return _fancy_h2(plane, 1, 2, 2)


def _interleave_rows(even: jnp.ndarray, odd: jnp.ndarray) -> jnp.ndarray:
    """Zip two (..., h, w) arrays into (..., 2h, w)."""
    h, w = even.shape[-2], even.shape[-1]
    return jnp.stack([even, odd], axis=-2).reshape(*even.shape[:-2], 2 * h, w)


def upsample_h1v2(plane: jnp.ndarray) -> jnp.ndarray:
    """h1v2_fancy_upsample (libjpeg-turbo, for 4:4:0): (..., h, w) ->
    (..., 2h, w)."""
    up = jnp.concatenate([plane[..., :1, :], plane[..., :-1, :]], axis=-2)
    down = jnp.concatenate([plane[..., 1:, :], plane[..., -1:, :]], axis=-2)
    even = (plane * 3 + up + 1) >> 2
    odd = (plane * 3 + down + 2) >> 2
    return _interleave_rows(even, odd)


def upsample_h2v2(plane: jnp.ndarray) -> jnp.ndarray:
    """h2v2_fancy_upsample: (..., h, w) -> (..., 2h, 2w).

    Vertical triangle first (colsum = 3*this + nearer-neighbor row), then
    the horizontal pass on the 12-bit sums with biases 8/7 and >>4."""
    up = jnp.concatenate([plane[..., :1, :], plane[..., :-1, :]], axis=-2)
    down = jnp.concatenate([plane[..., 1:, :], plane[..., -1:, :]], axis=-2)
    rows = _interleave_rows(plane * 3 + up, plane * 3 + down)
    return _fancy_h2(rows, 8, 7, 4)


def upsample_int(plane: jnp.ndarray, h_expand: int, v_expand: int) -> jnp.ndarray:
    """int_upsample: pixel replication for unusual sampling ratios."""
    return jnp.repeat(jnp.repeat(plane, v_expand, axis=-2), h_expand, axis=-1)


def upsample_plane(plane: jnp.ndarray, h: int, v: int, hmax: int,
                   vmax: int) -> jnp.ndarray:
    """Dispatch exactly like jdsample.c's per-component method selection
    (do_fancy_upsampling=TRUE, the cv2/libjpeg-turbo default)."""
    if h == hmax and v == vmax:
        return plane
    if h * 2 == hmax and v == vmax:
        return upsample_h2v1(plane)
    if h * 2 == hmax and v * 2 == vmax:
        return upsample_h2v2(plane)
    if h == hmax and v * 2 == vmax:
        return upsample_h1v2(plane)
    if hmax % h == 0 and vmax % v == 0:
        return upsample_int(plane, hmax // h, vmax // v)
    raise ValueError(f"unsupported sampling {h}x{v} vs max {hmax}x{vmax}")


# ---- color conversion, jdcolor.c ------------------------------------------

def ycc_to_bgr(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """ycc_rgb_convert (jdcolor.c build_ycc_rgb_table): 16-bit fixed point.

    FIX(1.40200)=91881 FIX(1.77200)=116130 FIX(0.71414)=46802
    FIX(0.34414)=22554; ONE_HALF rounding on the r/b terms, floor shift on
    the combined g term — exactly libjpeg's table values."""
    cbm = cb - 128
    crm = cr - 128
    r = y + ((91881 * crm + 32768) >> 16)
    b = y + ((116130 * cbm + 32768) >> 16)
    g = y + ((-22554 * cbm + 32768 - 46802 * crm) >> 16)
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(bgr, 0, 255).astype(jnp.uint8)


def decode_jpeg_bgr(coefs: Sequence[jnp.ndarray], qtabs: jnp.ndarray,
                    info: JpegInfo) -> jnp.ndarray:
    """Full device decode: raw coefficients -> (..., H, W, 3) BGR u8 (or
    replicated gray for 1-component JPEGs), bit-exact vs cv2.imdecode.

    ``info`` is static (fixed per MJPG stream) and baked into the jitted
    program; ``coefs`` ((..., bh, bw, 64) int16 per component) and
    ``qtabs`` ((..., ncomp, 64) u16) are runtime arrays.  Leading axes
    batch — a stream batch decodes S frames in one fused dispatch with
    per-stream quant tables (parallel/streams.py).
    """
    hmax = max(s[0] for s in info.sampling)
    vmax = max(s[1] for s in info.sampling)
    planes = []
    for c in range(info.ncomp):
        plane = dequant_idct_plane(coefs[c], qtabs[..., c, :])
        # crop the MCU padding BEFORE upsampling: libjpeg's border math
        # clamps at downsampled_width, not the padded block width
        h, v = info.sampling[c]
        cw = -(-info.width * h // hmax)
        ch = -(-info.height * v // vmax)
        plane = plane[..., :ch, :cw]
        plane = upsample_plane(plane, h, v, hmax, vmax)
        planes.append(plane[..., :info.height, :info.width])
    if info.ncomp == 1:
        gray = jnp.clip(planes[0], 0, 255).astype(jnp.uint8)
        return jnp.stack([gray, gray, gray], axis=-1)
    return ycc_to_bgr(planes[0], planes[1], planes[2])
