"""Device half of MJPG *encode*: BGR frames -> quantized DCT coefficients.

Symmetric to pipeline/jpeg.py (decode): everything dense runs on device —
fixed-point RGB->YCbCr, chroma downsampling, the islow forward DCT and
quantization — and only the bit-serial Huffman pack stays on the host
(native/bsjpeg.cc bsjpeg_encode, wrapped by io/jpeg.py).

Numerics reproduce libjpeg's encoder exactly (jccolor.c rgb_ycc_convert,
jcsample.c h2v2/h2v1_downsample, jfdctint.c jpeg_fdct_islow, jcdctmgr.c
quantize), so the emitted coefficients — and, with the standard Annex K
tables the host packer uses, the whole JPEG stream — match what
cv2.imencode (libjpeg-turbo, optimize=off) produces for the same pixels.

Use cases: MJPG virtual-camera output (v4l2loopback consumers that prefer
compressed frames) and recording the processed stream; the reference has
no encode path at all (its output is raw YUYV, app/deepseg.cc:681-690).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..io.jpeg import JpegInfo, ZIGZAG
from .jpeg import _butterfly8  # shared 8-point islow butterfly (decode)

_ZIGZAG = np.asarray(ZIGZAG)  # static gather indices (zigzag k -> natural)

# jccolor.c build_rgb_ycc_table constants (SCALEBITS=16)
_FIX_0_29900 = 19595
_FIX_0_58700 = 38470
_FIX_0_11400 = 7471
_FIX_0_16874 = 11059
_FIX_0_33126 = 21709
_FIX_0_50000 = 32768
_FIX_0_41869 = 27439
_FIX_0_08131 = 5329
_ONE_HALF = 1 << 15
_CBCR_OFFSET = 128 << 16


def bgr_to_ycc(bgr: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """rgb_ycc_convert (jccolor.c): (..., H, W, 3) BGR u8 -> three
    (..., H, W) int32 planes in [0, 255], bit-exact vs libjpeg."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    y = (_FIX_0_29900 * r + _FIX_0_58700 * g + _FIX_0_11400 * b
         + _ONE_HALF) >> 16
    cb = (-_FIX_0_16874 * r - _FIX_0_33126 * g + _FIX_0_50000 * b
          + _CBCR_OFFSET + _ONE_HALF - 1) >> 16
    cr = (_FIX_0_50000 * r - _FIX_0_41869 * g - _FIX_0_08131 * b
          + _CBCR_OFFSET + _ONE_HALF - 1) >> 16
    return y, cb, cr


def _expand_to(plane: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Edge-replicate (jcprepct.c expand_bottom_edge / jcsample
    expand_right_edge) up to (h, w)."""
    ph, pw = plane.shape[-2], plane.shape[-1]
    if pw < w:
        pad = jnp.repeat(plane[..., :, -1:], w - pw, axis=-1)
        plane = jnp.concatenate([plane, pad], axis=-1)
    if ph < h:
        pad = jnp.repeat(plane[..., -1:, :], h - ph, axis=-2)
        plane = jnp.concatenate([plane, pad], axis=-2)
    return plane


def downsample_h2v2(plane: jnp.ndarray) -> jnp.ndarray:
    """h2v2_downsample (jcsample.c): 2x2 box average with the alternating
    1/2 bias; (..., 2h, 2w) -> (..., h, w)."""
    s00 = plane[..., 0::2, 0::2]
    s01 = plane[..., 0::2, 1::2]
    s10 = plane[..., 1::2, 0::2]
    s11 = plane[..., 1::2, 1::2]
    bias = jnp.arange(s00.shape[-1], dtype=jnp.int32) % 2 + 1  # 1,2,1,2,...
    return (s00 + s01 + s10 + s11 + bias) >> 2


def downsample_h2v1(plane: jnp.ndarray) -> jnp.ndarray:
    """h2v1_downsample (jcsample.c): horizontal pair average with the
    alternating 0/1 bias; (..., h, 2w) -> (..., h, w)."""
    s0 = plane[..., 0::2]
    s1 = plane[..., 1::2]
    bias = jnp.arange(s0.shape[-1], dtype=jnp.int32) % 2  # 0,1,0,1,...
    return (s0 + s1 + bias) >> 1


def plane_to_blocks(plane: jnp.ndarray) -> jnp.ndarray:
    """(..., bh*8, bw*8) -> (..., bh, bw, 8, 8)."""
    *lead, h, w = plane.shape
    bh, bw = h // 8, w // 8
    x = plane.reshape(*lead, bh, 8, bw, 8)
    n = len(lead)
    return x.transpose(tuple(range(n)) + (n, n + 2, n + 1, n + 3))


def fdct_islow(samples: jnp.ndarray) -> jnp.ndarray:
    """jpeg_fdct_islow (jfdctint.c): (..., 8, 8) int32 level-shifted
    samples -> (..., 8, 8) int32 coefficients scaled up by 8."""

    def fwd(ins, pass2: bool):
        i0, i1, i2, i3, i4, i5, i6, i7 = ins
        t0, t1, t2, t3 = i0 + i7, i1 + i6, i2 + i5, i3 + i4
        t7, t6, t5, t4 = i0 - i7, i1 - i6, i2 - i5, i3 - i4
        t10, t13 = t0 + t3, t0 - t3
        t11, t12 = t1 + t2, t1 - t2
        if pass2:
            d02 = lambda v: (v + 2) >> 2                      # DESCALE(v, PASS1_BITS)
            d = lambda v: (v + (1 << 14)) >> 15               # DESCALE(v, CONST_BITS+PASS1_BITS)
        else:
            d02 = lambda v: v << 2                            # << PASS1_BITS
            d = lambda v: (v + (1 << 10)) >> 11               # DESCALE(v, CONST_BITS-PASS1_BITS)
        o0 = d02(t10 + t11)
        o4 = d02(t10 - t11)
        z1 = (t12 + t13) * 4433                               # FIX_0_541196100
        o2 = d(z1 + t13 * 6270)                               # FIX_0_765366865
        o6 = d(z1 - t12 * 15137)                              # FIX_1_847759065
        z1 = t4 + t7
        z2 = t5 + t6
        z3 = t4 + t6
        z4 = t5 + t7
        z5 = (z3 + z4) * 9633                                 # FIX_1_175875602
        t4 = t4 * 2446                                        # FIX_0_298631336
        t5 = t5 * 16819                                       # FIX_2_053119869
        t6 = t6 * 25172                                       # FIX_3_072711026
        t7 = t7 * 12299                                       # FIX_1_501321110
        z1 = z1 * -7373                                       # -FIX_0_899976223
        z2 = z2 * -20995                                      # -FIX_2_562915447
        z3 = z3 * -16069 + z5                                 # -FIX_1_961570560
        z4 = z4 * -3196 + z5                                  # -FIX_0_390180644
        o7 = d(t4 + z1 + z3)
        o5 = d(t5 + z2 + z4)
        o3 = d(t6 + z2 + z3)
        o1 = d(t7 + z1 + z4)
        return [o0, o1, o2, o3, o4, o5, o6, o7]

    x = samples.astype(jnp.int32)
    rows = fwd([x[..., :, k] for k in range(8)], pass2=False)
    ws = jnp.stack(rows, axis=-1)
    cols = fwd([ws[..., k, :] for k in range(8)], pass2=True)
    return jnp.stack(cols, axis=-2)


def quantize(coef: jnp.ndarray, qtab: jnp.ndarray) -> jnp.ndarray:
    """jcdctmgr.c quantize: divisors are quant values scaled by 8 (matching
    the x8-scaled fdct output), round half away from zero.

    coef (..., bh, bw, 8, 8) int32; qtab (..., 64) -> (..., bh, bw, 64)
    int16 raw quantized coefficients (natural order)."""
    *lead, bh, bw, _, _ = coef.shape
    c = coef.reshape(*lead, bh, bw, 64)
    q = qtab.astype(jnp.int32) << 3
    if q.ndim > 1:
        q = q.reshape(q.shape[:-1] + (1, 1, 64))
    mag = jnp.abs(c) + (q >> 1)
    val = mag // q
    return jnp.where(c < 0, -val, val).astype(jnp.int16)


def encode_jpeg_coefs(bgr: jnp.ndarray, qtabs: jnp.ndarray,
                      info: JpegInfo,
                      order: str = "zigzag") -> List[jnp.ndarray]:
    """Full device encode: (..., H, W, 3) BGR u8 -> per-component
    (..., bh, bw, 64) int16 quantized coefficients matching ``info``
    (geometry + sampling static; ``qtabs`` (..., ncomp, 64) runtime).

    ``order``: "zigzag" (default) emits each block pre-permuted into the
    entropy coder's zigzag order — a static gather XLA fuses into the
    encode program for free, saving the host packer a 63-element reorder
    per block (bsjpeg_encode_zz); "natural" keeps bsjpeg_decode's layout.

    The host packs these into a JPEG stream with bsjpeg_encode[_zz]
    (io/jpeg.py JpegHuffmanEncoder); with the standard Annex K tables the
    bytes match cv2.imencode's libjpeg-turbo output for the same pixels.
    """
    hmax = max(s[0] for s in info.sampling)
    vmax = max(s[1] for s in info.sampling)
    y, cb, cr = bgr_to_ycc(bgr)
    planes = [y, cb, cr][:info.ncomp]
    out = []
    for c in range(info.ncomp):
        h, v = info.sampling[c]
        bh, bw = info.blocks[c]
        # Edge padding follows libjpeg's split: the RIGHT edge is
        # replicated at full resolution before averaging (jcsample.c
        # expand_right_edge — dup columns participate in the box average),
        # but the BOTTOM edge only to the downsampler's row granularity
        # (jcprepct.c pads input row groups to a multiple of max_v);
        # vertical iMCU padding then duplicates the last DOWNSAMPLED row
        # (pre_process_data's output-level expand_bottom_edge).
        r_v = vmax // v
        comp_h = -(-info.height * v // vmax)
        p = _expand_to(planes[c], comp_h * r_v, bw * 8 * (hmax // h))
        if h * 2 == hmax and v * 2 == vmax:
            p = downsample_h2v2(p)
        elif h * 2 == hmax and v == vmax:
            p = downsample_h2v1(p)
        elif not (h == hmax and v == vmax):
            raise ValueError(f"unsupported encoder sampling {h}x{v} "
                             f"(supported: 4:4:4, 4:2:2, 4:2:0)")
        p = _expand_to(p, bh * 8, bw * 8)
        blocks = plane_to_blocks(p - 128)  # convsamp level shift
        coef = quantize(fdct_islow(blocks), qtabs[..., c, :])
        coef = _dummy_blocks(coef, info, c, hmax, vmax)
        if order == "zigzag":
            coef = coef[..., _ZIGZAG]
        elif order != "natural":
            raise ValueError(f"order must be zigzag|natural, got {order!r}")
        out.append(coef)
    return out


def _dummy_blocks(coef: jnp.ndarray, info: JpegInfo, c: int,
                  hmax: int, vmax: int) -> jnp.ndarray:
    """Reproduce jccoefct.c compress_data's MCU dummy-block rule: blocks
    beyond the component's real block grid are NOT transformed — they are
    emitted with all-zero AC and the DC of the preceding block in the
    MCU's (v, h) emission order (chained through consecutive dummies)."""
    h, v = info.sampling[c]
    comp_w = -(-info.width * h // hmax)
    comp_h = -(-info.height * v // vmax)
    real_w = -(-comp_w // 8)
    real_h = -(-comp_h // 8)
    bh, bw = info.blocks[c]
    if real_w == bw and real_h == bh:
        return coef  # no dummy blocks
    by = jnp.arange(bh)[:, None]
    bx = jnp.arange(bw)[None, :]
    real = (by < real_h) & (bx < real_w)          # (bh, bw)
    shape = coef.shape[:-3]
    coef = coef * real[..., None]                 # zero dummy blocks entirely
    dc = coef[..., 0]                             # (..., bh, bw)
    # walk the MCU's (v_idx, h_idx) emission order, carrying the chain DC
    mh, mw = bh // v, bw // h
    dcg = dc.reshape(*shape, mh, v, mw, h)        # grouped by MCU
    realg = real.reshape(mh, v, mw, h)
    prev = dcg[..., :, 0, :, 0]                   # (v0,h0) is always real
    parts = []
    for vi in range(v):
        row = []
        for hi in range(h):
            if (vi, hi) == (0, 0):
                row.append(prev)
                continue
            cur = jnp.where(realg[:, vi, :, hi], dcg[..., :, vi, :, hi], prev)
            row.append(cur)
            prev = cur
        parts.append(jnp.stack(row, axis=-1))     # (..., mh, mw, h)
    dcg = jnp.stack(parts, axis=-2)               # (..., mh, mw, v, h)
    n = dcg.ndim
    dc = dcg.transpose(tuple(range(n - 4)) + (n - 4, n - 2, n - 3, n - 1)
                       ).reshape(*shape, bh, bw)
    return coef.at[..., 0].set(dc)


def quality_to_qtabs(quality: int) -> np.ndarray:
    """jcparam.c jpeg_set_quality/jpeg_quality_scaling: the Annex K base
    tables scaled by the libjpeg quality curve -> (2, 64) uint16 in natural
    order (luma, chroma) — what cv2.imencode uses for IMWRITE_JPEG_QUALITY."""
    base_luma = np.array([
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
        np.int64)
    base_chroma = np.array([
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
        np.int64)
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = np.zeros((2, 64), np.uint16)
    for t, base in enumerate([base_luma, base_chroma]):
        q = (base * scale + 50) // 100
        q = np.clip(q, 1, 255)  # baseline: 8-bit table entries
        out[t] = q.astype(np.uint16)
    return out
