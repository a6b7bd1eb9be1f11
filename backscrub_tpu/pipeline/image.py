"""Device-side image ops, replacing the reference's OpenCV/scalar-loop stages.

Every op here is pure jax.numpy on NHWC/HWC tensors, designed to live inside
one jitted frame program (XLA fuses the elementwise chains; the resizes ride
the MXU as interpolation-matrix contractions).  Reference counterparts:

- resize (cv::resize INTER_LINEAR)            lib/libbackscrub.cc:289,368
- BGR<->RGB                                    lib/libbackscrub.cc:290
- bilateral filter d=5 sigma=100,100           lib/libbackscrub.cc:297
- u8 -> f32 normalize                          lib/libbackscrub.cc:302
- 5x5 box blur (cv::blur)                      lib/libbackscrub.cc:371
- Gaussian background blur                     app/deepseg.cc:658
- alpha blend (integer, /255)                  app/deepseg.cc:108-134
- RGB -> YUYV pack (fixed point + interleave)  app/deepseg.cc:87-106
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..ops.misc import resize_matrix


# ---------------------------------------------------------------------------
# resize


def resize_bilinear(x, out_h: int, out_w: int, precision=None):
    """cv::resize INTER_LINEAR equivalent (half-pixel centers) on (..., H, W, C).

    Separable: two dense interpolation-matrix contractions (MXU-friendly).
    Compute in float; callers round once when returning to u8.
    """
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    ah = jnp.asarray(resize_matrix(h, out_h, False, True), dt)
    aw = jnp.asarray(resize_matrix(w, out_w, False, True), dt)
    y = jnp.einsum("oh,...hwc->...owc", ah, x.astype(dt), precision=precision)
    y = jnp.einsum("pw,...owc->...opc", aw, y, precision=precision)
    return y


def _cv2_linear_taps(in_size: int, out_size: int):
    """OpenCV INTER_LINEAR tap positions/coefficients, fixed point (x2048).

    Mirrors imgproc/resize.cpp: fx computed in float32 from the double
    scale, floor/frac split, each tap rounded to the 11-bit grid with
    cvRound (ties-to-even).  Border behavior is left to the caller: indices
    may be -1 or in_size and must be clamped at the sample site (OpenCV
    clamps the row/column POINTERS, keeping the fractional coefficients —
    with the per-tap truncation below, that is observable at borders)."""
    dst = np.arange(out_size, dtype=np.float64)
    fx = ((dst + 0.5) * (in_size / out_size) - 0.5).astype(np.float32)
    sx = np.floor(fx).astype(np.int64)
    fx = fx.astype(np.float64) - sx
    c1 = np.rint(fx * 2048.0).astype(np.int32)
    return sx, 2048 - c1, c1


def resize_bilinear_u8_exact(x_u8, out_h: int, out_w: int):
    """cv2.resize(..., INTER_LINEAR) on u8, bit-exact with OpenCV's
    SIMD fixed-point path, on (..., H, W, C) u8.

    The reference resizes masks/frames in the u8 domain (cv::resize at
    lib/libbackscrub.cc:289,368); cv2's u8 path is 11-bit fixed point and
    differs from its float path by +-1 on ~13% of pixels.  This op
    reproduces the u8 path exactly: horizontal pass as an integer
    interpolation-matrix contraction (exact in int32), vertical pass with
    OpenCV's vectorized rounding ``(((row>>4)*beta)>>16`` per tap,
    ``+2)>>2`` — the truncation order matters and is reproduced tap-wise."""
    h, w = x_u8.shape[-3], x_u8.shape[-2]
    if (h, w) == (out_h, out_w):
        return x_u8
    sx, c0x, c1x = _cv2_linear_taps(w, out_w)
    m = np.zeros((out_w, w), np.int32)
    cols = np.arange(out_w)
    np.add.at(m, (cols, np.clip(sx, 0, w - 1)), c0x)
    np.add.at(m, (cols, np.clip(sx + 1, 0, w - 1)), c1x)
    acc = jnp.einsum("pw,...hwc->...hpc", jnp.asarray(m),
                     x_u8.astype(jnp.int32))  # <= 255*2048, exact in int32
    sy, b0, b1 = _cv2_linear_taps(h, out_h)
    r0 = jnp.take(acc, jnp.asarray(np.clip(sy, 0, h - 1)), axis=-3) >> 4
    r1 = jnp.take(acc, jnp.asarray(np.clip(sy + 1, 0, h - 1)), axis=-3) >> 4
    b0 = jnp.asarray(b0[:, None, None])
    b1 = jnp.asarray(b1[:, None, None])
    out = (((r0 * b0) >> 16) + ((r1 * b1) >> 16) + 2) >> 2
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def box_blur_u8_exact(x_u8, ksize: int = 5):
    """cv2.blur on u8, bit-exact: integer window sums (reflect-101 border)
    scaled by 1/k^2 with cvRound.  Safe in f32: the sum is <= k^2*255 and
    sum/k^2 is never within f32 error of a rounding tie (sum is integral)."""
    r = ksize // 2
    pad = [(0, 0)] * (x_u8.ndim - 3) + [(r, r), (r, r), (0, 0)]
    xp = jnp.pad(x_u8.astype(jnp.int32), pad, mode="reflect")
    h, w = x_u8.shape[-3], x_u8.shape[-2]
    acc = 0
    for i in range(ksize):
        acc = acc + xp[..., i:i + h, :, :]
    acc2 = 0
    for j in range(ksize):
        acc2 = acc2 + acc[..., :, j:j + w, :]
    out = jnp.rint(acc2.astype(jnp.float32) * (1.0 / (ksize * ksize)))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# bilateral filter


def _bilateral_taps(d: int = 5, sigma_space: float = 100.0):
    """OpenCV tap set: square window of radius d//2, masked to r <= radius."""
    radius = d // 2
    taps = []
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            r2 = i * i + j * j
            if math.sqrt(r2) > radius:
                continue
            taps.append((i, j, math.exp(-0.5 * r2 / (sigma_space ** 2))))
    return taps


def bilateral5(rgb_f32, sigma_color: float = 100.0, sigma_space: float = 100.0):
    """cv::bilateralFilter(d=5, sigmaColor=100, sigmaSpace=100) equivalent.

    Matches OpenCV semantics: circular 13-tap window, color distance is the
    L1 norm over channels, weights exp(-0.5 d^2 / sigma^2), reflect-101
    border.  Input float32 (..., H, W, 3) holding u8-range values.
    """
    taps = _bilateral_taps(5, sigma_space)
    radius = 2
    pad = [(0, 0)] * (rgb_f32.ndim - 3) + [(radius, radius), (radius, radius), (0, 0)]
    xp = jnp.pad(rgb_f32, pad, mode="reflect")
    h, w = rgb_f32.shape[-3], rgb_f32.shape[-2]
    inv2sc = -0.5 / (sigma_color ** 2)
    num = jnp.zeros_like(rgb_f32)
    den = jnp.zeros(rgb_f32.shape[:-1] + (1,), rgb_f32.dtype)
    center = xp[..., radius:radius + h, radius:radius + w, :]
    for (di, dj, sw) in taps:
        nb = xp[..., radius + di:radius + di + h, radius + dj:radius + dj + w, :]
        cdist = jnp.sum(jnp.abs(nb - center), axis=-1, keepdims=True)
        wgt = sw * jnp.exp(inv2sc * cdist * cdist)
        num = num + wgt * nb
        den = den + wgt
    return num / den


# ---------------------------------------------------------------------------
# separable fixed-kernel blurs


def _sep_filter(x, kh: np.ndarray, kw: np.ndarray):
    """Apply a separable filter with reflect-101 border on (..., H, W, C) float."""
    rh, rw = len(kh) // 2, len(kw) // 2
    pad = [(0, 0)] * (x.ndim - 3) + [(rh, rh), (rw, rw), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    h, w = x.shape[-3], x.shape[-2]
    acc = 0.0
    for i, kv in enumerate(kh):
        acc = acc + kv * xp[..., i:i + h, :, :]
    xp2 = acc
    acc = 0.0
    for j, kv in enumerate(kw):
        acc = acc + kv * xp2[..., :, j:j + w, :]
    return acc


def box_blur(x, ksize: int = 5):
    """cv::blur(k x k) equivalent on float input (reference: 5x5 at lib/libbackscrub.cc:371)."""
    k = np.full(ksize, 1.0 / ksize, np.float32)
    return _sep_filter(x, k, k)


def blur_matrix(size: int, ksize: int = 5) -> np.ndarray:
    """Dense (size, size) matrix of the 1-D box blur with reflect-101
    border — the linear operator _sep_filter applies along one axis.

    blur∘resize is one precomputable matrix product per axis
    (blur_matrix @ resize_matrix), so the mask post-process's separate
    blur passes (and their pad/reverse/concat border ops — ~18us of the
    720p step) fold into the upscale contractions for free."""
    r = ksize // 2
    m = np.zeros((size, size), np.float64)
    for o in range(size):
        for t in range(o - r, o + r + 1):
            # reflect-101: -1 -> 1, size -> size-2 (np.pad mode="reflect")
            i = t
            if i < 0:
                i = -i
            if i > size - 1:
                i = 2 * (size - 1) - i
            m[o, max(0, min(i, size - 1))] += 1.0 / ksize
    return m.astype(np.float32)


_SMALL_GAUSSIAN = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv::getGaussianKernel: fixed small-kernel table for ksize<=7 with
    sigma<=0, else sigma = 0.3*((k-1)*0.5 - 1) + 0.8."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return np.asarray(_SMALL_GAUSSIAN[ksize], np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x, ksize: int, sigma: float = 0.0):
    """cv::GaussianBlur(k x k, sigma=0) equivalent (app/deepseg.cc:658 bgblur)."""
    k = gaussian_kernel(ksize, sigma)
    return _sep_filter(x, k, k)


# ---------------------------------------------------------------------------
# guided filter (edge-aware mask refinement; beyond-parity quality feature)


def guided_filter(guide, src, radius: int = 8, eps: float = 1e-3):
    """He et al. guided filter: refine ``src`` (..., H, W) with edges from
    ``guide`` (..., H, W), both float in [0, 1].

    Composes entirely of separable box means + elementwise math, so XLA
    fuses it into the frame program.  Used to snap the upscaled person
    mask to the camera frame's real edges — the reference's 5x5 box blur
    (app pipeline, lib/libbackscrub.cc:371) smears the silhouette boundary
    uniformly; this keeps it tight where the image has contrast."""
    k = 2 * radius + 1

    def mean(x):
        return box_blur(x[..., None], k)[..., 0]

    m_i = mean(guide)
    m_p = mean(src)
    corr_i = mean(guide * guide)
    corr_ip = mean(guide * src)
    var_i = corr_i - m_i * m_i
    cov_ip = corr_ip - m_i * m_p
    a = cov_ip / (var_i + eps)
    b = m_p - a * m_i
    return mean(a) * guide + mean(b)


# ---------------------------------------------------------------------------
# compositing


def alpha_blend_u8(srca_u8, srcb_u8, mask_u8):
    """Exact integer blend from app/deepseg.cc:108-134.

    mask 255 => srca (background), 0 => srcb (camera);
    out = (a*m + b*(255-m)) / 255 with C integer (truncating) division.
    """
    a = srca_u8.astype(jnp.int32)
    b = srcb_u8.astype(jnp.int32)
    m = mask_u8.astype(jnp.int32)
    if m.ndim == a.ndim - 1:
        m = m[..., None]
    return ((a * m + b * (255 - m)) // 255).astype(jnp.uint8)


def flip(x, horizontal: bool = False, vertical: bool = False):
    """cv::flip equivalents (app/deepseg.cc:667-673); W axis = -2, H axis = -3."""
    if horizontal:
        x = jnp.flip(x, axis=-2)
    if vertical:
        x = jnp.flip(x, axis=-3)
    return x


# ---------------------------------------------------------------------------
# YUV packing (bit-exact vs OpenCV + the reference's interleave)

# OpenCV 8-bit RGB2YUV fixed-point constants (verified bit-exact in tests):
# Y = descale(4899 R + 9617 G + 1868 B, 14)
# U = clamp(descale(8061 (B - Y) + (128<<14), 14))
# V = clamp(descale(14369 (R - Y) + (128<<14), 14))
_Y_R, _Y_G, _Y_B = 4899, 9617, 1868
_U_C, _V_C = 8061, 14369


def _descale(x, n: int = 14):
    return (x + (1 << (n - 1))) >> n


def _morph_u8(x_u8, k: int, reducer, init: int):
    if k < 1 or k % 2 == 0:
        raise ValueError(f"morphology kernel must be odd and >= 1, got {k}")
    nd = x_u8.ndim
    win = (1,) * (nd - 2) + (k, k)
    pad = ((0, 0),) * (nd - 2) + (((k - 1) // 2,) * 2, ((k - 1) // 2,) * 2)
    return lax.reduce_window(x_u8, jnp.uint8(init), reducer, win,
                             (1,) * nd, pad)


def erode_u8(x_u8, k: int = 3):
    """cv2.erode bit-exact: k x k rect-kernel min filter; cv2's default
    morphology border (+inf) = padding that never wins the min.
    (..., H, W) u8, odd k."""
    return _morph_u8(x_u8, k, lax.min, 255)


def dilate_u8(x_u8, k: int = 3):
    """cv2.dilate bit-exact: k x k rect-kernel max filter, -inf border."""
    return _morph_u8(x_u8, k, lax.max, 0)


def apply_mask_morph(mask_u8, spec: str):
    """``-p morph:<erode|dilate|open|close>[:k]`` on the PERSON region.

    Masks are 0=person / 255=background, so person-erode is a MAX filter
    of the mask bytes and person-dilate a MIN filter; open/close compose
    them.  Runs on the model-resolution EMA mask before upscale+blur —
    a k x k despeckle there costs ~nothing and maps to the frame ROI
    scaled.  The reference has no morphology (its post-process is
    resize+blur only, libbackscrub.cc:366-371); this is the opt-in
    erode/dilate stage the BASELINE.json config list names."""
    parts = spec.split(":")
    k = int(parts[1]) if len(parts) > 1 and parts[1] else 3
    seq = {"erode": "D", "dilate": "E", "open": "DE", "close": "ED"}.get(parts[0])
    if seq is None:
        raise ValueError(
            f"morph op must be erode|dilate|open|close, got {parts[0]!r}")
    for s in seq:  # D = dilate mask bytes (erodes the person), E = erode
        mask_u8 = dilate_u8(mask_u8, k) if s == "D" else erode_u8(mask_u8, k)
    return mask_u8


def bgr_to_gray_u8(bgr_u8):
    """cv::cvtColor(BGR2GRAY) bit-exact, (..., H, W, 3) BGR u8 ->
    (..., H, W) u8.  OpenCV's gray path uses 15-bit fixed point
    (R 9798, G 19235, B 3735, round-half-up) — NOT the 14-bit set its
    RGB2YUV path uses; verified exhaustively vs cv2 in tests."""
    p = bgr_u8.astype(jnp.int32)
    b, g, r = p[..., 0], p[..., 1], p[..., 2]
    return ((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15
            ).astype(jnp.uint8)


def desaturate_u8(bgr_u8):
    """Grayscale-as-BGR (-p bgdesat background effect; beyond parity —
    the reference's -p namespace only ever shipped bgblur,
    app/deepseg.cc:415-437)."""
    y = bgr_to_gray_u8(bgr_u8)
    return jnp.broadcast_to(y[..., None], y.shape + (3,))


def pixelate_u8(img_u8, block: int):
    """Mosaic (-p bgpixelate:<n> background effect; beyond parity).

    Edge-replicates to a block multiple, box-averages each block x block
    tile (round half up), and nearest-upsamples back — all dense device
    math that XLA fuses into the frame program.  (..., H, W, 3) u8."""
    if block < 2:
        return img_u8
    h, w = img_u8.shape[-3], img_u8.shape[-2]
    hb, wb = -(-h // block), -(-w // block)
    x = img_u8.astype(jnp.int32)
    if hb * block != h:
        pad = jnp.repeat(x[..., -1:, :, :], hb * block - h, axis=-3)
        x = jnp.concatenate([x, pad], axis=-3)
    if wb * block != w:
        pad = jnp.repeat(x[..., :, -1:, :], wb * block - w, axis=-2)
        x = jnp.concatenate([x, pad], axis=-2)
    lead = x.shape[:-3]
    x = x.reshape(*lead, hb, block, wb, block, 3)
    m = (x.sum(axis=(-4, -2)) + block * block // 2) // (block * block)
    up = jnp.repeat(jnp.repeat(m.astype(jnp.uint8), block, axis=-3),
                    block, axis=-2)
    return up[..., :h, :w, :]


def rgb_to_yuv_u8(rgb_u8):
    """cv::cvtColor(RGB2YUV) bit-exact, (..., H, W, 3) u8 -> u8."""
    p = rgb_u8.astype(jnp.int32)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = _descale(r * _Y_R + g * _Y_G + b * _Y_B)
    u = jnp.clip(_descale((b - y) * _U_C + (128 << 14)), 0, 255)
    v = jnp.clip(_descale((r - y) * _V_C + (128 << 14)), 0, 255)
    return jnp.stack([y, u, v], axis=-1).astype(jnp.uint8)


def rgb_to_yuyv(rgb_u8, chroma_order: str = "reference"):
    """RGB -> packed 4:2:2, matching convert_rgb_to_yuyv (app/deepseg.cc:87-106).

    Chroma of each horizontal pixel pair is averaged with truncating /2.
    ``chroma_order="reference"`` reproduces the reference byte order
    [Y0, V, Y1, U] (deepseg.cc:97-104 stores v at offset 1 and u at offset 3);
    ``"yuy2"`` emits the standard [Y0, U, Y1, V].
    Returns (..., H, W, 2) u8, i.e. the 2-bytes-per-pixel YUYV plane.
    """
    yuv = rgb_to_yuv_u8(rgb_u8).astype(jnp.int32)
    y = yuv[..., 0]
    u = yuv[..., 1]
    v = yuv[..., 2]
    u_avg = (u[..., 0::2] + u[..., 1::2]) // 2
    v_avg = (v[..., 0::2] + v[..., 1::2]) // 2
    h, w = y.shape[-2], y.shape[-1]
    if chroma_order == "reference":
        c0, c1 = v_avg, u_avg
    else:
        c0, c1 = u_avg, v_avg
    # pairs: [Y0, c0, Y1, c1] -> (..., H, W/2, 4) -> (..., H, W, 2)
    quad = jnp.stack([y[..., 0::2], c0, y[..., 1::2], c1], axis=-1)
    return quad.reshape(quad.shape[:-2] + (w, 2)).astype(jnp.uint8)


# --- 4:2:0 packs (NV12 / I420): what most camera consumers downstream of a
# virtual webcam negotiate when YUYV (4:2:2) isn't offered.  OpenCV ITUR
# BT.601 video-range encode constants (color_yuv.simd ITUR_BT_601_*,
# shift 20); chroma is sampled at the TOP-LEFT pixel of each 2x2 block,
# matching cv2.cvtColor(COLOR_BGR2YUV_I420) bit-exactly (tested).

_ENC_CRY, _ENC_CGY, _ENC_CBY = 269484, 528482, 102760
_ENC_CRU, _ENC_CGU, _ENC_CBU = -155188, -305135, 460324
_ENC_CGV, _ENC_CBV = -385875, -74448
_ENC_SHIFT = 20


def _bt601_yuv420(bgr_u8):
    """BGR u8 -> (Y (...,H,W), U (...,H/2,W/2), V (...,H/2,W/2)) u8."""
    p = bgr_u8.astype(jnp.int32)
    b, g, r = p[..., 0], p[..., 1], p[..., 2]
    half = 1 << (_ENC_SHIFT - 1)
    y = (r * _ENC_CRY + g * _ENC_CGY + b * _ENC_CBY
         + half + (16 << _ENC_SHIFT)) >> _ENC_SHIFT
    rs, gs, bs = (c[..., 0::2, 0::2] for c in (r, g, b))
    u = (rs * _ENC_CRU + gs * _ENC_CGU + bs * _ENC_CBU
         + half + (128 << _ENC_SHIFT)) >> _ENC_SHIFT
    v = (rs * _ENC_CBU + gs * _ENC_CGV + bs * _ENC_CBV
         + half + (128 << _ENC_SHIFT)) >> _ENC_SHIFT
    clip = lambda x: jnp.clip(x, 0, 255).astype(jnp.uint8)
    return clip(y), clip(u), clip(v)


def bgr_to_nv12(bgr_u8):
    """BGR u8 (..., H, W, 3) -> NV12 (..., 3H/2, W) u8: Y plane then
    interleaved UV rows.  H and W must be even."""
    h, w = bgr_u8.shape[-3], bgr_u8.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f"NV12 needs even geometry, got {w}x{h}")
    y, u, v = _bt601_yuv420(bgr_u8)
    uv = jnp.stack([u, v], axis=-1).reshape(u.shape[:-2] + (h // 2, w))
    return jnp.concatenate([y, uv], axis=-2)


def bgr_to_i420(bgr_u8):
    """BGR u8 (..., H, W, 3) -> I420 flat bytes (..., 3*H*W/2): planar
    Y then U then V, bit-exact with cv2.cvtColor(COLOR_BGR2YUV_I420)."""
    h, w = bgr_u8.shape[-3], bgr_u8.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f"I420 needs even geometry, got {w}x{h}")
    y, u, v = _bt601_yuv420(bgr_u8)
    lead = y.shape[:-2]
    return jnp.concatenate([y.reshape(lead + (h * w,)),
                            u.reshape(lead + (h * w // 4,)),
                            v.reshape(lead + (h * w // 4,))], axis=-1)


# OpenCV ITUR_BT_601 video-range constants (color_yuv: YUV2RGB_YUY2 path),
# verified bit-exact against cv2 in tests.
_BT601_CY, _BT601_CUB, _BT601_CUG = 1220542, 2116026, -409993
_BT601_CVG, _BT601_CVR, _BT601_SHIFT = -852492, 1673527, 20


def yuyv_to_rgb_u8(yuyv_u8, chroma_order: str = "yuy2",
                   convention: str = "bt601", layout: str = "yuyv"):
    """Packed 4:2:2 -> RGB u8 (capture-side decode).

    convention="bt601" (default): ITU-R BT.601 video range, bit-exact with
    cv::COLOR_YUV2RGB_YUY2 — what real V4L2 cameras emit.
    convention="analog": exact inverse of the 0.492/0.877 analog-YUV forward
    used by cv::COLOR_RGB2YUV (the rgb_to_yuyv output path), for roundtrips.
    layout="uyvy": chroma-leading byte order (cv::COLOR_YUV2RGB_UYVY),
    the other common V4L2 4:2:2 format.
    """
    q = yuyv_u8.astype(jnp.int32)
    h, w2 = q.shape[-3], q.shape[-2]
    quad = q.reshape(q.shape[:-3] + (h, w2 // 2, 4))
    if layout == "uyvy":
        c0, y0, c1, y1 = quad[..., 0], quad[..., 1], quad[..., 2], quad[..., 3]
    else:
        y0, c0, y1, c1 = quad[..., 0], quad[..., 1], quad[..., 2], quad[..., 3]
    if chroma_order == "reference":
        v, u = c0, c1
    else:
        u, v = c0, c1
    y = jnp.stack([y0, y1], axis=-1).reshape(q.shape[:-3] + (h, w2))
    u = jnp.repeat(u, 2, axis=-1)
    v = jnp.repeat(v, 2, axis=-1)
    ud = u - 128
    vd = v - 128
    if convention == "bt601":
        yy = jnp.maximum(y - 16, 0) * _BT601_CY
        half = 1 << (_BT601_SHIFT - 1)
        r = (yy + _BT601_CVR * vd + half) >> _BT601_SHIFT
        g = (yy + _BT601_CUG * ud + _BT601_CVG * vd + half) >> _BT601_SHIFT
        b = (yy + _BT601_CUB * ud + half) >> _BT601_SHIFT
    else:
        # 1/0.877*16384=18682, 1/0.492*16384=33301,
        # 0.299/(0.877*0.587)*16384=9516, 0.114/(0.492*0.587)*16384=6467
        r = y + _descale(vd * 18682)
        g = y + _descale(ud * -6467 + vd * -9516)
        b = y + _descale(ud * 33301)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def nv12_to_bgr_u8(nv12_u8):
    """NV12 (..., 3H/2, W) u8 -> BGR u8, bit-exact with
    cv2.COLOR_YUV2BGR_NV12 (BT.601 video range, chroma replicated per
    2x2 block) — device-side ingest for NV12 cameras."""
    hh, w = nv12_u8.shape[-2], nv12_u8.shape[-1]
    h = hh * 2 // 3
    q = nv12_u8.astype(jnp.int32)
    y = q[..., :h, :]
    uv = q[..., h:, :].reshape(q.shape[:-2] + (h // 2, w // 2, 2))
    u = jnp.repeat(jnp.repeat(uv[..., 0], 2, axis=-2), 2, axis=-1) - 128
    v = jnp.repeat(jnp.repeat(uv[..., 1], 2, axis=-2), 2, axis=-1) - 128
    yy = jnp.maximum(y - 16, 0) * _BT601_CY
    half = 1 << (_BT601_SHIFT - 1)
    r = (yy + _BT601_CVR * v + half) >> _BT601_SHIFT
    g = (yy + _BT601_CUG * u + _BT601_CVG * v + half) >> _BT601_SHIFT
    b = (yy + _BT601_CUB * u + half) >> _BT601_SHIFT
    return jnp.clip(jnp.stack([b, g, r], axis=-1), 0, 255).astype(jnp.uint8)


def normalize_u8(x_u8, scale: float, offset: float, dtype=jnp.float32):
    """u8 -> float with per-model scaling (lib/libbackscrub.cc:302)."""
    return x_u8.astype(dtype) * dtype(scale) + dtype(offset)
