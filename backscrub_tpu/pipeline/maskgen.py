"""Mask generation: the TPU equivalent of bs_maskgen_new/process/delete.

The reference pipeline (``lib/libbackscrub.cc:279-372``) is: ROI crop ->
resize -> BGR2RGB -> bilateral filter -> normalize -> CNN -> per-model
decode with temporal EMA -> upscale -> 5x5 box blur, with the EMA mask as
cross-frame state.  Here the whole chain is ONE jitted XLA program; the EMA
state is a donated device buffer, so steady-state processing is
HBM-in/HBM-out with no host round-trips.

Mask semantics (unchanged): u8, 0 = person (keep camera pixel), 255 =
background (replace); area outside the aspect-ratio ROI is always 255.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.executor import CompiledModel, load_model
from ..models.specs import ModelSpec, resolve_model_path, spec_for_model
from .decode import decode_val, ema_update
from .geometry import RoiGeometry, compute_roi
from .image import (bilateral5, box_blur, box_blur_u8_exact, guided_filter,
                    resize_bilinear, resize_bilinear_u8_exact)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


import functools

# Precision for the frame/mask resize contractions only (the CNN keeps the
# caller's precision).  These are 2-tap-per-row interpolation matrices over
# u8-range values: a single-pass bf16 matmul keeps every output within
# ~±1 of the f32 result (mask bytes shift only at decode boundaries,
# IoU-neutral — golden-gated in tests/test_pipeline.py), while HIGHEST
# costs 6 MXU passes — measured 35us of the 175us 720p step across the
# three resize einsums, 5x more than DEFAULT for invisible extra bits.
RESIZE_PRECISION = jax.lax.Precision.DEFAULT


def _resize_precision(precision):
    """Multi-pass callers (HIGHEST / the per-family HIGH default) get the
    fast single-pass resize — the 2-tap u8-range interpolation matrices
    stay within +-1 at one bf16 pass (PERF.md round-3 item 1), so chaining
    extra MXU passes there buys nothing; an explicit DEFAULT (bf16 mode)
    is already single-pass."""
    return RESIZE_PRECISION if precision in (
        None, jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH) else precision


@functools.lru_cache(maxsize=32)
def _fold_blur_matrices(sh: int, sw: int, out_h: int, out_w: int):
    """(blur5 ∘ bilinear-upscale) as one dense matrix per axis."""
    from ..ops.misc import resize_matrix
    from .image import blur_matrix
    ah = (blur_matrix(out_h, 5).astype(np.float64)
          @ resize_matrix(sh, out_h, False, True).astype(np.float64))
    aw = (blur_matrix(out_w, 5).astype(np.float64)
          @ resize_matrix(sw, out_w, False, True).astype(np.float64))
    return ah.astype(np.float32), aw.astype(np.float32)


def preprocess(frame_bgr_u8, geo: RoiGeometry, spec: ModelSpec,
               use_bilateral: bool = True, precision=None, dtype=jnp.float32):
    """Frame (..., H, W, 3) BGR u8 -> model input (..., in_h, in_w, 3) float."""
    r = geo.roi
    roi = frame_bgr_u8[..., r.y:r.y + r.h, r.x:r.x + r.w, :]
    small = resize_bilinear(roi.astype(dtype), geo.in_roi.h, geo.in_roi.w,
                            precision=_resize_precision(precision))
    # quantize back to u8 grid: the reference resizes in u8 before filtering
    small = jnp.round(small)
    # letterbox into the model canvas (margins black, libbackscrub.cc:250,288)
    ix = geo.in_roi.x
    pad = [(0, 0)] * (small.ndim - 3) + [(geo.in_roi.y, geo.model_in_h - geo.in_roi.y - geo.in_roi.h),
                                         (ix, geo.model_in_w - ix - geo.in_roi.w), (0, 0)]
    canvas = jnp.pad(small, pad)
    rgb = canvas[..., ::-1]  # BGR -> RGB (libbackscrub.cc:290)
    if use_bilateral:
        # u8-domain filter (libbackscrub.cc:297); on TPU the Pallas stencil
        # kernel is bit-identical to the jnp version and ~1.2x faster
        # (batched frames grid per-frame — the jnp fallback at B=16 cost
        # ~8us/frame vs ~4 for the kernel)
        if rgb.ndim in (3, 4) and _on_tpu():
            from ..ops.pallas_kernels import bilateral5_pallas
            rgb = jnp.round(bilateral5_pallas(rgb.astype(jnp.float32))).astype(dtype)
        else:
            rgb = jnp.round(bilateral5(rgb))
    return rgb * dtype(spec.scale) + dtype(spec.offset)


def postprocess_mask(ema_u8, geo: RoiGeometry, precision=None,
                     u8_exact: bool = False, refine: str = "box",
                     frame_bgr=None, refine_radius: int = 4,
                     morph: str = "", fold_blur: Optional[bool] = None):
    """EMA mask (..., oh, ow) u8 -> full-frame mask (..., H, W) u8.

    Crop the model-output ROI, upscale to the frame ROI, 5x5 box blur, and
    embed in an all-255 canvas (libbackscrub.cc:366-371 + mask init :248).

    ``refine="guided"`` (with ``frame_bgr``) replaces the uniform box blur
    with an edge-aware guided filter over the camera frame's luma — the
    silhouette boundary stays tight where the image has contrast instead
    of being smeared by a fixed 5x5 window (beyond-parity quality mode,
    CLI ``-p refine:guided``).

    ``u8_exact=True`` runs the upscale+blur with OpenCV's u8 fixed-point
    semantics bit-exactly (cv2's u8 and float resize paths differ by +-1 on
    ~13% of pixels) — byte parity with the reference binary's post-decode
    stages, at no measured throughput cost (the int32 interpolation
    contraction at mask resolution is within tunnel variance of the float
    path on a v5e: ~6-11k masks/s both ways at 720p).
    """
    o = geo.out_roi
    small = ema_u8[..., o.y:o.y + o.h, o.x:o.x + o.w]
    if morph:
        # optional despeckle at model resolution (-p morph:open:3 etc.;
        # cv2-bit-exact erode/dilate, pipeline/image.py)
        from .image import apply_mask_morph
        small = apply_mask_morph(small, morph)
    if refine == "guided":
        if u8_exact:
            raise ValueError(
                "refine='guided' and u8_exact byte parity are contradictory: "
                "guided refinement intentionally deviates from the reference "
                "binary's box-blur path — request one or the other")
        if frame_bgr is None:
            raise ValueError("refine='guided' needs the camera frame as guide")
        r = geo.roi
        small_f = small.astype(jnp.float32)[..., None]
        up = resize_bilinear(small_f, geo.roi.h, geo.roi.w,
                             precision=precision)[..., 0] / 255.0
        roi = frame_bgr[..., r.y:r.y + r.h, r.x:r.x + r.w, :].astype(jnp.float32)
        # BT.601 luma as the guide signal, scaled to [0, 1]
        luma = (roi[..., 2] * 0.299 + roi[..., 1] * 0.587 + roi[..., 0] * 0.114) / 255.0
        # radius 4 at full resolution: IoU vs the box-blur golden stays
        # ~0.96 on real frames (r=2 -> 0.99, r=8 -> 0.94); refinement
        # strength is an intentional, configurable deviation
        q = guided_filter(luma, up, radius=refine_radius, eps=1e-3)
        m = jnp.clip(jnp.round(q * 255.0), 0, 255).astype(jnp.uint8)
        pad = [(0, 0)] * (m.ndim - 2) + [(r.y, geo.frame_h - r.y - r.h),
                                         (r.x, geo.frame_w - r.x - r.w)]
        return jnp.pad(m, pad, constant_values=255)
    if u8_exact:
        up8 = resize_bilinear_u8_exact(small[..., None], geo.roi.h, geo.roi.w)
        m = box_blur_u8_exact(up8, 5)[..., 0]
        r = geo.roi
        pad = [(0, 0)] * (m.ndim - 2) + [(r.y, geo.frame_h - r.y - r.h),
                                         (r.x, geo.frame_w - r.x - r.w)]
        return jnp.pad(m, pad, constant_values=255)
    sh, sw = small.shape[-2], small.shape[-1]
    if fold_blur is None:
        # auto: blur∘resize is one precomputable linear operator per axis,
        # saving the separate blur passes + their border ops (~18us of the
        # 720p step) — but it skips the round between resize and blur that
        # coarse outputs need to quantize like the reference's u8 path
        # (BodyPix's 33x33 drops below the IoU bar without it), so fold
        # only for fine model outputs
        fold_blur = min(sh, sw) >= 64
    if fold_blur:
        ah, aw = _fold_blur_matrices(sh, sw, geo.roi.h, geo.roi.w)
        rp = _resize_precision(precision)
        y = jnp.einsum("oh,...hw->...ow", jnp.asarray(ah),
                       small.astype(jnp.float32), precision=rp)
        y = jnp.einsum("pw,...ow->...op", jnp.asarray(aw), y,
                       precision=rp)
        m = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
        r = geo.roi
        pad = [(0, 0)] * (m.ndim - 2) + [(r.y, geo.frame_h - r.y - r.h),
                                         (r.x, geo.frame_w - r.x - r.w)]
        return jnp.pad(m, pad, constant_values=255)
    small_f = small.astype(jnp.float32)[..., None]
    up = resize_bilinear(small_f, geo.roi.h, geo.roi.w,
                         precision=_resize_precision(precision))
    # the reference resizes in u8 then blurs u8; round between stages so
    # boundary pixels quantize the same way (matters for coarse outputs
    # like BodyPix's 33x33)
    up = jnp.round(up)
    blurred = box_blur(up, 5)
    m = jnp.clip(jnp.round(blurred[..., 0]), 0, 255).astype(jnp.uint8)
    r = geo.roi
    pad = [(0, 0)] * (m.ndim - 2) + [(r.y, geo.frame_h - r.y - r.h),
                                     (r.x, geo.frame_w - r.x - r.w)]
    return jnp.pad(m, pad, constant_values=255)


class MaskGen:
    """bs_maskgen_new equivalent (lib/libbackscrub.h:31-39 API surface).

    Parameters mirror the C API (model path, frame geometry, debug/stage
    callbacks); ``process`` mirrors bs_maskgen_process.  Callbacks fire
    per-stage only in ``fused=False`` mode — the fused mode runs the whole
    chain in one dispatch, so there are no host-visible stage boundaries
    (the timing seam moves to jax.profiler traces).
    """

    def __init__(self, model: str, width: int, height: int, *,
                 compute_dtype=jnp.float32,
                 precision=None,
                 use_bilateral: bool = True,
                 fused: bool = True,
                 u8_exact_post: Optional[bool] = None,
                 refine: str = "box",
                 morph: str = "",
                 quantize=None,
                 edge_fused: Optional[bool] = None,
                 edge_interpret: bool = False,
                 edge_mega: Optional[bool] = None,
                 edge_cont: Optional[bool] = None,
                 onprep: Optional[Callable] = None,
                 oninfer: Optional[Callable] = None,
                 onmask: Optional[Callable] = None,
                 ondebug: Optional[Callable] = None):
        self.model_path = resolve_model_path(model)
        self.spec = spec_for_model(self.model_path)
        if precision is None:
            # per-family default (ModelSpec.mxu_precision): the 257x257
            # FLOP-heavy families run one-pass bf16 MXU, the tiny families
            # HIGHEST — chosen from measured step time + decode-margin
            # evidence (tools/prec_parity.py, PERF.md round-4 section)
            precision = getattr(jax.lax.Precision,
                                self.spec.mxu_precision.upper())
        self.model: CompiledModel = load_model(self.model_path,
                                               compute_dtype=compute_dtype,
                                               precision=precision,
                                               quantize=quantize)
        ih, iw = self.model.input_shape[1:3]
        oh, ow = self.model.output_shape[1:3]
        want = self.spec.expected_channels()
        got = self.model.output_shape[-1]
        if want is not None and got != want:
            raise ValueError(
                f"model output has {got} channels but decode rule "
                f"{self.spec.decode!r} expects {want}; check the model/spec "
                f"pairing (filename-keyed, models/specs.py)")
        self.geo = compute_roi(width, height, iw, ih, ow, oh)
        self.precision = precision
        self.use_bilateral = use_bilateral
        self.fused = fused
        if u8_exact_post is None:
            # env default so fixed-signature entry points (the C ABI in
            # native/bs_capi.cc) can opt into byte-exact post stages too
            import os
            u8_exact_post = os.environ.get(
                "BACKSCRUB_U8_EXACT", "").lower() in ("1", "true", "on")
        self.u8_exact_post = u8_exact_post
        if refine not in ("box", "guided"):
            raise ValueError(f"refine must be 'box' or 'guided', got {refine!r}")
        self.refine = refine
        if morph:
            # fail at construction, not first trace (-p morph:* contract)
            op = morph.split(":")[0]
            if op not in ("erode", "dilate", "open", "close"):
                raise ValueError(
                    f"morph op must be erode|dilate|open|close, got {op!r}")
        self.morph = morph
        self.onprep, self.oninfer, self.onmask, self.ondebug = onprep, oninfer, onmask, ondebug
        # Fused phase-split edge path (pipeline/edge.py): replaces the
        # first conv + transpose-conv tail with quadrant-layout einsums and
        # Pallas kernels when the model matches the pattern.  Auto-on for
        # the fused mode on TPU (compiled kernels) or with edge_interpret
        # (CPU mesh dryrun/tests); edge_fused=False forces the classic path.
        self.edge = None
        if fused and edge_fused is not False:
            want = edge_fused or (edge_fused is None
                                  and (_on_tpu() or edge_interpret))
            if want:
                from .edge import EdgeFused, edge_applicable
                info = edge_applicable(self.model, self.spec, self.geo,
                                       refine=refine,
                                       u8_exact=self.u8_exact_post,
                                       morph=morph, quantize=quantize)
                if info is not None:
                    self.edge = EdgeFused(
                        self.model, self.geo, self.spec, info,
                        use_bilateral=use_bilateral, precision=precision,
                        interpret=not _on_tpu(), refine=refine, morph=morph,
                        u8_exact=self.u8_exact_post, mega=edge_mega,
                        cont=(self.spec.edge_cont if edge_cont is None
                              else edge_cont))
                elif edge_fused:
                    raise ValueError(
                        "edge_fused=True but the model/post configuration "
                        "does not match the fusable edge pattern")
        # EMA state shape: the fused edge tail carries it in phase-major
        # quadrant layout (pipeline/edge.py); uniform init, so layouts are
        # interchangeable at reset time
        self.ema_shape = (self.edge.ema_shape if self.edge is not None
                          else (oh, ow))
        self.ema = jnp.full(self.ema_shape, 255, jnp.uint8)
        self._dbg(f"loaded {self.model_path} ({self.spec.kind}, "
                  f"decode={self.spec.decode})")
        self._dbg(f"model input {iw}x{ih}, output {ow}x{oh}; frame "
                  f"{width}x{height}; roi={self.geo.roi} in_roi={self.geo.in_roi}")

        def _step(params, frame, ema):
            if self.edge is not None:
                return self.edge.step_mask(params, frame, ema)
            x = preprocess(frame, self.geo, self.spec,
                           use_bilateral=self.use_bilateral,
                           precision=self.precision, dtype=jnp.float32)
            out = self.model.raw_fn(params, x[None] if x.ndim == 3 else x)
            out = out[0] if x.ndim == 3 else out
            val = decode_val(out.astype(jnp.float32), self.spec)
            new_ema = ema_update(ema, val)
            mask = postprocess_mask(new_ema, self.geo, precision=self.precision,
                                    u8_exact=self.u8_exact_post,
                                    refine=self.refine, frame_bgr=frame,
                                    morph=self.morph)
            return mask, new_ema

        self._step = jax.jit(_step, donate_argnums=(2,))
        # split stages for callback/debug mode
        self._pre = jax.jit(lambda frame: preprocess(
            frame, self.geo, self.spec, use_bilateral=self.use_bilateral,
            precision=self.precision))
        self._infer = jax.jit(lambda params, x: self.model.raw_fn(params, x[None])[0])
        self._post = jax.jit(lambda out, ema, frame: self._decode_post(out, ema, frame),
                             donate_argnums=(1,))

    def _dbg(self, msg: str):
        """Injected debug output (lib/libbackscrub.h:22-23 ondebug seam)."""
        if self.ondebug:
            self.ondebug(msg)

    def _decode_post(self, out, ema, frame=None):
        val = decode_val(out.astype(jnp.float32), self.spec)
        new_ema = ema_update(ema, val)
        return postprocess_mask(new_ema, self.geo, precision=self.precision,
                                u8_exact=self.u8_exact_post,
                                refine=self.refine, frame_bgr=frame,
                                morph=self.morph), new_ema

    def process(self, frame_bgr_u8) -> np.ndarray:
        """Frame (H, W, 3) BGR u8 -> mask (H, W) u8. bs_maskgen_process equivalent."""
        frame = jnp.asarray(frame_bgr_u8)
        expected = (self.geo.frame_h, self.geo.frame_w, 3)
        if frame.shape != expected:
            raise ValueError(
                f"frame shape {tuple(frame.shape)} != expected {expected} "
                f"(geometry fixed at bs_maskgen_new time, like the reference)")
        if self.fused:
            mask, self.ema = self._step(self.model.params, frame, self.ema)
            out = np.asarray(mask)
            # mask-ready stage hook fires in fused mode too (the reference
            # fires it after decode, lib/libbackscrub.cc:363-364); prep/infer
            # hooks need fused=False since the fused dispatch has no
            # host-visible stage boundaries
            if self.onmask:
                self.onmask()
            return out
        x = self._pre(frame)
        if self.onprep:
            self.onprep()
        out = self._infer(self.model.params, x)
        if self.oninfer:
            self.oninfer()
        mask, self.ema = self._post(out, self.ema, frame)
        if self.onmask:
            self.onmask()
        return np.asarray(mask)

    def process_bytes(self, frame_bytes: bytes, height: int, width: int) -> bytes:
        """Raw-buffer entry point for the C ABI (native/bs_capi.cc):
        BGR u8 bytes in, mask u8 bytes out."""
        frame = np.frombuffer(frame_bytes, np.uint8).reshape(height, width, 3)
        return self.process(frame).tobytes()

    def reset(self):
        self.ema = jnp.full(self.ema_shape, 255, jnp.uint8)


def _c_stage_callback(addr: int, ctx_addr: int) -> Callable[[], None]:
    """Wrap a raw C function pointer ``void (*)(void *)`` into a Python
    callable bound to the caller's opaque context pointer — the stage-hook
    shape of lib/libbackscrub.h:24-30."""
    import ctypes
    fn = ctypes.CFUNCTYPE(None, ctypes.c_void_p)(addr)
    ctx = ctypes.c_void_p(ctx_addr)
    return lambda: fn(ctx)


def _c_debug_callback(addr: int, ctx_addr: int) -> Callable[[str], None]:
    """Wrap ``void (*)(void *, const char *)`` (the ondebug seam,
    lib/libbackscrub.h:22-23)."""
    import ctypes
    fn = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_char_p)(addr)
    ctx = ctypes.c_void_p(ctx_addr)
    return lambda msg: fn(ctx, str(msg).encode("utf-8", "replace"))


def parse_capi_options(options: str) -> dict:
    """Parse the ``bs_maskgen_new_ex`` options string into MaskGen kwargs.

    Comma-separated tokens mirroring the CLI's ``-p`` namespace so native
    consumers reach the same beyond-parity pipeline the Python CLI does:

    - ``refine:guided`` — edge-aware guided-filter mask refinement
    - ``morph:<erode|dilate|open|close>[:k]`` — mask morphology
    - ``u8exact`` — byte-exact OpenCV u8 post stages
    - ``no-bilateral`` — skip the bilateral prefilter

    Unknown tokens raise (surfaced as a NULL context + ondebug message
    through the C ABI rather than a silently ignored option).
    """
    kw = {}
    for tok in filter(None, (t.strip() for t in (options or "").split(","))):
        if tok == "u8exact":
            kw["u8_exact_post"] = True
        elif tok == "no-bilateral":
            kw["use_bilateral"] = False
        elif tok.startswith("refine:"):
            kw["refine"] = tok.split(":", 1)[1]
        elif tok.startswith("morph:"):
            kw["morph"] = tok.split(":", 1)[1]
        else:
            raise ValueError(
                f"unknown maskgen option {tok!r}; supported: refine:guided, "
                "morph:<erode|dilate|open|close>[:k], u8exact, no-bilateral")
    return kw


def maskgen_for_capi(model: str, width: int, height: int,
                     options: str = "",
                     ondebug_addr: int = 0, onprep_addr: int = 0,
                     oninfer_addr: int = 0, onmask_addr: int = 0,
                     caller_ctx_addr: int = 0) -> MaskGen:
    """Factory used by the embedded-CPython C ABI (native/bs_capi.cc).

    Receives the consumer's raw callback pointers; when either stage hook
    (onprep/oninfer) is non-null the staged (fused=False) pipeline is
    selected so all three hooks fire per frame in reference order
    (lib/libbackscrub.cc:303,311,363).  With only onmask/ondebug set, the
    fully fused single-dispatch path is kept.  ``options`` carries the
    ``-p``-namespace settings (see parse_capi_options) so the C surface
    is not a poorer pipeline than the Python CLI.
    """
    staged = bool(onprep_addr or oninfer_addr)
    kw = parse_capi_options(options)
    if onprep_addr:
        kw["onprep"] = _c_stage_callback(onprep_addr, caller_ctx_addr)
    if oninfer_addr:
        kw["oninfer"] = _c_stage_callback(oninfer_addr, caller_ctx_addr)
    if onmask_addr:
        kw["onmask"] = _c_stage_callback(onmask_addr, caller_ctx_addr)
    if ondebug_addr:
        kw["ondebug"] = _c_debug_callback(ondebug_addr, caller_ctx_addr)
    return MaskGen(model, width, height, fused=not staged, **kw)


# C-style aliases preserving the reference API shape (lib/libbackscrub.h:13-39)
def bs_maskgen_new(model: str, width: int, height: int, **kwargs) -> MaskGen:
    return MaskGen(model, width, height, **kwargs)


def bs_maskgen_process(ctx: MaskGen, frame, out_mask: Optional[np.ndarray] = None):
    mask = ctx.process(frame)
    if out_mask is not None:
        out_mask[...] = mask
        return True
    return mask


def bs_maskgen_delete(ctx: MaskGen) -> None:
    ctx.reset()


def bs_tensorflow_version() -> str:
    """API-parity shim for bs_tensorflow_version (lib/libbackscrub.cc:150)."""
    return f"jax-{jax.__version__}"
