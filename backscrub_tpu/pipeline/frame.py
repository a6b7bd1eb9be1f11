"""Whole-frame pipeline: camera frame in, composited YUYV frame out, in ONE
device dispatch.

This replaces the reference's main-loop hot path (app/deepseg.cc:627-690):
grab -> mask (worker thread) -> background fetch/blur -> alpha blend ->
flip -> resize -> RGB2YUYV -> write.  On TPU the entire per-frame compute is
a single jitted program: u8 frame HBM-in, packed YUYV HBM-out, with the EMA
mask as donated carried state.  Host code does only V4L2 I/O and transfers.

The reference's CalcMask thread (app/deepseg.cc:159-286) decoupled camera
FPS from model FPS; here JAX async dispatch plus a double-buffered transfer
ring provides the same overlap without a thread.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .decode import decode_val, ema_update
from .image import (alpha_blend_u8, bgr_to_i420, bgr_to_nv12, desaturate_u8,
                    flip, gaussian_blur, nv12_to_bgr_u8, pixelate_u8,
                    resize_bilinear, rgb_to_yuyv, yuyv_to_rgb_u8)
from .maskgen import MaskGen, postprocess_mask, preprocess


@dataclasses.dataclass
class PipelineConfig:
    width: int = 640           # capture geometry (app/deepseg.cc:363-364 defaults)
    height: int = 480
    out_width: Optional[int] = None   # virtual camera geometry (--vg); None = same
    out_height: Optional[int] = None
    blur_strength: int = 0     # -p bgblur:<odd> (app/deepseg.cc:415-437); 0 = off
    bg_desaturate: bool = False  # -p bgdesat: grayscale background (beyond
                                 # parity; applied before pixelate/blur)
    bg_pixelate: int = 0         # -p bgpixelate:<n>: mosaic the background
                                 # with n x n tiles (beyond parity); 0 = off
    flip_horizontal: bool = False
    flip_vertical: bool = False
    use_bilateral: bool = True
    mask_refine: str = "box"         # "box" (reference 5x5 blur) | "guided"
                                     # (edge-aware guided filter, -p refine:guided)
    mask_morph: str = ""             # -p morph:<erode|dilate|open|close>[:k]
                                     # — cv2-bit-exact morphology on the
                                     # person region at model resolution
    fused_pack: bool = True          # Pallas fused blend+YUYV kernel on TPU
                                     # (bit-exact; ~2.8x the jnp pack stage)
                                     # when output is plain same-geometry
                                     # YUYV with no flips; False = always jnp
    pack_interpret: bool = False     # off-TPU: run the fused pack kernels in
                                     # the Pallas interpreter instead of the
                                     # jnp path — the SHIPPED program shape on
                                     # a CPU mesh (dryrun_multichip / tests);
                                     # no effect on TPU (compiled kernels)
    edge_fused: Optional[bool] = None  # fused phase-split edge path
                                     # (pipeline/edge.py): quadrant resize +
                                     # Pallas bilateral+first-conv and
                                     # tconv+decode+EMA kernels. None = auto
                                     # (on-TPU, pattern permitting); False =
                                     # classic lowerings
    edge_interpret: bool = False     # off-TPU: run the edge kernels in the
                                     # Pallas interpreter (CPU mesh dryrun)
    edge_mega: Optional[bool] = None  # body megakernel (ops/megakernel.py)
                                     # inside the edge path. None = auto
                                     # (on when the span qualifies);
                                     # False = XLA body lowerings
    edge_cont: Optional[bool] = None  # flat continuation chain after the
                                     # prefix cut. None = per-family
                                     # default (ModelSpec.edge_cont:
                                     # measured win for deeplab, loss for
                                     # bodypix — PERF.md round 5);
                                     # True/False forces for A/B probes
    chroma_order: str = "reference"  # or "yuy2" for spec-correct output
    correct_colors: bool = False     # True: proper BGR->RGB before YUV pack
    output_format: str = "yuyv"      # "yuyv" | "bgr" (debug/file sink) |
                                     # "nv12" (Y + interleaved UV rows,
                                     # (3H/2, W)) | "i420" (planar flat
                                     # bytes) — BT.601 4:2:0, cv2-bit-exact
                                     # | "mjpg": device-side JPEG encode
                                     # (coefficients out; host packs
                                     # Huffman — io/streams.py JpegPackingSink)
    out_jpeg_quality: int = 85       # output_format="mjpg": libjpeg quality
    out_jpeg_sampling: str = "420"   # and chroma sampling (420|422|444)
    input_format: str = "bgr"        # "bgr" | "yuyv" | "nv12": raw-camera
                                     # device ingest (decode on device, less
                                     # host->device traffic; BASELINE "frame
                                     # preprocessing ... YUYV->RGB convert")
                                     # | "mjpg": JPEG coefficients from the
                                     # host entropy decoder; IDCT/upsample/
                                     # color run on device (pipeline/jpeg.py)
    jpeg_info: Optional[object] = None  # io.jpeg.JpegInfo, required for
                                     # input_format="mjpg" (static per stream)


class FramePipeline:
    """End-to-end per-frame program with carried EMA state.

    ``step(frame_bgr_u8, background_bgr_u8)`` -> packed output frame.
    ``background`` is a full-size BGR u8 frame (static image pre-resized on
    host, or per-frame video background); pass None to use blur/green modes.
    """

    def __init__(self, model: str, config: PipelineConfig, *,
                 compute_dtype=jnp.float32,
                 precision=None,
                 quantize=None):
        if config.output_format == "yuyv":
            for label, w in [("width", config.width),
                             ("out_width", config.out_width or config.width)]:
                if w % 2:
                    raise ValueError(
                        f"{label}={w}: YUYV output needs an even width "
                        "(chroma is shared per pixel pair)")
        elif config.output_format in ("nv12", "i420"):
            for label, a, b in [("capture", config.width, config.height),
                                ("output", config.out_width or config.width,
                                 config.out_height or config.height)]:
                if a % 2 or b % 2:
                    raise ValueError(
                        f"{label} geometry {a}x{b}: 4:2:0 output "
                        f"({config.output_format}) needs even width and height")
        if config.input_format in ("yuyv", "uyvy") and config.width % 2:
            raise ValueError(
                f"width={config.width}: 4:2:2 ingest needs an even width")
        if config.input_format == "nv12" and (config.width % 2 or config.height % 2):
            raise ValueError(
                f"capture geometry {config.width}x{config.height}: 4:2:0 "
                "(nv12) ingest needs even width and height")
        if config.input_format == "mjpg":
            info = config.jpeg_info
            if info is None:
                raise ValueError("input_format='mjpg' needs jpeg_info "
                                 "(io.jpeg.parse_header of the first frame)")
            if (info.width, info.height) != (config.width, config.height):
                raise ValueError(
                    f"MJPG stream is {info.width}x{info.height} but capture "
                    f"geometry is {config.width}x{config.height}")
        self.out_jpeg_info = None
        self._out_jpeg_qtabs = None
        if config.output_format == "mjpg":
            from ..io.jpeg import make_info
            from .jpeg_enc import quality_to_qtabs
            sf = {"420": ((2, 2), (1, 1), (1, 1)),
                  "422": ((2, 1), (1, 1), (1, 1)),
                  "444": ((1, 1), (1, 1), (1, 1))}[config.out_jpeg_sampling]
            ow_ = config.out_width or config.width
            oh_ = config.out_height or config.height
            self.out_jpeg_info = make_info(ow_, oh_, sf)
            qt = quality_to_qtabs(config.out_jpeg_quality)
            self._out_jpeg_qtabs = np.stack([qt[0], qt[1], qt[1]])
        self.cfg = config
        self.maskgen = MaskGen(model, config.width, config.height,
                               compute_dtype=compute_dtype, precision=precision,
                               use_bilateral=config.use_bilateral,
                               refine=config.mask_refine,
                               morph=config.mask_morph,
                               edge_fused=config.edge_fused,
                               edge_interpret=config.edge_interpret,
                               edge_mega=config.edge_mega,
                               edge_cont=config.edge_cont,
                               quantize=quantize)
        self.spec = self.maskgen.spec
        self.geo = self.maskgen.geo
        self.precision = self.maskgen.precision  # per-spec default resolved
        ow = config.out_width or config.width
        oh = config.out_height or config.height
        self.out_geo = (oh, ow)
        # default background: green screen (app/deepseg.cc:596-603 fallback);
        # kept device-resident so green mode pays no per-frame upload
        self.green = np.zeros((config.height, config.width, 3), np.uint8)
        self.green[..., 1] = 255
        self._green_dev = None
        self._steps = {}  # (bg_mode, flip_h, flip_v, active) -> jitted step
        self._step_bg = self._get_step("explicit", config.flip_horizontal,
                                       config.flip_vertical, True)
        self._step_blur = self._get_step("blur", config.flip_horizontal,
                                         config.flip_vertical, True)

    def _get_step(self, bg_mode: str, flip_h: bool, flip_v: bool, active: bool):
        """Jitted step variant for a runtime-toggleable combination
        (debug keys s/h/v toggle filter and flips, app/deepseg.cc:779-803);
        variants compile lazily and are cached."""
        key = (bg_mode, flip_h, flip_v, active)
        if key not in self._steps:
            fn = self._make_step(bg_mode, flip_h, flip_v, active)
            donate = (2,) if bg_mode == "blur" else (3,)
            self._steps[key] = jax.jit(fn, donate_argnums=donate)
        return self._steps[key]

    def _make_step(self, bg_mode: str, flip_h: bool, flip_v: bool,
                   active: bool = True):
        cfg = self.cfg
        geo = self.geo
        spec = self.spec
        model = self.maskgen.model

        def finish(comp, mask, new_ema):
            comp = flip(comp, flip_h, flip_v)
            oh, ow = self.out_geo
            if (oh, ow) != (cfg.height, cfg.width):
                comp = jnp.clip(jnp.round(resize_bilinear(
                    comp.astype(jnp.float32), oh, ow, precision=self.precision)),
                    0, 255).astype(jnp.uint8)
            if cfg.output_format == "bgr":
                return comp, mask, new_ema
            if cfg.output_format == "mjpg":
                # device-side JPEG encode: quantized coefficients out; the
                # host only Huffman-packs them (pipeline/jpeg_enc.py)
                from .jpeg_enc import encode_jpeg_coefs
                coefs = encode_jpeg_coefs(
                    comp, jnp.asarray(self._out_jpeg_qtabs),
                    self.out_jpeg_info)
                return tuple(coefs), mask, new_ema
            if cfg.output_format == "nv12":
                return bgr_to_nv12(comp), mask, new_ema
            if cfg.output_format == "i420":
                return bgr_to_i420(comp), mask, new_ema
            src = comp[..., ::-1] if cfg.correct_colors else comp
            yuyv = rgb_to_yuyv(src, chroma_order=cfg.chroma_order)
            # flatten to (..., H, 2W) raw bytes: the exact v4l2 write buffer,
            # and a transfer-friendly device layout (minor dim 2W, not 2)
            yuyv = yuyv.reshape(yuyv.shape[:-2] + (yuyv.shape[-2] * 2,))
            return yuyv, mask, new_ema

        def compose(params, frame, bg, ema):
            if cfg.input_format in ("yuyv", "uyvy"):
                # raw camera bytes (H, 2W) u8 -> BGR on device (the host
                # uploads the kernel buffer verbatim; decode rides the VPU)
                yuyv = frame.reshape(frame.shape[:-1] + (frame.shape[-1] // 2, 2))
                frame = yuyv_to_rgb_u8(yuyv,
                                       layout=cfg.input_format)[..., ::-1]
            elif cfg.input_format == "nv12":
                # raw 4:2:0 camera bytes (3H/2, W) u8 -> BGR on device
                frame = nv12_to_bgr_u8(frame)
            elif cfg.input_format == "mjpg":
                # (coefs tuple, qtabs) from the host entropy decoder ->
                # BGR on device, bit-exact vs cv2.imdecode (pipeline/jpeg.py)
                from .jpeg import decode_jpeg_bgr
                coefs, qtabs = frame
                frame = decode_jpeg_bgr(coefs, qtabs, cfg.jpeg_info)
            if not active:
                # filter off ('s' key): passthrough convert only
                # (app/deepseg.cc:662-664); EMA state is left untouched
                mask = jnp.full(frame.shape[:-1], 255, jnp.uint8)
                return finish(frame, mask, ema)

            # --- mask chain (libbackscrub path), fused in the same program;
            # the phase-split edge path replaces it when active
            # (pipeline/edge.py — first conv + tconv/decode/EMA as
            # quadrant-layout kernels, EMA carried in quadrant layout)
            if self.maskgen.edge is not None:
                mask, new_ema = self.maskgen.edge.step_mask(params, frame, ema)
            else:
                x = preprocess(frame, geo, spec, use_bilateral=cfg.use_bilateral,
                               precision=self.precision)
                out = model.raw_fn(params, x[None] if x.ndim == 3 else x)
                out = out[0] if x.ndim == 3 else out
                val = decode_val(out.astype(jnp.float32), spec)
                new_ema = ema_update(ema, val)
                mask = postprocess_mask(new_ema, geo, precision=self.precision,
                                        refine=cfg.mask_refine, frame_bgr=frame,
                                        morph=cfg.mask_morph)

            # --- background (app/deepseg.cc:645-658) + -p effects, all
            # fused device stages: desaturate -> pixelate -> blur
            bg_frame = frame if bg_mode == "blur" else bg
            if cfg.bg_desaturate:
                bg_frame = desaturate_u8(bg_frame)
            if cfg.bg_pixelate:
                bg_frame = pixelate_u8(bg_frame, cfg.bg_pixelate)
            if cfg.blur_strength:
                bg_f = gaussian_blur(bg_frame.astype(jnp.float32), cfg.blur_strength)
                bg_frame = jnp.clip(jnp.round(bg_f), 0, 255).astype(jnp.uint8)

            # --- composite + output conversion (app/deepseg.cc:661-681)
            if (cfg.fused_pack
                    and cfg.output_format in ("yuyv", "nv12", "i420")
                    and not flip_h and not flip_v
                    and self.out_geo == (cfg.height, cfg.width)):
                from .maskgen import _on_tpu
                on_tpu = _on_tpu()
                if on_tpu or cfg.pack_interpret:
                    # Pallas fused blend + fixed-point YUV + pack:
                    # bit-exact vs the jnp path below, one VMEM pass
                    # (ops/pallas_kernels.py; leading stream axes flatten
                    # into rows).  Off-TPU with pack_interpret=True the
                    # kernels run in the Pallas interpreter so the shipped
                    # program shape is what a CPU mesh dryrun exercises.
                    interp = not on_tpu
                    bgb = (jnp.broadcast_to(bg_frame, frame.shape)
                           if bg_frame.ndim < frame.ndim else bg_frame)
                    if cfg.output_format == "yuyv":
                        from ..ops.pallas_kernels import blend_pack_yuyv
                        yuyv = blend_pack_yuyv(
                            frame, bgb, mask,
                            chroma_order=cfg.chroma_order,
                            correct_colors=cfg.correct_colors,
                            interpret=interp)
                        return yuyv, mask, new_ema
                    from ..ops.pallas_kernels import blend_pack_420
                    yy, uv = blend_pack_420(frame, bgb, mask, interpret=interp)
                    if cfg.output_format == "nv12":
                        return (jnp.concatenate([yy, uv], axis=-2),
                                mask, new_ema)
                    lead = yy.shape[:-2]
                    hh, ww = yy.shape[-2:]
                    flat = jnp.concatenate(
                        [yy.reshape(lead + (hh * ww,)),
                         uv[..., 0::2].reshape(lead + (hh * ww // 4,)),
                         uv[..., 1::2].reshape(lead + (hh * ww // 4,))],
                        axis=-1)
                    return flat, mask, new_ema
            comp = alpha_blend_u8(bg_frame, frame, mask)
            return finish(comp, mask, new_ema)

        if bg_mode == "blur":
            return lambda params, frame, ema: compose(params, frame, None, ema)
        return compose

    def step(self, frame_bgr_u8, background_bgr_u8=None, *,
             flip_horizontal=None, flip_vertical=None, filter_active=True):
        """Process one frame; returns (packed_frame, mask) as device arrays.

        flips default to the construction config; passing them (and
        filter_active) selects a cached jit variant — this is how the debug
        window's runtime toggles work."""
        fh = self.cfg.flip_horizontal if flip_horizontal is None else flip_horizontal
        fv = self.cfg.flip_vertical if flip_vertical is None else flip_vertical
        if self.cfg.input_format == "mjpg":
            coefs, qtabs = frame_bgr_u8
            frame = (tuple(jnp.asarray(c) for c in coefs), jnp.asarray(qtabs))
        else:
            frame = jnp.asarray(frame_bgr_u8)
        params = self.maskgen.model.params
        # no explicit background + any bg effect -> the camera frame itself
        # is the background source (bgblur mode, app/deepseg.cc:652-655;
        # bgpixelate/bgdesat compose the same way, e.g. a privacy mosaic)
        if background_bgr_u8 is None and (self.cfg.blur_strength or
                                          self.cfg.bg_pixelate or
                                          self.cfg.bg_desaturate):
            step = self._get_step("blur", fh, fv, filter_active)
            out, mask, self.maskgen.ema = step(params, frame, self.maskgen.ema)
        else:
            if background_bgr_u8 is None:
                if self._green_dev is None:
                    self._green_dev = jnp.asarray(self.green)
                bg = self._green_dev
            else:
                bg = jnp.asarray(background_bgr_u8)
            step = self._get_step("explicit", fh, fv, filter_active)
            out, mask, self.maskgen.ema = step(params, frame, bg, self.maskgen.ema)
        return out, mask

    def reset(self):
        self.maskgen.reset()
