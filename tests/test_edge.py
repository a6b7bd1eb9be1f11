"""Fused phase-split edge path (pipeline/edge.py) parity + gating.

The edge path replaces the preprocess + first conv and the transpose-conv
tail + decode/EMA/upscale with quadrant-layout operators (CPU tests run
the Pallas front kernel in interpret mode — the same program shape the
TPU compiles).  Parity bar: the tail's channel-difference dot reorders
float summation vs computing both channels (same ±1-ulp class as batched
serving, CLAUDE.md), so masks may differ by ±1 on threshold-boundary
pixels on a small fraction of bytes; everything else is bit-exact.
"""

import numpy as np
import pytest

from conftest import model_path

from backscrub_tpu.pipeline.maskgen import MaskGen
from backscrub_tpu.pipeline.edge import (
    EdgeFused, detect_edge, edge_applicable, front_axis_matrix,
    quadrant_upscale_matrices)


def _noisy_frames(shape, n=3, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, shape, np.uint8).astype(np.int16)
    out = []
    for _ in range(n):
        noise = rng.integers(-6, 7, shape, np.int16)
        out.append(np.clip(base + noise, 0, 255).astype(np.uint8))
    return out


def _assert_mask_parity(a, b, max_abs=1, max_frac=0.005):
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    nd = int((d > 0).sum())
    assert int(d.max()) <= max_abs, f"max byte diff {int(d.max())} > {max_abs}"
    assert nd / d.size <= max_frac, f"{100*nd/d.size:.3f}% bytes differ"


def _compare_paths(name, w, h, n=3, **kw):
    path = model_path(name)
    mg_ref = MaskGen(path, w, h, edge_fused=False, **kw)
    mg_e = MaskGen(path, w, h, edge_fused=True, **kw)
    assert mg_e.edge is not None and mg_e.edge.interpret
    for f in _noisy_frames((h, w, 3), n=n):
        _assert_mask_parity(np.asarray(mg_ref.process(f)),
                            np.asarray(mg_e.process(f)))
    return mg_e


def test_edge_parity_two_channel_front_tail():
    """Google Meet lite (two-channel decode): front + tail both fuse."""
    mg = _compare_paths("segm_lite_v681.tflite", 640, 480)
    assert mg.edge.info.front_ok and mg.edge.info.tail_ok
    # EMA state is carried in phase-major quadrant layout
    oh, ow = mg.model.output_shape[1:3]
    assert mg.ema_shape == (2, 2, oh // 2, ow // 2)
    assert mg.ema.shape == mg.ema_shape
    mg.reset()
    assert mg.ema.shape == mg.ema_shape


def test_edge_parity_threshold_decode():
    """MLKit selfie (sigmoid-threshold decode): the tail collapses to an
    out-vs-logit(threshold) comparison; must match LOGISTIC + threshold."""
    mg = _compare_paths(
        "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
        320, 240)
    assert mg.edge.info.front_ok and mg.edge.info.tail_ok
    assert mg.edge.info.tail_kind == "threshold"


def test_edge_parity_guided_refine_front_only():
    """Non-default post (guided refine) degrades to front-only fusion and
    still matches the classic path."""
    mg = _compare_paths("segm_lite_v681.tflite", 640, 480, n=2,
                        refine="guided")
    assert mg.edge.info.front_ok and not mg.edge.info.tail_ok
    oh, ow = mg.model.output_shape[1:3]
    assert mg.ema_shape == (oh, ow)  # standard EMA layout without the tail


def test_edge_gating():
    path = model_path("segm_lite_v681.tflite")
    mg = MaskGen(path, 640, 480, edge_fused=False)
    model, spec, geo = mg.model, mg.spec, mg.geo
    info = edge_applicable(model, spec, geo)
    assert info is not None and info.front_ok and info.tail_ok
    # morphology / u8-exact post / guided refine keep the fold_blur-style
    # fused tail off (postprocess falls back to the classic stages)
    for kw in (dict(morph="open:3"), dict(u8_exact=True),
               dict(refine="guided")):
        info = edge_applicable(model, spec, geo, **kw)
        assert info is not None and info.front_ok and not info.tail_ok, kw
    # quantized weights: no fused edge path at all
    assert edge_applicable(model, spec, geo, quantize="int8") is None
    # default MaskGen on CPU: classic path (edge is a TPU/auto feature)
    assert MaskGen(path, 640, 480).edge is None


def test_edge_small_geometry_tail_off():
    """out_roi under the fold_blur floor (64 px) keeps the tail off."""
    path = model_path("segm_lite_v681.tflite")
    # an extreme portrait frame letterboxes to a 15-px-wide out_roi
    mg = MaskGen(path, 100, 640, edge_fused=True)
    assert mg.edge is not None
    assert mg.edge.info.front_ok and not mg.edge.info.tail_ok


def test_front_axis_matrix_matches_unquadrantized():
    """Row s = a*qn + i of the quadrant operator must equal the resize ->
    letterbox -> reflect-101(2) chain's row for canvas coordinate 2i+a-4
    (zero when masked out), so the fused front reads identical pixels."""
    from backscrub_tpu.ops.misc import resize_matrix

    src, dst_roi, canvas, lo = 480, 224, 256, 16
    aq, qn = front_axis_matrix(src, dst_roi, canvas, lo)
    a_res = resize_matrix(src, dst_roi, False, True)
    full = np.zeros((canvas, src), np.float32)           # letterboxed canvas
    full[lo:lo + dst_roi] = a_res
    for a in (0, 1):
        for i in range(qn):
            r = 2 * i + a - 4
            row = aq[a * qn + i]
            if -2 <= r <= canvas + 1:
                rr = abs(r) if r < 0 else (2 * canvas - 2 - r
                                           if r >= canvas else r)
                np.testing.assert_array_equal(row, full[rr], err_msg=f"r={r}")
            else:
                assert not row.any(), f"halo row r={r} must be zero"


def test_quadrant_upscale_matrices_match_fold_blur():
    """The phase-factored post operator must reproduce blur∘resize∘crop on
    a quadrantized EMA exactly (same f32 taps, reindexed)."""
    from backscrub_tpu.ops.misc import resize_matrix
    from backscrub_tpu.pipeline.image import blur_matrix

    xh, xw = 48, 80
    crop_y, crop_x, crop_h, crop_w = 3, 0, 90, 160
    up_h, up_w = 360, 640
    ahq, awq = quadrant_upscale_matrices(xh, xw, crop_y, crop_x,
                                         crop_h, crop_w, up_h, up_w)
    rng = np.random.default_rng(3)
    ema = rng.integers(0, 256, (2 * xh, 2 * xw), np.uint8)
    # quadrant [a, b, i, j] = ema[2i+a, 2j+b]
    emaq = ema.reshape(xh, 2, xw, 2).transpose(1, 3, 0, 2)
    ah = (blur_matrix(up_h, 5).astype(np.float64)
          @ resize_matrix(crop_h, up_h, False, True).astype(np.float64)
          ).astype(np.float32)
    aw = (blur_matrix(up_w, 5).astype(np.float64)
          @ resize_matrix(crop_w, up_w, False, True).astype(np.float64)
          ).astype(np.float32)
    small = ema[crop_y:crop_y + crop_h, crop_x:crop_x + crop_w]
    want = ah @ small.astype(np.float32) @ aw.T
    got = np.einsum("oah,abhw,pbw->op", ahq, emaq.astype(np.float32), awq)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("name", [
    "segm_lite_v681.tflite",   # row stride 128
    "segm_full_v679.tflite",   # w=128 rows force row stride 256
    # the reference's DEFAULT model (app/deepseg.cc:376) — 256x256 input
    "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
])
def test_body_megakernel_span_parity(name):
    """The single-Pallas-program body (ops/megakernel.py, interpret mode)
    must match the classic span lowerings on random activations."""
    import jax
    import jax.numpy as jnp
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import spec_for_model
    from backscrub_tpu.pipeline.edge import detect_edge, _make_span_fn
    from backscrub_tpu.ops.megakernel import body_mega_for

    path = model_path(name)
    model = load_model(path)
    info = detect_edge(model, spec_for_model(path))
    mega = body_mega_for(model, info, interpret=True)
    assert mega is not None
    rs, im, om = mega.rs, mega.in_meta, mega.out_meta
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((1, im.rows, im.w, im.c)) * 2).astype(np.float32)
    span = _make_span_fn(model, info.body_start, info.body_end,
                         info.body_in_tensor, info.body_out_tensor)
    ref = np.asarray(jax.jit(span)(model.params, jnp.asarray(x)))[0]
    xr = np.zeros((im.c, im.rows * rs), np.float32)
    for i in range(im.rows):
        xr[:, i * rs:i * rs + im.w] = x[0, i].T
    out = np.asarray(jax.jit(mega)(jnp.asarray(xr)))
    got = np.stack([out[:, i * rs + np.arange(om.w) * om.sp].T
                    for i in range(om.rows)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)
    # pad lanes must be clean zeros (the rowpad invariant)
    mask = np.zeros(om.rows * rs, bool)
    for i in range(om.rows):
        mask[i * rs + np.arange(om.w) * om.sp] = True
    assert not np.abs(out[:, ~mask]).any()


def test_megakernel_synthetic_pool_act_and_broadcast_add():
    """Paths no bundled model hits: a global pool with a fused activation
    and a broadcast ADD gate (which leaks the vector value into pad lanes
    that the following depthwise SAME border must read as zero)."""
    import jax
    import jax.numpy as jnp
    from backscrub_tpu.tflite.ir import GraphIR, NodeIR, TensorIR
    from backscrub_tpu.graph.executor import build_model
    from backscrub_tpu.pipeline.edge import _make_span_fn
    from backscrub_tpu.ops.megakernel import BodyMega

    rng = np.random.default_rng(5)
    C, H, W = 8, 8, 8

    def t(i, name, shape, data=None):
        return TensorIR(i, name, tuple(shape), np.float32,
                        None if data is None else data.astype(np.float32))

    tensors = [
        t(0, "in", (1, H, W, C)),
        t(1, "w1", (C, 1, 1, C), rng.standard_normal((C, 1, 1, C))),
        t(2, "b1", (C,), rng.standard_normal(C)),
        t(3, "conv", (1, H, W, C)),
        t(4, "pool", (1, 1, 1, C)),
        t(5, "wfc", (C, C), rng.standard_normal((C, C))),
        t(6, "bfc", (C,), rng.standard_normal(C)),
        t(7, "fc", (1, 1, 1, C)),
        t(8, "sum", (1, H, W, C)),
        t(9, "wdw", (1, 3, 3, C), rng.standard_normal((1, 3, 3, C))),
        t(10, "bdw", (C,), rng.standard_normal(C)),
        t(11, "out", (1, H, W, C)),
    ]
    nodes = [
        NodeIR("CONV_2D", [0, 1, 2], [3],
               dict(stride_h=1, stride_w=1, padding="SAME",
                    activation="RELU6")),
        NodeIR("AVERAGE_POOL_2D", [3], [4],
               dict(filter_h=H, filter_w=W, stride_h=H, stride_w=W,
                    padding="VALID", activation="RELU")),
        NodeIR("FULLY_CONNECTED", [4, 5, 6], [7],
               dict(activation="NONE", keep_num_dims=True)),
        NodeIR("ADD", [3, 7], [8], dict(activation="NONE")),
        NodeIR("DEPTHWISE_CONV_2D", [8, 9, 10], [11],
               dict(stride_h=1, stride_w=1, padding="SAME",
                    depth_multiplier=1, activation="NONE")),
    ]
    g = GraphIR("synth", tensors, nodes, [0], [11])
    model = build_model(g, jit=False)
    span = _make_span_fn(model, 0, len(nodes), 0, 11)
    x = rng.standard_normal((1, H, W, C)).astype(np.float32)
    ref = np.asarray(jax.jit(span)(model.params, jnp.asarray(x)))[0]

    mega = BodyMega(model, 0, len(nodes), 0, 11, interpret=True)
    rs = mega.rs
    xr = np.zeros((C, H * rs), np.float32)
    for i in range(H):
        xr[:, i * rs:i * rs + W] = x[0, i].T
    out = np.asarray(jax.jit(mega)(jnp.asarray(xr)))
    got = np.stack([out[:, i * rs:i * rs + W].T for i in range(H)])
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def _mega_reject_case(case):
    """Build a tiny synthetic span that trips exactly one BodyMega guard
    class; returns (nodes, tensors, out_tid, expected message fragment)."""
    rng = np.random.default_rng(2)
    from backscrub_tpu.tflite.ir import NodeIR, TensorIR

    C, H, W = 8, 8, 8
    if case == "row width too large":
        W = 260  # > 256 - margin

    def t(i, name, shape, data=None):
        return TensorIR(i, name, tuple(shape), np.float32,
                        None if data is None else
                        np.asarray(data, np.float32))

    tensors = [t(0, "in", (1, H, W, C))]
    nodes = []
    out = 0

    def add_t(name, shape, data=None):
        tensors.append(t(len(tensors), name, shape, data))
        return len(tensors) - 1

    conv_o = dict(stride_h=1, stride_w=1, padding="SAME", activation="NONE")
    dw_o = dict(stride_h=1, stride_w=1, padding="SAME", depth_multiplier=1,
                activation="NONE")
    if case in ("row width too large",):
        w = add_t("w", (C, 1, 1, C), rng.standard_normal((C, 1, 1, C)))
        b = add_t("b", (C,), np.zeros(C))
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("CONV_2D", [0, w, b], [out], conv_o))
    elif case == "SUB":  # op kind outside SUPPORTED
        other = add_t("k", (1, H, W, C), rng.standard_normal((1, H, W, C)))
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("SUB", [0, other], [out],
                            dict(activation="NONE")))
    elif case == "non-1x1 body conv":
        w = add_t("w", (C, 3, 3, C), rng.standard_normal((C, 3, 3, C)))
        b = add_t("b", (C,), np.zeros(C))
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("CONV_2D", [0, w, b], [out], conv_o))
    elif case == "fused activation":
        w = add_t("w", (C, 1, 1, C), rng.standard_normal((C, 1, 1, C)))
        b = add_t("b", (C,), np.zeros(C))
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("CONV_2D", [0, w, b], [out],
                            dict(conv_o, activation="TANH")))
    elif case == "dw variant":
        w = add_t("w", (1, 3, 3, 2 * C), rng.standard_normal((1, 3, 3, 2 * C)))
        b = add_t("b", (2 * C,), np.zeros(2 * C))
        out = add_t("y", (1, H, W, 2 * C))
        nodes.append(NodeIR("DEPTHWISE_CONV_2D", [0, w, b], [out],
                            dict(dw_o, depth_multiplier=2)))
    elif case == "dw stride":
        w = add_t("w", (1, 3, 3, C), rng.standard_normal((1, 3, 3, C)))
        b = add_t("b", (C,), np.zeros(C))
        out = add_t("y", (1, 3, 3, C))
        nodes.append(NodeIR("DEPTHWISE_CONV_2D", [0, w, b], [out],
                            dict(dw_o, stride_h=3, stride_w=3)))
    elif case == "FC on spatial tensor":
        w = add_t("w", (C, C), rng.standard_normal((C, C)))
        b = add_t("b", (C,), np.zeros(C))
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("FULLY_CONNECTED", [0, w, b], [out],
                            dict(activation="NONE", keep_num_dims=True)))
    elif case == "non-global pool":
        out = add_t("y", (1, H // 2, W // 2, C))
        nodes.append(NodeIR("AVERAGE_POOL_2D", [0], [out],
                            dict(filter_h=2, filter_w=2, stride_h=2,
                                 stride_w=2, padding="VALID",
                                 activation="NONE")))
    elif case == "operand not produced in-span":
        other = add_t("k", (1, H, W, C), rng.standard_normal((1, H, W, C)))
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("ADD", [0, other], [out],
                            dict(activation="NONE")))
    elif case == "binary shape mismatch":
        # legal XLA broadcast (channel dim 1) that the rowpad layout
        # cannot express: ADD of (1,H,W,C) with an in-span (1,H,W,1)
        w1 = add_t("w1", (1, 1, 1, C), rng.standard_normal((1, 1, 1, C)))
        b1 = add_t("b1", (1,), np.zeros(1))
        one = add_t("one", (1, H, W, 1))
        nodes.append(NodeIR("CONV_2D", [0, w1, b1], [one], conv_o))
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("ADD", [0, one], [out],
                            dict(activation="NONE")))
    elif case == "spatial logistic":
        out = add_t("y", (1, H, W, C))
        nodes.append(NodeIR("LOGISTIC", [0], [out], {}))
    elif case == "concat axis":
        other = add_t("c2", (1, H, W, C))
        nodes.append(NodeIR("RELU", [0], [other], {}))
        out = add_t("y", (1, 2 * H, W, C))
        nodes.append(NodeIR("CONCATENATION", [0, other], [out],
                            dict(axis=1, activation="NONE")))
    elif case == "concat channel alignment":
        w = add_t("w", (4, 1, 1, C), rng.standard_normal((4, 1, 1, C)))
        b = add_t("b", (4,), np.zeros(4))
        c4 = add_t("c4", (1, H, W, 4))
        nodes.append(NodeIR("CONV_2D", [0, w, b], [c4], conv_o))
        out = add_t("y", (1, H, W, 4 + C))
        nodes.append(NodeIR("CONCATENATION", [c4, 0], [out],
                            dict(axis=-1, activation="NONE")))
    elif case == "non-2x resize":
        size = add_t("size", (2,), np.array([3 * H, 3 * W]))
        out = add_t("y", (1, 3 * H, 3 * W, C))
        nodes.append(NodeIR("RESIZE_BILINEAR", [0, size], [out],
                            dict(align_corners=False,
                                 half_pixel_centers=True)))
    elif case == "output spacing != 1":
        w = add_t("w", (1, 3, 3, C), rng.standard_normal((1, 3, 3, C)))
        b = add_t("b", (C,), np.zeros(C))
        out = add_t("y", (1, H // 2, W // 2, C))
        nodes.append(NodeIR("DEPTHWISE_CONV_2D", [0, w, b], [out],
                            dict(dw_o, stride_h=2, stride_w=2)))
    else:  # pragma: no cover
        raise AssertionError(case)
    return tensors, nodes, out


@pytest.mark.parametrize("case,msg", [
    ("SUB", "SUB"),
    ("non-1x1 body conv", "non-1x1"),
    ("fused activation", "activation"),
    ("dw variant", "dw variant"),
    ("dw stride", "dw stride"),
    ("FC on spatial tensor", "FC on spatial"),
    ("non-global pool", "non-global pool"),
    ("operand not produced in-span", "not produced in-span"),
    ("binary shape mismatch", "shape mismatch"),
    ("spatial logistic", "spatial logistic"),
    ("concat axis", "concat axis"),
    ("concat channel alignment", "channel alignment"),
    ("non-2x resize", "non-2x resize"),
    ("output spacing != 1", "spacing"),
    ("row width too large", "row width"),
])
def test_megakernel_rejects_unsupported_spans(case, msg):
    """One test per guard class: a graph outside the megakernel's span
    contract must raise Unsupported at BUILD time (so body_mega_for
    degrades to the XLA body) — never compile and silently diverge."""
    from backscrub_tpu.tflite.ir import GraphIR
    from backscrub_tpu.graph.executor import build_model
    from backscrub_tpu.ops.megakernel import BodyMega, Unsupported

    tensors, nodes, out = _mega_reject_case(case)
    g = GraphIR("synth", tensors, nodes, [0], [out])
    model = build_model(g, jit=False)
    with pytest.raises(Unsupported, match=msg):
        BodyMega(model, 0, len(nodes), 0, out, interpret=True)


def test_body_mega_for_rejects_quantized_models():
    """Quantized weights store int8 + __scale host params; the mega would
    cast them to f32 without the dequant — body_mega_for must gate them
    out even when called directly (ADVICE r3)."""
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import spec_for_model
    from backscrub_tpu.pipeline.edge import detect_edge
    from backscrub_tpu.ops.megakernel import body_mega_for

    path = model_path("segm_lite_v681.tflite")
    mq = load_model(path, quantize="int8")
    info = detect_edge(mq, spec_for_model(path))
    if info is None or not (info.front_ok and info.tail_ok):
        pytest.skip("edge span does not qualify on the quantized graph")
    assert body_mega_for(mq, info, interpret=True) is None


def test_megakernel_gating():
    """Front-only spans keep the megakernel off; bf16 compute builds it
    (f32-storage kernel, dots at the model's DEFAULT precision = the bf16
    body's matmul class) and still matches the f32 span lowerings."""
    import jax
    import jax.numpy as jnp
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import spec_for_model
    from backscrub_tpu.pipeline.edge import detect_edge, _make_span_fn
    from backscrub_tpu.ops.megakernel import body_mega_for

    path = model_path("segm_lite_v681.tflite")
    m16 = load_model(path, compute_dtype=jnp.bfloat16,
                     precision=jax.lax.Precision.DEFAULT)
    info = detect_edge(m16, spec_for_model(path))
    mega = body_mega_for(m16, info, interpret=True)
    assert mega is not None
    # The bf16 model's weights are bf16-rounded, so exact f32 parity is
    # impossible by construction; the honest gate is that the mega tracks
    # the f32 truth AT LEAST as well as the bf16 XLA span it replaces
    # (f32 storage beats per-layer bf16 activation rounding), and within
    # a bf16-class absolute bound.  On-TPU mask parity for bf16 mode is
    # gated by bench --parity like the rest of the mode.
    m32 = load_model(path)
    rs, im, om = mega.rs, mega.in_meta, mega.out_meta
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, im.rows, im.w, im.c)) * 2).astype(np.float32)

    def span_out(model):
        span = _make_span_fn(model, info.body_start, info.body_end,
                             info.body_in_tensor, info.body_out_tensor)
        return np.asarray(jax.jit(span)(model.params, jnp.asarray(x))
                          ).astype(np.float32)[0]

    ref32, ref16 = span_out(m32), span_out(m16)
    xr = np.zeros((im.c, im.rows * rs), np.float32)
    for i in range(im.rows):
        xr[:, i * rs:i * rs + im.w] = x[0, i].T
    out = np.asarray(jax.jit(mega)(jnp.asarray(xr)))
    got = np.stack([out[:, i * rs + np.arange(om.w) * om.sp].T
                    for i in range(om.rows)])
    err_mega = np.abs(got - ref32)
    err_bf16 = np.abs(ref16 - ref32)
    assert err_mega.mean() <= err_bf16.mean() * 1.05, \
        (err_mega.mean(), err_bf16.mean())
    assert err_mega.max() <= max(2.0, err_bf16.max() * 1.1), \
        (err_mega.max(), err_bf16.max())
    # MaskGen with guided refine: tail off -> no mega, edge still on
    mg = MaskGen(path, 640, 480, edge_fused=True, refine="guided")
    assert mg.edge.mega is None


def test_detect_edge_all_families():
    """Every bundled family fuses at least the front; the 2x2/s2 tail
    fuses on the Meet + MLKit models."""
    from backscrub_tpu.models.specs import spec_for_model
    from backscrub_tpu.graph.executor import load_model

    expect_tail = {
        "segm_lite_v681.tflite": True,
        "segm_full_v679.tflite": True,
        "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite": True,
        "deeplabv3_257_mv_gpu.tflite": False,
        "body-pix-float-050-8.tflite": False,
    }
    for name, tail in expect_tail.items():
        path = model_path(name)
        model = load_model(path)
        info = detect_edge(model, spec_for_model(path))
        assert info is not None and info.front_ok, name
        assert info.tail_ok == tail, name


@pytest.mark.parametrize("name", [
    "deeplabv3_257_mv_gpu.tflite",    # MobileNetV2 early stages, ADD skips
    "body-pix-float-050-8.tflite",    # MobileNetV1-050 early DW/PW chain
])
def test_body_megakernel_prefix_parity(name):
    """The PREFIX megakernel (front-only families: early 129x129/65x65
    stages as one rowpad program, cut to the XLA lowerings at the 33x33
    MXU-friendly regime) must produce a mask identical to the XLA body
    path, and its rowpad->NHWC bridge must be exact."""
    import cv2
    from conftest import portrait_path
    from backscrub_tpu.pipeline.maskgen import MaskGen

    img = cv2.resize(cv2.imread(portrait_path()), (320, 240))
    on = MaskGen(model_path(name), 320, 240,
                 edge_fused=True, edge_interpret=True)
    off = MaskGen(model_path(name), 320, 240,
                  edge_fused=True, edge_interpret=True, edge_mega=False)
    assert on.edge.mega_prefix is not None
    assert on.edge.mega is None            # no kernel==stride tail
    assert off.edge.mega_prefix is None    # edge_mega=False disables it
    # the cut hands over before the MXU-friendly regime (c>=96 @ rows<=33)
    m = on.edge.mega_prefix.out_meta
    assert m.sp > 1 and m.rows <= 33
    for _ in range(3):
        # NOT asserted byte-identical: the prefix path auto-enables the
        # front conv_dot on these large-canvas families, whose tap
        # contraction reassociates the 27-tap sum vs the FMA path — the
        # same threshold-boundary decode-flip class as batched serving,
        # so the established tolerance invariant applies (CLAUDE.md:
        # per-byte diff <= 1, frame <= 2% differing bytes).
        a = on.process(img).astype(np.int16)
        b = off.process(img).astype(np.int16)
        assert np.abs(a - b).max() <= 1
        assert float((a != b).mean()) <= 0.02


@pytest.mark.parametrize("name,full_cover", [
    ("deeplabv3_257_mv_gpu.tflite", False),   # chain ends before 33->257
    ("body-pix-float-050-8.tflite", True),    # chain reaches graph output
])
def test_body_megakernel_continuation_parity(name, full_cover):
    """The CONTINUATION chain (round 5): the 33x33 C>=96 regime after the
    prefix cut runs as chained compact-spacing rowpad kernels — dilated
    DWs (deeplab dil 2/4, bodypix dil 2), the ASPP global-pool/broadcast-
    resize/concat branch, and the identity 33->33 resize all in-kernel.
    Masks must match the XLA body path within the tolerance invariant."""
    import cv2
    from conftest import portrait_path
    from backscrub_tpu.pipeline.maskgen import MaskGen

    img = cv2.resize(cv2.imread(portrait_path()), (320, 240))
    on = MaskGen(model_path(name), 320, 240,
                 edge_fused=True, edge_interpret=True, edge_cont=True)
    off = MaskGen(model_path(name), 320, 240,
                  edge_fused=True, edge_interpret=True, edge_mega=False)
    e = on.edge
    assert e.mega_prefix is not None and e.mega_cont is not None
    assert (e._body is None) == full_cover
    assert all(mk.out_meta.sp == 1 for mk in e.mega_cont)
    for _ in range(3):
        a = on.process(img).astype(np.int16)
        b = off.process(img).astype(np.int16)
        assert np.abs(a - b).max() <= 1
        assert float((a != b).mean()) <= 0.02


def test_body_megakernel_prefix_rejects():
    """Guards the prefix/continuation paths must enforce: quantized models
    never build one (weights would skip their __scale dequant), and an
    ANISOTROPIC-dilation DW must raise Unsupported, not mis-lower (the
    isotropic atrous DWs of deeplab/bodypix are supported since round 5 —
    covered by the continuation parity test below)."""
    import pytest as _pytest
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import spec_for_model
    from backscrub_tpu.pipeline.edge import detect_edge
    from backscrub_tpu.ops.megakernel import (
        BodyMega, Unsupported, body_mega_continuation_for,
        body_mega_prefix_for)

    path = model_path("deeplabv3_257_mv_gpu.tflite")
    model = load_model(path)
    info = detect_edge(model, spec_for_model(path))
    assert info is not None and info.front_ok and not info.tail_ok
    # quantized guard (same defense as body_mega_for)
    class Q:
        graph = model.graph
        host_params = model.host_params
        quantize_mode = "int8"
    assert body_mega_prefix_for(Q, info) is None
    assert body_mega_continuation_for(Q, info, 13,
                                      model.graph.nodes[13].inputs[0]) is None
    # anisotropic dilation must reject at build time: patch node 25's
    # options (dilation 2x2 -> 2x1) on a throwaway copy of the node list
    g = model.graph
    node = g.nodes[25]
    assert node.kind == "DEPTHWISE_CONV_2D" and node.options["dilation_h"] == 2
    orig = dict(node.options)
    try:
        node.options["dilation_w"] = 1
        with _pytest.raises(Unsupported):
            BodyMega(model, 24, 27, g.nodes[24].inputs[0],
                     g.nodes[26].outputs[0], allow_spaced_output=True)
    finally:
        node.options.clear()
        node.options.update(orig)
    # and the isotropic original must BUILD (the supported atrous case)
    BodyMega(model, 24, 27, g.nodes[24].inputs[0], g.nodes[26].outputs[0],
             allow_spaced_output=True, interpret=True)
