#!/usr/bin/env python3
"""Per-op roofline of the shipped 720p step, from a real device trace.

Answers the round-2 verdict's open question — "name the resource that
makes 16x FLOPs cost 16.6x time on a ~99%-idle MXU" — with measured
evidence instead of prefix-timing inference:

1. jit the EXACT shipped step chained in a K-step lax.scan (the same
   program bench.py measures — prefix sub-programs fuse differently and
   mis-attribute, which is how the old ``--attrib`` numbers went wrong),
2. capture a jax.profiler device trace (XLA Ops timeline — device-side
   timings, immune to the tunnel's lying host-side acks),
3. dump the optimized HLO of that same executable and map every traced
   instruction to its opcode, operand/output shapes, and jax source
   metadata (which pipeline stage emitted it),
4. compute per-instruction bytes moved and FLOPs, and report achieved
   GB/s and TFLOP/s against the chip's roofs.

Writes ``roofline_720p`` (and ``_batch16``) records into
BENCH_DETAILS.json and a human-readable PERF.md table.

Usage:  python tools/roofline.py [--batch 1] [--iters 10] [--out PERF.md]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from backscrub_tpu.models.specs import install_default_search_roots
from backscrub_tpu.utils.artifacts import atomic_json_dump
install_default_search_roots()

# v5e roofs (public spec): 197 bf16 TFLOP/s, 819 GB/s HBM
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8,
                "u64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """'f32[16,720,1280,3]{...}' -> byte count (tuples handled by caller)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


class HloInfo:
    __slots__ = ("name", "opcode", "out_bytes", "in_bytes", "flops",
                 "op_name", "source")

    def __init__(self, name, opcode):
        self.name = name
        self.opcode = opcode
        self.out_bytes = 0
        self.in_bytes = 0
        self.flops = 0
        self.op_name = ""
        self.source = ""


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|[\w\[\]{},:#* ]+?))\s*"
    r"([\w\-]+)\((.*)$")
_META_OP_RE = re.compile(r'op_name="([^"]*)"')
_META_SRC_RE = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')
_CONV_DIM_RE = re.compile(r"dim_labels=([\w?]+_[\w?]+->[\w?]+)")


_COMP_RE = re.compile(r"^%?([\w.\-]+)\s+(?:\([^)]*\)\s*->|{)")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def parse_hlo(text: str):
    """Optimized-HLO text -> {instr name: HloInfo} (entry + fused shapes).

    Bytes: output shape + operand shapes named inline (operands carry
    their shapes in optimized dumps).  FLOPs: convolution/dot get the
    real count from shapes; elementwise get ~elements (VPU work).
    Fusions inherit the matmul FLOPs of the computation they call, so a
    conv wrapped in `convolution_add_fusion.N` still reports real FLOPs.
    """
    infos = {}
    comp_flops: dict = {}   # fused-computation name -> conv/dot flops
    fusion_calls: dict = {}  # fusion instr name -> computation name
    current_comp = None
    for line in text.splitlines():
        if not line.startswith(" "):  # computation header at top level
            mc = _COMP_RE.match(line.strip())
            if mc:
                current_comp = mc.group(1)
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, out_shape, opcode, rest = m.groups()
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
            continue
        fl = 0
        if opcode == "convolution":
            fl = conv_flops(line, out_shape)
        elif opcode == "dot":
            fl = dot_flops(line, out_shape)
        if fl and current_comp:
            comp_flops[current_comp] = comp_flops.get(current_comp, 0) + fl
        info = HloInfo(name, opcode)
        info.out_bytes = shape_bytes(out_shape)
        # operand shapes appear inline in the call: f32[1,96,160,32]{...} %x
        info.in_bytes = shape_bytes(rest.split(" metadata=")[0])
        mo = _META_OP_RE.search(line)
        if mo:
            info.op_name = mo.group(1)
        ms = _META_SRC_RE.search(line)
        if ms:
            info.source = f"{os.path.basename(ms.group(1))}:{ms.group(2)}"
        if opcode == "fusion":
            mc = _CALLS_RE.search(rest)
            if mc:
                fusion_calls[name] = mc.group(1)
        if fl:
            info.flops = fl
        else:
            # elementwise/VPU work proxy: one op per output element
            info.flops = max(info.out_bytes // 4, 0)
        infos[name] = info
    for fname, comp in fusion_calls.items():
        if comp in comp_flops and fname in infos:
            infos[fname].flops = comp_flops[comp]
            infos[fname].opcode = "fusion(conv)"
    return infos


def _dims_of(shape_str: str):
    m = _SHAPE_RE.search(shape_str)
    if not m:
        return []
    return [int(d) for d in m.group(2).split(",") if d]


def conv_flops(line: str, out_shape: str) -> int:
    """2 * out_elements * kernel_spatial * C_in (from the rhs shape)."""
    out_dims = _dims_of(out_shape)
    shapes = _SHAPE_RE.findall(line)
    if len(shapes) < 3 or not out_dims:
        return 0
    # operands follow the output: lhs, rhs
    rhs_dims = [int(d) for d in shapes[2][1].split(",") if d]
    if not rhs_dims:
        return 0
    out_el = int(np.prod(out_dims))
    # rhs is [kh, kw, cin, cout] (or permuted); product/cout = kh*kw*cin
    k_cin = int(np.prod(rhs_dims)) // max(out_dims[-1], 1)
    return 2 * out_el * max(k_cin, 1)


def dot_flops(line: str, out_shape: str) -> int:
    out_dims = _dims_of(out_shape)
    shapes = _SHAPE_RE.findall(line)
    if len(shapes) < 3 or not out_dims:
        return 0
    lhs = [int(d) for d in shapes[1][1].split(",") if d]
    return 2 * int(np.prod(out_dims)) * (lhs[-1] if lhs else 1)


# short names for --model (keys into BENCH_DETAILS records)
MODEL_SHORT = {
    "segm_lite": "segm_lite_v681.tflite",
    "segm_full": "segm_full_v679.tflite",
    "mlkit": "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
    "deeplab": "deeplabv3_257_mv_gpu.tflite",
    "bodypix": "body-pix-float-050-8.tflite",
}


def build_scan(batch: int, iters: int, model: str = "segm_lite"):
    import jax
    import jax.numpy as jnp
    from backscrub_tpu.pipeline.frame import FramePipeline, PipelineConfig
    from backscrub_tpu.models.specs import resolve_model_path

    pipe = FramePipeline(resolve_model_path(MODEL_SHORT[model]),
                         PipelineConfig(width=1280, height=720))
    step = pipe._make_step("explicit", False, False, True)
    rng = np.random.default_rng(0)
    shp = (batch, 720, 1280, 3) if batch > 1 else (720, 1280, 3)
    frames = jax.device_put(rng.integers(0, 256, (2,) + shp, np.uint8))
    bgs = jax.device_put(rng.integers(0, 256, (1,) + shp, np.uint8))
    es = pipe.maskgen.ema_shape
    eshp = (batch,) + es if batch > 1 else es
    ema0 = jnp.full(eshp, 255, jnp.uint8)
    params = pipe.maskgen.model.params

    @jax.jit
    def many(params, fr, bg, ema):
        def body(carry, i):
            ema, acc = carry
            out, _, ema = step(params, fr[i % 2], bg[i % 1], ema)
            acc = acc + out.astype(jnp.uint32).sum()
            return (ema, acc), None
        (ema, acc), _ = jax.lax.scan(body, (ema, jnp.uint32(0)),
                                     jnp.arange(iters))
        return ema, acc
    return many, (params, frames, bgs, ema0)


def profile_and_parse(batch: int, iters: int, trace_root: str,
                      model: str = "segm_lite"):
    import jax

    many, args = build_scan(batch, iters, model)
    lowered = many.lower(*args)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    _ = int(many(*args)[1])  # warm (compile already done)
    with jax.profiler.trace(trace_root):
        for _ in range(3):
            _ = int(many(*args)[1])

    # newest trace dir
    paths = sorted(glob.glob(os.path.join(
        trace_root, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise RuntimeError(f"no trace written under {trace_root}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    # find the device pid and its "XLA Ops" tid
    dev_pid = None
    for e in t["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")):
            dev_pid = e["pid"]
            break
    if dev_pid is None:
        raise RuntimeError("no TPU device track in trace (CPU run?)")
    ops_tid = None
    for e in t["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") == dev_pid
                and e["args"].get("name") == "XLA Ops"):
            ops_tid = e["tid"]
            break
    ev = [e for e in t["traceEvents"]
          if e.get("pid") == dev_pid and e.get("tid") == ops_tid
          and e.get("ph") == "X"]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        dur[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    # per-step: 3 profiled calls x iters steps each
    steps = 3 * iters
    return dur, cnt, steps, hlo_text


def classify(info: HloInfo | None, name: str) -> str:
    """Pipeline stage from jax source metadata (best effort)."""
    # name-based classes first: Pallas custom calls and the measurement
    # harness have no (or misleading) HLO metadata
    if info is not None and "megakernel.py" in info.source:
        return "cnn"  # the body megakernel custom call IS the CNN
    if "blend_pack" in name or "bilateral5_pallas" in name or "pallas" in name:
        return "pallas-kernels"
    if name.startswith(("dynamic-slice", "dynamic_slice",
                        "constant_dynamic-slice")):
        return "harness"  # the scan's frame-stack rotation (fr[i % nf])
    if name.startswith(("copy", "copy-start", "copy-done", "bitcast")):
        return "copy/layout"
    if info is None:
        return "other"
    src = info.source
    key = info.op_name + " " + src
    if "roofline.py" in src or "bench.py" in src:
        return "harness"  # checksum fold / scan plumbing
    if "conv" in info.opcode or name.startswith("convolution"):
        return "cnn"
    for frag, stage in (("image.py", "image-stages"),
                        ("maskgen.py", "pre/post"),
                        ("decode.py", "decode/ema"),
                        ("frame.py", "composite"),
                        ("conv.py", "cnn"),
                        ("elementwise.py", "cnn"),
                        ("pool.py", "cnn"),
                        ("misc.py", "cnn"),
                        ("shape_ops.py", "cnn"),
                        ("extended.py", "cnn")):
        if frag in key:
            return stage
    return "other"


def analyze(batch: int, iters: int, top: int = 40,
            model: str = "segm_lite"):
    trace_root = f"/tmp/backscrub_roofline_{model}_b{batch}"
    dur, cnt, steps, hlo_text = profile_and_parse(batch, iters, trace_root,
                                                  model)
    infos = parse_hlo(hlo_text)

    rows = []
    total_us = 0.0
    for name, d in dur.items():
        if name.startswith(("jit_", "while")):
            continue  # containers double-count their children
        us = d / steps
        total_us += us
        info = infos.get(name)
        by = (info.in_bytes + info.out_bytes) if info else 0
        fl = info.flops if info else 0
        rows.append({
            "op": name,
            "us_per_step": round(us, 2),
            "calls": cnt[name] // steps,
            "opcode": info.opcode if info else "?",
            "stage": classify(info, name),
            "mbytes": round(by / (1 << 20), 3) if by else None,
            "gbs": round(by / (us * 1e-6) / 1e9, 1) if by and us > 0 else None,
            "mflops": round(fl / 1e6, 2) if fl else None,
            "tflops": round(fl / (us * 1e-6) / 1e12, 3) if fl and us > 0 else None,
            "source": (info.source if info else ""),
            "jax_op": (info.op_name.split("/")[-1][:60] if info else ""),
        })
    rows.sort(key=lambda r: -r["us_per_step"])

    stages = collections.Counter()
    for r in rows:
        stages[r["stage"]] += r["us_per_step"]
    n_tiny = sum(1 for r in rows if r["us_per_step"] < 1.0)
    tiny_us = sum(r["us_per_step"] for r in rows if r["us_per_step"] < 1.0)

    conv_us = sum(r["us_per_step"] for r in rows
                  if r["opcode"] in ("convolution", "fusion(conv)")
                  or r["op"].startswith("convolution"))
    conv_fl = sum((r["mflops"] or 0) for r in rows
                  if r["opcode"] in ("convolution", "fusion(conv)")
                  or r["op"].startswith("convolution")) * 1e6
    hbm_bytes = sum((r["mbytes"] or 0) for r in rows) * (1 << 20)

    summary = {
        "batch": batch,
        "step_us": round(total_us, 1),
        "per_frame_us": round(total_us / batch, 1),
        "n_ops": len(rows),
        "n_ops_under_1us": n_tiny,
        "us_in_ops_under_1us": round(tiny_us, 1),
        "stage_us": {k: round(v, 1) for k, v in stages.most_common()},
        "conv_total_us": round(conv_us, 1),
        "conv_total_gflops_per_step": round(conv_fl / 1e9, 3),
        "conv_achieved_tflops": round(conv_fl / (conv_us * 1e-6) / 1e12, 2)
        if conv_us else None,
        "mxu_utilization_pct": round(
            100 * conv_fl / (conv_us * 1e-6) / 1e12 / PEAK_BF16_TFLOPS, 2)
        if conv_us else None,
        "hbm_touched_mb_per_step": round(hbm_bytes / (1 << 20), 1),
        "avg_hbm_gbs": round(hbm_bytes / (total_us * 1e-6) / 1e9, 1),
        "hbm_utilization_pct": round(
            100 * hbm_bytes / (total_us * 1e-6) / 1e9 / PEAK_HBM_GBS, 1),
        "top_ops": rows[:top],
    }
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--model", choices=sorted(MODEL_SHORT), default="segm_lite",
                    help="model family to trace (record key gains a suffix "
                         "for non-default families)")
    args = ap.parse_args(argv)

    import jax
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("warning: profiling CPU, not TPU — timings are not the "
              "deployment numbers", file=sys.stderr)

    s = analyze(args.batch, args.iters, args.top, args.model)
    key = "roofline_720p" if args.batch == 1 else f"roofline_720p_batch{args.batch}"
    if args.model != "segm_lite":
        key += f"_{args.model}"
    results = {}
    if os.path.exists("BENCH_DETAILS.json"):
        with open("BENCH_DETAILS.json") as f:
            results = json.load(f)
    results[key] = s
    atomic_json_dump(results, "BENCH_DETAILS.json")

    if not args.json_only:
        print(f"\n== {key} (device {dev}) ==", file=sys.stderr)
        for k, v in s.items():
            if k != "top_ops":
                print(f"  {k}: {v}", file=sys.stderr)
        print(f"  top ops:", file=sys.stderr)
        for r in s["top_ops"][:25]:
            print(f"   {r['us_per_step']:7.2f} us  {r['stage']:13s} "
                  f"{(r['gbs'] or 0):7.1f} GB/s  {r['op'][:40]:40s} "
                  f"{r['source']}", file=sys.stderr)
    print(json.dumps({"metric": key + "_step_us", "value": s["step_us"],
                      "unit": "us", "vs_baseline": 1.0}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
