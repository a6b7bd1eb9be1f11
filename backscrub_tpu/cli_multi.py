"""Multi-camera CLI: N capture->virtual-camera streams in ONE process.

The reference needs one ``backscrub`` process per camera
(app/deepseg.cc:627-804, single capture/single loopback); here every stream
rides batched device dispatches through :class:`MultiGeometryServer` —
streams of different geometries bucket by shape, each bucket is one fused
program, and one TPU serves them all.

Usage:
  python -m backscrub_tpu.cli_multi [-m MODEL] [-b BACKGROUND] [-d]
      [--frames N] [--threaded] [--depth N] [--data-axis N]
      --stream src=/dev/video0,sink=/dev/video2,geo=1280x720
      --stream src=/dev/video1,sink=/dev/video3,geo=640x480

Stream spec keys: ``src`` (URI: /dev/videoN | file:PATH | test: | mjpg:),
``sink`` (URI: /dev/videoN | file:PATH | null:), ``geo`` (WxH),
optional ``bg`` (still image path; overrides the shared -b for this
stream), optional ``model`` (.tflite name/path; overrides the shared -m
— N reference processes each pick their own model, so streams bucket by
(model, geometry) and each bucket is one fused program).  Backgrounds
are static stills here — per-stream video backgrounds belong to the
single-stream CLI.
"""

from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np

from .cli import parse_geometry

USAGE = __doc__


def parse_stream_spec(spec: str) -> dict:
    out = {}
    for part in spec.split(","):
        if "=" not in part:
            raise ValueError(f"stream spec part {part!r} is not key=value")
        k, v = part.split("=", 1)
        if k not in ("src", "sink", "geo", "bg", "model"):
            raise ValueError(f"unknown stream spec key {k!r}")
        out[k] = v
    for req in ("src", "sink", "geo"):
        if req not in out:
            raise ValueError(f"stream spec missing {req!r}: {spec!r}")
    geo = parse_geometry(out["geo"])
    if geo is None:
        raise ValueError(f"bad geo {out['geo']!r} (expected WxH)")
    out["geo"] = geo
    return out


def parse_args(argv: List[str]) -> Optional[dict]:
    cfg = dict(streams=[], model="selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
               background=None, debug=0, frames=0, threaded=False, depth=2,
               data_axis=1, bf16=False, stall_timeout=5.0)
    i = 0
    while i < len(argv):
        a = argv[i]

        def val():
            nonlocal i
            i += 1
            if i >= len(argv):
                raise ValueError(f"missing value for {a}")
            return argv[i]

        if a == "-?":
            return None
        elif a == "--stream":
            cfg["streams"].append(parse_stream_spec(val()))
        elif a == "-m":
            cfg["model"] = val()
        elif a == "-b":
            cfg["background"] = val()
        elif a == "-d":
            cfg["debug"] += 1
        elif a == "--frames":
            cfg["frames"] = int(val())
        elif a == "--threaded":
            cfg["threaded"] = True
        elif a == "--depth":
            cfg["depth"] = int(val())
        elif a == "--data-axis":
            cfg["data_axis"] = int(val())
        elif a == "--bf16":
            cfg["bf16"] = True
        elif a == "--stall-timeout":
            cfg["stall_timeout"] = float(val())
        else:
            raise ValueError(f"unknown argument {a!r}")
        i += 1
    if not cfg["streams"]:
        raise ValueError("need at least one --stream")
    return cfg


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        cfg = parse_args(argv)
    except ValueError as e:
        print(f"Error: {e}", file=sys.stderr)
        print(USAGE, file=sys.stderr)
        return 1
    if cfg is None:
        print(USAGE, file=sys.stderr)
        return 1

    import cv2
    import jax
    import jax.numpy as jnp
    from .io.streams import open_sink, open_source
    from .models.specs import resolve_model_path, resolve_path
    from .parallel.mesh import make_mesh
    from .pipeline.frame import PipelineConfig
    from .runtime.multistream import MultiGeometryServer

    try:
        model_path = resolve_model_path(cfg["model"])
    except FileNotFoundError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1

    def load_bg(name, w, h):
        p = resolve_path(name, "backgrounds") if name else None
        img = cv2.imread(p) if p else None
        if img is None:
            if name:
                print(f"Warning: could not load background {name!r}, "
                      f"using green", file=sys.stderr)
            return None
        return cv2.resize(img, (w, h))

    sources, sinks, streams = [], [], []
    try:
        for s in cfg["streams"]:
            w, h = s["geo"]
            src = open_source(s["src"], w, h)
            sink = open_sink(s["sink"], src.width, src.height)
            if (src.width, src.height) != (w, h):
                print("Warning: capture device geometry changed from "
                      "requested values.", file=sys.stderr)
                w, h = src.width, src.height
            bg = load_bg(s.get("bg", cfg["background"]), w, h)
            sources.append(src)
            sinks.append(sink)
            # MJPG cameras deliver entropy-decoded coefficients; their
            # bucket decodes on device (runtime/multistream.py)
            jinfo = getattr(src, "jpeg_info", None)
            smodel = (resolve_model_path(s["model"]) if s.get("model")
                      else None)
            streams.append((src.read, sink.write_yuyv, w, h, bg, jinfo,
                            smodel))
    except OSError as e:
        print(f"Error: {e}", file=sys.stderr)
        for s_ in sources:
            s_.close()
        return 1

    mesh = make_mesh(min(cfg["data_axis"], len(jax.devices())))
    server = MultiGeometryServer(
        model_path, PipelineConfig(width=0, height=0), streams, mesh,
        threaded=cfg["threaded"], depth=cfg["depth"],
        stall_timeout=cfg["stall_timeout"] if cfg["threaded"] else None,
        compute_dtype=jnp.bfloat16 if cfg["bf16"] else jnp.float32,
        precision=(jax.lax.Precision.DEFAULT if cfg["bf16"]
                   else None))  # None = per-family default (specs.py)
    if cfg["debug"]:
        print(f"model: {model_path}\nstreams: {len(streams)} in "
              f"{server.n_groups} (model, geometry) bucket(s), "
              f"mesh {dict(mesh.shape)}", file=sys.stderr)

    import time
    t0 = time.perf_counter()
    try:
        ticks = server.run(frames=cfg["frames"])
    except KeyboardInterrupt:
        ticks = -1
    finally:
        for s_ in sources:
            s_.close()
        for k in sinks:
            k.close()
    dt = time.perf_counter() - t0
    if ticks >= 0:
        print(f"served {ticks} ticks x {len(streams)} streams "
              f"({ticks * len(streams) / max(dt, 1e-9):.1f} aggregate fps)",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
