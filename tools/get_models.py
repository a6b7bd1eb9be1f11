#!/usr/bin/env python3
"""Fetch the four remaining bundled model families from public mirrors.

The reference ships all five ``.tflite`` files in-repo
(``/root/reference/models``, provenance in ``models/retrain.md:1-13``);
BodyPix additionally has upstream TFJS tooling (``get-model.sh:25-41`` →
``tools/get_bodypix.py``).  This script gives the OTHER four families an
acquisition path so a fresh clone needs no mounted reference:

- Google Meet segmentation (``segm_full_v679`` / ``segm_lite_v681``)
- MLKit selfie segmentation (the default model, ``app/deepseg.cc:376``)
- DeepLab v3+ 257 MobileNetV2 (``deeplabv3_257_mv_gpu``)

Each entry carries an ordered mirror list (the upstream backscrub GitHub
repo — where these exact bytes live today — plus the original hosting
where one still exists, e.g. tensorflow.org for DeepLab) and a pinned
SHA-256 of the canonical bytes.  fetch → verify(sha256) → golden-gate
(parse with our flatbuffer loader, check input geometry against the
model spec; ``--golden`` additionally runs a TFLite-CPU vs JAX mask IoU
check like ``bench --parity``).

Offline behavior: downloads fail loudly; ``--from-dir`` verifies +
installs already-downloaded files (this is the path the test suite
exercises against the mounted reference copies), and the library keeps
resolving via $BACKSCRUB_PATH / BACKSCRUB_TPU_MODELS as before
(models/specs.py resolve order).

Usage:
    python tools/get_models.py --dest models [--only segm_lite_v681.tflite]
                               [--from-dir DIR] [--golden]
    python tools/get_models.py --check [--no-probe]   # verify the contract
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
from typing import Dict, List

# Canonical bytes, pinned.  Primary mirror is the reference repository
# itself (public GitHub, ships the files in models/); originals where the
# first-party hosting still exists.
_GH = "https://raw.githubusercontent.com/floe/backscrub/main/models"
MODELS: Dict[str, dict] = {
    "segm_full_v679.tflite": {
        "input_hw": (144, 256),
        "sha256": "4fa38a8d2e48e6e3a6fc59a8c88f8766147544947689dec299f654bfdb2b171e",
        "size": 407248,
        "urls": [f"{_GH}/segm_full_v679.tflite"],
        "note": "Google Meet full (144x256); originally shipped inside the "
                "Meet web app; redistributed by the backscrub repo",
    },
    "segm_lite_v681.tflite": {
        "input_hw": (96, 160),
        "sha256": "b13571477760f99012fbd6365b38406e94020b8eaaf513da8e8eff6332f38b44",
        "size": 407232,
        "urls": [f"{_GH}/segm_lite_v681.tflite"],
        "note": "Google Meet lite (96x160)",
    },
    "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite": {
        "input_hw": (256, 256),
        "sha256": "8d13b7fae74af625c641226813616a2117bd6bca19eb3b75574621fc08557f27",
        "size": 249024,
        "urls": [
            f"{_GH}/selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
        ],
        "note": "MLKit selfie segmentation (256x256, f16 weights) — the "
                "default model (app/deepseg.cc:376)",
    },
    "deeplabv3_257_mv_gpu.tflite": {
        "input_hw": (257, 257),
        "sha256": "68a539782c2c6a72f8aac3724600124a85ed977162b44e84cbae5db717c933c6",
        "size": 2779264,
        "urls": [
            "https://storage.googleapis.com/download.tensorflow.org/models/"
            "tflite/gpu/deeplabv3_257_mv_gpu.tflite",
            f"{_GH}/deeplabv3_257_mv_gpu.tflite",
        ],
        "note": "DeepLab v3+ MobileNetV2 257x257 (first-party TF hosting)",
    },
    # BodyPix is buildable from upstream TFJS weights (tools/get_bodypix.py,
    # the reference's own path) — listed here so --from-dir installs and
    # verifies a prebuilt copy too.
    "body-pix-float-050-8.tflite": {
        "input_hw": (257, 257),
        "sha256": "d2de5fcc47ec4279c3fea0a5e38ab5cdacb3e1a27409b83557faabb81d07402e",
        "size": 2208328,
        "urls": [f"{_GH}/body-pix-float-050-8.tflite"],
        "note": "BodyPix MobileNet 0.50 stride 8 (also: tools/get_bodypix.py "
                "converts from upstream TFJS weights)",
    },
}


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify(path: str, name: str) -> None:
    """Pinned-digest check; raises on mismatch."""
    want = MODELS[name]["sha256"]
    got = sha256_of(path)
    if got != want:
        raise ValueError(
            f"{name}: sha256 mismatch\n  want {want}\n  got  {got}\n"
            "(mirror drift or a truncated download — refusing to install)")


def golden_gate(path: str, name: str, full: bool = False) -> None:
    """Structural gate: our flatbuffer loader parses the file and the input
    geometry matches the filename-keyed model spec.  ``full=True`` runs the
    TFLite-CPU vs JAX mask parity check (IoU >= 0.99, utils/parity.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import spec_for_model

    spec = spec_for_model(path)
    model = load_model(path)
    ih, iw = model.input_shape[1:3]
    want_hw = tuple(MODELS[name]["input_hw"])
    if (ih, iw) != want_hw:
        raise ValueError(f"{name}: input geometry {ih}x{iw} != expected "
                         f"{want_hw} — wrong or repackaged file")
    if spec.kind == "unknown":
        raise ValueError(f"{name}: filename no longer keys a model spec")
    if full:
        import numpy as np
        from backscrub_tpu.pipeline.maskgen import MaskGen
        from backscrub_tpu.utils.parity import iou, reference_maskgen

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (240, 320, 3), np.uint8)
        golden = reference_maskgen(path, [frame] * 3, 320, 240, spec)
        mg = MaskGen(path, 320, 240)
        for _ in range(3):
            ours = mg.process(frame)
        score = iou(ours < 128, golden < 128)
        if score < 0.99:
            raise ValueError(f"{name}: mask IoU {score:.4f} < 0.99 vs "
                             "TFLite CPU golden")
        print(f"  golden gate: IoU {score:.4f}", file=sys.stderr)


def check(names: List[str], probe: bool = True) -> int:
    """Verify the acquisition contract as far as the environment allows.

    Offline part (always): every URL parses as https with a host and the
    model's filename, and every entry pins sha256 + size + input geometry.
    Online part (``probe``): HEAD each mirror and compare Content-Length
    against the pinned size — catches mirror drift without downloading.
    A network-unreachable probe is reported but does not fail the check
    (this container has zero egress); a *reachable* mirror with the wrong
    size does."""
    from urllib.parse import urlparse

    rc = 0
    for name in names:
        info = MODELS[name]
        if not (len(info.get("sha256", "")) == 64
                and int(info.get("size", 0)) > 0
                and len(info.get("input_hw", ())) == 2
                and info.get("urls")):
            print(f"{name}: CONTRACT BROKEN (missing sha/size/geometry/urls)",
                  file=sys.stderr)
            rc = 1
            continue
        for url in info["urls"]:
            u = urlparse(url)
            if u.scheme != "https" or not u.netloc or \
                    not u.path.endswith("/" + name):
                print(f"{name}: malformed mirror URL {url}", file=sys.stderr)
                rc = 1
                continue
            status = "offline-ok (not probed)"
            if probe:
                status = _head_probe(url, int(info["size"]))
                if status.startswith("SIZE MISMATCH"):
                    rc = 1
            print(f"  {name[:44]:46s} {u.netloc:28s} {status}",
                  file=sys.stderr)
    print(f"contract check: {'ok' if rc == 0 else 'FAILED'}", file=sys.stderr)
    return rc


def _head_probe(url: str, want_size: int) -> str:
    """HEAD one mirror; returns a status string (never raises)."""
    from urllib.request import Request, urlopen

    try:
        req = Request(url, method="HEAD")
        with urlopen(req, timeout=20) as r:
            clen = r.headers.get("Content-Length")
        if clen is None:
            return "reachable (no Content-Length)"
        if int(clen) != want_size:
            return f"SIZE MISMATCH ({clen} != {want_size})"
        return f"reachable, size ok ({clen})"
    except Exception as e:
        return f"unreachable ({type(e).__name__}: {str(e)[:60]})"


def fetch_one(name: str, dest: str) -> str:
    from urllib.request import urlopen

    info = MODELS[name]
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, name)
    last: Exception = RuntimeError("no mirrors listed")
    for url in info["urls"]:
        try:
            print(f"fetching {url}", file=sys.stderr)
            with urlopen(url, timeout=60) as r:
                data = r.read()
            tmp = out + ".part"
            with open(tmp, "wb") as f:
                f.write(data)
            verify(tmp, name)
            os.replace(tmp, out)
            return out
        except Exception as e:  # try the next mirror
            last = e
            print(f"  mirror failed: {e}", file=sys.stderr)
    raise RuntimeError(f"{name}: all mirrors failed ({last})")


def install_from_dir(src_dir: str, dest: str, names: List[str],
                     golden: bool = False) -> int:
    """Verify + install local copies (offline path; also how the mounted
    reference models are promoted into a self-contained checkout)."""
    import shutil

    os.makedirs(dest, exist_ok=True)
    rc = 0
    for name in names:
        src = os.path.join(src_dir, name)
        if not os.path.exists(src):
            print(f"{name}: not in {src_dir}", file=sys.stderr)
            rc = 1
            continue
        verify(src, name)
        out = os.path.join(dest, name)
        if os.path.abspath(src) != os.path.abspath(out):
            shutil.copyfile(src, out)
        golden_gate(out, name, full=golden)
        print(f"installed {out} (sha256 ok)", file=sys.stderr)
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dest", default="models",
                    help="install directory (resolve_path finds ./models)")
    ap.add_argument("--only", action="append", default=None,
                    help="fetch just this file (repeatable)")
    ap.add_argument("--from-dir", default=None,
                    help="offline: verify+install from a local directory "
                         "instead of downloading")
    ap.add_argument("--golden", action="store_true",
                    help="also run the TFLite-CPU parity gate per model")
    ap.add_argument("--check", action="store_true",
                    help="verify the acquisition contract (URL syntax + "
                         "pinned sha/size table; HEAD-probe mirrors when "
                         "the network allows) without downloading")
    ap.add_argument("--no-probe", action="store_true",
                    help="with --check: skip network HEAD probes "
                         "(offline contract only)")
    args = ap.parse_args(argv)

    names = args.only or list(MODELS)
    unknown = [n for n in names if n not in MODELS]
    if unknown:
        print(f"unknown model(s): {unknown}; known: {list(MODELS)}",
              file=sys.stderr)
        return 2
    if args.check:
        return check(names, probe=not args.no_probe)
    if args.from_dir:
        return install_from_dir(args.from_dir, args.dest, names,
                                golden=args.golden)
    rc = 0
    for name in names:
        try:
            out = fetch_one(name, args.dest)
            golden_gate(out, name, full=args.golden)
            print(f"installed {out}", file=sys.stderr)
        except Exception as e:
            print(f"{name}: FAILED ({e})", file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
