#!/usr/bin/env python3
"""Fetch Google BodyPix TFJS weights and convert them to ``.tflite``.

Replaces the reference's two-step tooling — ``models/body-pix/get-model.sh:25-41``
(wget model.json + every weightsManifest shard) and ``myconverter.py:18-39``
(tfjs_graph_converter -> SavedModel -> TFLiteConverter with input ``sub_2``
pinned to 1x257x257x3 and output ``float_segments``) — with one script and
no ``tfjs_graph_converter`` dependency: a TFJS graph-model ``model.json`` IS
a GraphDef serialized as JSON plus a weights manifest, so we parse it
directly, rebuild the network as a ``tf.function``, and emit the flatbuffer
through TF's own TFLite converter.  The result loads in this framework
(filename keys the 'bodypix' spec) and in stock TFLite.

Usage:
    python tools/get_bodypix.py [--model bodypix/mobilenet/float/050/model-stride8]
                                [--dest DIR] [--out bodypix.tflite] [--size 257]

Offline (no network): point --tfjs-dir at a directory already holding
model.json + shard files.  The conversion path is unit-tested from a
locally built TFJS-style graph in tests/test_bodypix_convert.py.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np

BASE_URL = "https://storage.googleapis.com/tfjs-models/savedmodel"
DEFAULT_MODEL = "bodypix/mobilenet/float/050/model-stride8"

_DTYPES = {"float32": np.float32, "int32": np.int32, "uint8": np.uint8}


def fetch(model_name: str, dest_dir: str) -> str:
    """Download ``model.json`` + all weight shards (get-model.sh:25-41).

    Returns the directory holding them.  Raises URLError offline.
    """
    from urllib.request import urlopen

    os.makedirs(dest_dir, exist_ok=True)
    url = f"{BASE_URL}/{model_name}.json"
    print(f"fetching {url}", file=sys.stderr)
    with urlopen(url) as r:
        model_json = r.read()
    with open(os.path.join(dest_dir, "model.json"), "wb") as f:
        f.write(model_json)
    manifest = json.loads(model_json)["weightsManifest"]
    base = f"{BASE_URL}/{model_name.rsplit('/', 1)[0]}"
    for group in manifest:
        for path in group["paths"]:
            print(f"fetching {base}/{path}", file=sys.stderr)
            with urlopen(f"{base}/{path}") as r:
                data = r.read()
            with open(os.path.join(dest_dir, path), "wb") as f:
                f.write(data)
    return dest_dir


def load_weights(tfjs_dir: str, manifest: List[dict]) -> Dict[str, np.ndarray]:
    """Decode the weightsManifest: named tensors packed back-to-back across
    the listed shard files."""
    out: Dict[str, np.ndarray] = {}
    for group in manifest:
        blob = b"".join(
            open(os.path.join(tfjs_dir, p), "rb").read()
            for p in group["paths"])
        off = 0
        for spec in group["weights"]:
            dt = _DTYPES[spec.get("dtype", "float32")]
            shape = [int(s) for s in spec.get("shape", [])]
            n = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(blob, dt, count=n, offset=off).reshape(shape)
            out[spec["name"]] = arr
            off += n * dt().nbytes
    return out


def _attr_ints(node: dict, key: str, default=None) -> Optional[List[int]]:
    a = node.get("attr", {}).get(key)
    if a is None:
        return default
    return [int(x) for x in a["list"]["i"]]


def _attr_str(node: dict, key: str, default: str = "") -> str:
    a = node.get("attr", {}).get(key)
    if a is None:
        return default
    return base64.b64decode(a["s"]).decode()


def build_concrete_function(nodes: List[dict], weights: Dict[str, np.ndarray],
                            input_name: str = "sub_2",
                            output_name: str = "float_segments",
                            size: int = 257):
    """Rebuild the TFJS graph as a tf.function grafted at ``input_name``.

    ``sub_2`` is the output of BodyPix's input-normalization subtraction —
    grafting there makes the converted model take the already-normalized
    1xHxWx3 float input, exactly like the reference converter
    (myconverter.py:18-26 input_nodes=['sub_2']).
    """
    import tensorflow as tf

    node_by_name = {n["name"]: n for n in nodes}

    def make(x):
        env = {input_name: x}

        def get(ref: str):
            name = ref.split(":")[0]
            if name in env:
                return env[name]
            val = compute(node_by_name[name])
            env[name] = val
            return val

        def compute(node):
            op = node["op"]
            if op == "Const":
                return tf.constant(weights[node["name"]])
            ins = [get(i) for i in node.get("input", [])
                   if not i.startswith("^")]
            if op == "Conv2D":
                return tf.nn.conv2d(
                    ins[0], ins[1],
                    strides=_attr_ints(node, "strides", [1, 1, 1, 1]),
                    padding=_attr_str(node, "padding", "SAME"),
                    dilations=_attr_ints(node, "dilations", [1, 1, 1, 1]))
            if op == "DepthwiseConv2dNative":
                return tf.nn.depthwise_conv2d(
                    ins[0], ins[1],
                    strides=_attr_ints(node, "strides", [1, 1, 1, 1]),
                    padding=_attr_str(node, "padding", "SAME"),
                    dilations=_attr_ints(node, "dilations", [1, 1, 1, 1])[1:3])
            if op == "BiasAdd":
                return tf.nn.bias_add(ins[0], ins[1])
            if op in ("Add", "AddV2"):
                return ins[0] + ins[1]
            if op == "Relu6":
                return tf.nn.relu6(ins[0])
            if op == "Relu":
                return tf.nn.relu(ins[0])
            if op == "Sigmoid":
                return tf.sigmoid(ins[0])
            if op == "Identity":
                return ins[0]
            if op == "Pad":
                return tf.pad(ins[0], ins[1])
            raise NotImplementedError(
                f"TFJS op {op!r} (node {node['name']!r}) not supported; "
                f"extend build_concrete_function")

        return get(output_name)

    fn = tf.function(make)
    return fn.get_concrete_function(
        tf.TensorSpec([1, size, size, 3], tf.float32))


def convert(tfjs_dir: str, out_path: str, input_name: str = "sub_2",
            output_name: str = "float_segments", size: int = 257) -> bytes:
    """model.json + shards -> .tflite flatbuffer (written to out_path)."""
    import tensorflow as tf

    with open(os.path.join(tfjs_dir, "model.json")) as f:
        mj = json.load(f)
    nodes = mj["modelTopology"]["node"]
    weights = load_weights(tfjs_dir, mj["weightsManifest"])
    cf = build_concrete_function(nodes, weights, input_name, output_name, size)
    converter = tf.lite.TFLiteConverter.from_concrete_functions([cf])
    blob = converter.convert()
    with open(out_path, "wb") as f:
        f.write(blob)
    return blob


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default=DEFAULT_MODEL,
                    help="TFJS model path under tfjs-models/savedmodel")
    ap.add_argument("--dest", default="bodypix_tfjs",
                    help="download directory")
    ap.add_argument("--tfjs-dir", default=None,
                    help="skip download; use an existing model.json dir")
    ap.add_argument("--out", default="body-pix.tflite")
    ap.add_argument("--size", type=int, default=257,
                    help="input H=W to pin (myconverter.py:34 uses 257)")
    ap.add_argument("--input", default="sub_2")
    ap.add_argument("--output", default="float_segments")
    args = ap.parse_args(argv)

    tfjs_dir = args.tfjs_dir
    if tfjs_dir is None:
        try:
            tfjs_dir = fetch(args.model, args.dest)
        except Exception as e:
            print(f"download failed ({e}); if offline, pass --tfjs-dir "
                  f"pointing at an existing model.json directory",
                  file=sys.stderr)
            return 1
    blob = convert(tfjs_dir, args.out, args.input, args.output, args.size)
    print(f"wrote {args.out} ({len(blob)} bytes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
