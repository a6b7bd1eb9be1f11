#!/usr/bin/env python3
"""Convert a TF SavedModel / Keras model to .tflite for this framework.

The reference ships per-model conversion scripts (models/body-pix/
get-model.sh + myconverter.py: TFJS -> SavedModel -> TFLite with pinned
signatures).  This generalizes: any segmentation network with an NHWC
float input converts through tf.lite.TFLiteConverter and loads directly
into the TPU executor.

Usage:
  python tools/convert_model.py saved_model_dir out.tflite
  python tools/convert_model.py model.keras out.tflite --f16

After conversion, register a decode rule by filename (models/specs.py keys
on substrings: 'selfie', 'segm_', 'deeplab', 'body-pix') or name the file
accordingly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert(src: str, out: str, f16: bool = False) -> bytes:
    import tensorflow as tf
    if os.path.isdir(src):
        conv = tf.lite.TFLiteConverter.from_saved_model(src)
    else:
        model = tf.keras.models.load_model(src)
        conv = tf.lite.TFLiteConverter.from_keras_model(model)
    if f16:
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        conv.target_spec.supported_types = [tf.float16]
    blob = conv.convert()
    with open(out, "wb") as f:
        f.write(blob)
    return blob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--f16", action="store_true",
                    help="store weights half precision (like the Meet/MLKit models)")
    ap.add_argument("--check", action="store_true",
                    help="load the result with the TPU executor and report")
    args = ap.parse_args()

    convert(args.src, args.out, f16=args.f16)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")
    if args.check:
        from backscrub_tpu.graph.executor import load_model
        m = load_model(args.out)
        print(f"loads OK: input {m.input_shape} -> output {m.output_shape}")
        print(m.graph.summary())


if __name__ == "__main__":
    main()
