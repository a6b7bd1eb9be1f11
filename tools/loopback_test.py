#!/usr/bin/env python3
"""Loopback sink self-test: write a moving test pattern to a sink.

Port of the reference's `#ifdef standalone` harness in
videoio/loopback.cc:103-144 (incrementing pattern at 10 fps), generalized
to any sink URI so it also works headless (file:/null:).

Usage: python tools/loopback_test.py [/dev/video1|file:out.yuv|null:] [WxH] [frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else "/dev/video1"
    geo = sys.argv[2] if len(sys.argv) > 2 else "640x480"
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    w, h = (int(v) for v in geo.split("x"))

    from backscrub_tpu.io.streams import open_sink
    sink = open_sink(uri, w, h)
    for i in range(frames):
        # moving diagonal ramp in the Y plane, neutral chroma (128)
        yy, xx = np.mgrid[0:h, 0:w]
        y = ((xx + yy + 4 * i) % 256).astype(np.uint8)
        yuyv = np.empty((h, 2 * w), np.uint8)
        yuyv[:, 0::2] = y
        yuyv[:, 1::2] = 128
        sink.write_yuyv(yuyv)
        time.sleep(0.1)  # 10 fps, like the reference harness
    sink.close()
    print(f"wrote {frames} pattern frames to {uri}", file=sys.stderr)


if __name__ == "__main__":
    main()
