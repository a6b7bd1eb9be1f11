"""Atomic JSON artifact writes for bench/soak/roofline records.

A killed process must never leave a truncated artifact where a valid
older one could have stood (VERDICT r4: `PARITY_ONCHIP.json` died
mid-`json.dump` and shipped as invalid JSON).  Dump to `<path>.tmp` in
the same directory, fsync, then `os.replace` — the destination is either
the complete new record or untouched.
"""

from __future__ import annotations

import json
import os


def atomic_json_dump(obj, path: str, indent: int = 1) -> None:
    tmp = str(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=indent)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
