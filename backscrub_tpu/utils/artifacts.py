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


def _jsonable(o):
    # numpy scalars (np.bool_, np.float32, ...) leak into records easily and
    # json.dump raises TypeError mid-stream on them — the exact failure that
    # truncated PARITY_ONCHIP.json twice (r4, r5).  Coerce instead of dying.
    item = getattr(o, "item", None)
    if callable(item):
        return item()
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def atomic_json_dump(obj, path: str, indent: int = 1) -> None:
    tmp = str(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=indent, default=_jsonable)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
