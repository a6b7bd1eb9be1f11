"""Activation-range calibration.

Runs sample inputs through the graph EAGERLY (the executor's trace function
executes concrete arrays when not under jit) and records per-tensor
min/max/absmax ranges.  This is the groundwork for full static (w8a8)
quantization and doubles as a numerics-diagnostics tool: layers whose
dynamic range explodes are where bf16/int8 fidelity is lost.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from ..graph.executor import LoweringCtx, fold_constants
from ..ops.registry import get_lowering
from ..tflite.ir import GraphIR


@dataclasses.dataclass
class TensorRange:
    index: int
    name: str
    shape: tuple
    lo: float
    hi: float

    @property
    def absmax(self) -> float:
        return max(abs(self.lo), abs(self.hi))


class _RecordingCtx(LoweringCtx):
    """LoweringCtx that snapshots every activation it defines."""

    def __init__(self, *args, ranges: Dict[int, TensorRange], **kwargs):
        super().__init__(*args, **kwargs)
        self._ranges = ranges

    def set(self, idx, val):
        super().set(idx, val)
        try:
            arr = np.asarray(val)
        except Exception:
            return
        if not np.issubdtype(arr.dtype, np.floating):
            return
        lo, hi = float(arr.min()), float(arr.max())
        t = self.graph.tensor(idx)
        prev = self._ranges.get(idx)
        if prev is None:
            self._ranges[idx] = TensorRange(idx, t.name, tuple(arr.shape), lo, hi)
        else:
            prev.lo = min(prev.lo, lo)
            prev.hi = max(prev.hi, hi)


def calibrate(graph: GraphIR, params: Dict[str, jnp.ndarray],
              samples: List[np.ndarray],
              compute_dtype=jnp.float32) -> Dict[int, TensorRange]:
    """Record activation ranges over ``samples`` (each a model-input array).

    Returns {tensor_index: TensorRange} aggregated over all samples.
    """
    import jax
    graph = fold_constants(graph)
    ranges: Dict[int, TensorRange] = {}
    # Seed prepared-membership with the param keys: after build_model the IR
    # weight payloads may be freed, so get_const must route through params.
    seeded = {k: None for k in params}
    for x in samples:
        ctx = _RecordingCtx(graph, params, dict(seeded), compute_dtype,
                            jax.lax.Precision.HIGHEST, jnp.float32,
                            ranges=ranges)
        xs = x if isinstance(x, (tuple, list)) else (x,)
        for idx, xv in zip(graph.inputs, xs):
            xv = jnp.asarray(xv)
            if jnp.issubdtype(xv.dtype, jnp.floating):
                xv = xv.astype(compute_dtype)  # match _trace's dtype policy
            ctx.set(idx, xv)
        for node in graph.nodes:
            get_lowering(node.kind)(ctx, node)
    return ranges


def report(ranges: Dict[int, TensorRange], top: int = 10) -> str:
    """Human-readable summary: widest dynamic ranges first."""
    rs = sorted(ranges.values(), key=lambda r: -r.absmax)
    lines = [f"{len(rs)} activations calibrated; widest ranges:"]
    for r in rs[:top]:
        lines.append(f"  #{r.index:4d} {r.name[:48]:48s} "
                     f"[{r.lo:10.3f}, {r.hi:10.3f}]")
    return "\n".join(lines)
