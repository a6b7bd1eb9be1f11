"""Post-training quantization: per-channel int8 weights.

The reference ships f32 and f16 models only; SURVEY.md §7 lists int8 as a
perf avenue "where the IoU budget allows".  This module quantizes conv /
depthwise / dense kernels to symmetric per-output-channel int8 at build
time; the compiled program dequantizes on the fly (int8 load -> f32/bf16
multiply), shrinking weight HBM/VMEM traffic ~4x vs f32.  Activations stay
in the compute dtype — masks are threshold decisions, and the golden tests
hold the IoU budget.

Usage:
    model = load_model(path, quantize="int8")
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def quantize_per_channel(w: np.ndarray, channel_axis: int) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int8 quantization along ``channel_axis``.

    Returns (w_q int8, scales f32) with w ~= w_q * scales broadcast along
    the channel axis.
    """
    w = np.asarray(w, np.float32)
    red = tuple(a for a in range(w.ndim) if a != channel_axis)
    absmax = np.maximum(np.abs(w).max(axis=red, keepdims=True), 1e-12)
    scales = (absmax / 127.0).astype(np.float32)
    w_q = np.clip(np.round(w / scales), -127, 127).astype(np.int8)
    return w_q, scales


def dequantize(w_q, scales, dtype):
    return (w_q.astype(dtype) * scales.astype(dtype))


def boundary_keys(graph, n_edge: int = 2) -> set:
    """Param keys fed to the first/last ``n_edge`` nodes of the graph.

    Standard PTQ practice: the input-adjacent and logit-producing layers are
    the most quantization-sensitive; keeping them full precision recovers
    most of the fidelity for ~no size cost.
    """
    keys = set()
    aliases = getattr(graph, "aliases", None) or {}
    for node in list(graph.nodes)[:n_edge] + list(graph.nodes)[-n_edge:]:
        for i in node.inputs:
            keys.add(f"t{i}")
            # dequant-folded weights may be keyed by their source tensor
            if i in aliases:
                keys.add(f"t{aliases[i]}")
    return keys


def quantize_params(prepared: Dict[str, np.ndarray],
                    weight_meta: Dict[str, dict],
                    exclude: set = frozenset()) -> Tuple[Dict[str, np.ndarray],
                                                         Dict[str, np.ndarray]]:
    """Quantize all large floating kernels in a prepared-params dict.

    Kernels are stored HWIO / (K,O) after the build-time layout transforms
    (ops/conv.py), so the output channel is always the LAST axis.  Biases,
    small tensors, and keys in ``exclude`` stay in their original dtype.

    Returns (new_params, scales) where quantized entries are int8 and their
    scales live under the same key in ``scales``.
    """
    out: Dict[str, np.ndarray] = {}
    scales: Dict[str, np.ndarray] = {}
    for k, v in prepared.items():
        # ndim >= 3: conv/depthwise/transpose kernels. 2-D FC kernels (the
        # SE squeeze/excite blocks) are excluded — tiny, and measurably
        # quantization-sensitive for mask fidelity.  Kernels live under
        # variant-suffixed keys ('t289@hwio', 't245@dw', ...): compare the
        # base tensor key against the exclude set.
        if (k.split("@")[0] not in exclude
                and np.issubdtype(v.dtype, np.floating)
                and v.ndim >= 3 and v.size >= 512):
            w_q, s = quantize_per_channel(v, channel_axis=v.ndim - 1)
            out[k] = w_q
            scales[k] = s
        else:
            out[k] = v
    return out, scales
