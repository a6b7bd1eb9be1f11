"""Shared helpers for op lowerings."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_activation(x, activation: str):
    """TFLite fused activation functions."""
    if activation in (None, "NONE"):
        return x
    if activation == "RELU":
        return jax.nn.relu(x)
    if activation == "RELU6":
        return jnp.clip(x, 0.0, 6.0)
    if activation == "RELU_N1_TO_1":
        return jnp.clip(x, -1.0, 1.0)
    if activation == "TANH":
        return jnp.tanh(x)
    raise NotImplementedError(f"fused activation {activation!r}")


def tflite_same_padding(in_size: int, filter_size: int, stride: int, dilation: int = 1):
    """TFLite/XLA SAME padding (identical conventions): returns (lo, hi)."""
    eff = (filter_size - 1) * dilation + 1
    out = -(-in_size // stride)
    total = max((out - 1) * stride + eff - in_size, 0)
    lo = total // 2
    return lo, total - lo
