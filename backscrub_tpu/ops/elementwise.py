"""Elementwise lowerings: ADD, SUB, MUL, DIV, activations, DEQUANTIZE.

These all ride the VPU and are fused by XLA into neighbouring convolutions;
no hand-scheduling needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import apply_activation
from .registry import register


def _binary(ctx, node, fn):
    a = ctx.get(node.inputs[0])
    b = ctx.get(node.inputs[1])
    y = apply_activation(fn(a, b), node.options.get("activation"))
    ctx.set(node.outputs[0], y)


@register("ADD")
def add(ctx, node):
    _binary(ctx, node, jnp.add)


@register("SUB")
def sub(ctx, node):
    _binary(ctx, node, jnp.subtract)


@register("MUL")
def mul(ctx, node):
    _binary(ctx, node, jnp.multiply)


@register("DIV")
def div(ctx, node):
    _binary(ctx, node, jnp.divide)


@register("MINIMUM")
def minimum(ctx, node):
    _binary(ctx, node, jnp.minimum)


@register("MAXIMUM")
def maximum(ctx, node):
    _binary(ctx, node, jnp.maximum)


def _unary(ctx, node, fn):
    ctx.set(node.outputs[0], fn(ctx.get(node.inputs[0])))


@register("RELU")
def relu(ctx, node):
    _unary(ctx, node, jax.nn.relu)


@register("RELU6")
def relu6(ctx, node):
    _unary(ctx, node, lambda x: jnp.clip(x, 0.0, 6.0))


@register("RELU_N1_TO_1")
def relu_n1_to_1(ctx, node):
    _unary(ctx, node, lambda x: jnp.clip(x, -1.0, 1.0))


@register("LOGISTIC")
def logistic(ctx, node):
    _unary(ctx, node, jax.nn.sigmoid)


@register("TANH")
def tanh(ctx, node):
    _unary(ctx, node, jnp.tanh)


@register("HARD_SWISH")
def hard_swish(ctx, node):
    # TFLite reference: x * relu6(x + 3) / 6
    _unary(ctx, node, lambda x: x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0))


@register("LEAKY_RELU")
def leaky_relu(ctx, node):
    alpha = node.options.get("alpha", 0.01)
    _unary(ctx, node, lambda x: jnp.where(x >= 0, x, alpha * x))


@register("PRELU")
def prelu(ctx, node):
    x = ctx.get(node.inputs[0])
    alpha = ctx.get(node.inputs[1])
    ctx.set(node.outputs[0], jnp.where(x >= 0, x, alpha * x))


@register("DEQUANTIZE")
def dequantize(ctx, node):
    """f16 -> f32 cast (the three f16 models store weights half precision,
    dequantized at load: SURVEY.md §2.2).  The executor routes constant
    inputs through the params pytree, so this is an exact cast either way."""
    x = ctx.get(node.inputs[0])
    ctx.set(node.outputs[0], x.astype(ctx.compute_dtype))
