"""Control-flow lowerings: WHILE, IF (+ the comparison/logical/select ops
feeding them).

TFLite expresses control flow as operators referencing other subgraphs by
index; under XLA these become ``lax.while_loop`` / ``lax.cond`` with the
subgraphs traced inline through :meth:`LoweringCtx.subgraph_fn` (weights in
subgraphs join the same params pytree under an ``s<k>t<i>`` key namespace).
Loop-carried shapes/dtypes must be invariant — true for converter output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .elementwise import _binary
from .registry import register

for name, fn in {
    "GREATER": jnp.greater, "GREATER_EQUAL": jnp.greater_equal,
    "LESS": jnp.less, "LESS_EQUAL": jnp.less_equal,
    "EQUAL": jnp.equal, "NOT_EQUAL": jnp.not_equal,
    "LOGICAL_AND": jnp.logical_and, "LOGICAL_OR": jnp.logical_or,
}.items():
    register(name)(lambda ctx, node, _f=fn: _binary(ctx, node, _f))


@register("LOGICAL_NOT")
def logical_not(ctx, node):
    ctx.set(node.outputs[0], jnp.logical_not(ctx.get(node.inputs[0])))


@register("SELECT", "SELECT_V2")
def select(ctx, node):
    cond = ctx.get(node.inputs[0])
    ctx.set(node.outputs[0], jnp.where(cond, ctx.get(node.inputs[1]),
                                       ctx.get(node.inputs[2])))


def _as_pred(x):
    """Scalarize a () or (1,)-shaped boolean tensor for lax control flow."""
    return jnp.reshape(x, ()).astype(bool)


@register("WHILE")
def while_op(ctx, node):
    o = node.options
    cond = ctx.subgraph_fn(o["cond_subgraph"])
    body = ctx.subgraph_fn(o["body_subgraph"])
    init = tuple(ctx.get(i) for i in node.inputs)

    def cond_fn(vals):
        out = cond(vals)
        return _as_pred(out[0])

    def body_fn(vals):
        out = body(vals)
        # enforce loop-invariant dtypes (the converter guarantees shapes)
        return tuple(v.astype(i.dtype) for v, i in zip(out, init))

    res = jax.lax.while_loop(cond_fn, body_fn, init)
    for out_idx, val in zip(node.outputs, res):
        ctx.set(out_idx, val)


@register("IF")
def if_op(ctx, node):
    o = node.options
    then_fn = ctx.subgraph_fn(o["then_subgraph"])
    else_fn = ctx.subgraph_fn(o["else_subgraph"])
    pred = _as_pred(ctx.get(node.inputs[0]))
    operands = tuple(ctx.get(i) for i in node.inputs[1:])
    res = jax.lax.cond(pred, then_fn, else_fn, operands)
    res = res if isinstance(res, tuple) else (res,)
    for out_idx, val in zip(node.outputs, res):
        ctx.set(out_idx, val)
